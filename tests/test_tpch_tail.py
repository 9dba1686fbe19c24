"""DuckDB twins for the last five TPC-H shapes (Q2, Q11, Q13, Q20,
Q21 — adapted to the hint schema, which has no partsupp /
l_commitdate; see each pipeline's docstring for the adaptation), plus
targeted edge pins: the Q21 only-offender semantics and the Q11
integer-exact HAVING threshold."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from autoner_ray.pipelines import relational

SF = "/root/testdata/sf0.001"

_TABLES = ["customer", "orders", "lineitem", "supplier", "nation",
           "region", "part"]


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _assert_matches(got: pd.DataFrame, exp: pd.DataFrame) -> None:
    cols = sorted(got.columns)
    assert sorted(exp.columns) == cols
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    assert g.shape == e.shape
    for c in cols:
        assert (g[c].astype(str) == e[c].astype(str)).all(), c


@pytest.mark.parametrize(
    "fn,sql",
    [
        (relational.q13_customer_distribution,
         relational.q13_oracle_sql()),
        (relational.q21_suppliers_waiting,
         relational.q21_oracle_sql()),
        (relational.q11_important_parts, relational.q11_oracle_sql()),
        (relational.q20_prominent_suppliers,
         relational.q20_oracle_sql()),
        (relational.q2_min_cost_supplier, relational.q2_oracle_sql()),
    ],
    ids=["q13", "q21", "q11", "q20", "q2"],
)
def test_tpch_tail_matches_duckdb(ray_session, fn, sql):
    _assert_matches(fn(SF), _oracle(sql))


def test_q21_only_offender_semantics(ray_session):
    """The numwait credit requires (a) ≥2 suppliers on the order and
    (b) EXACTLY one of them late — brute-forced in pandas."""
    line = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    sup = pd.read_parquet(f"{SF}/supplier.parquet")

    j = line.merge(
        orders[orders["o_orderstatus"] == "F"],
        left_on="l_orderkey", right_on="o_orderkey",
    )
    j["late"] = (
        j["l_shipdate"] > j["o_orderdate"] + pd.Timedelta(days=60)
    ).astype(int)
    pair = (
        j.groupby(["l_orderkey", "l_suppkey"], as_index=False)["late"]
        .max()
    )
    per = pair.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "size"), n_late=("late", "sum")
    )
    pair = pair.join(per, on="l_orderkey")
    win = pair[(pair["late"] == 1) & (pair["n_supp"] >= 2)
               & (pair["n_late"] == 1)]
    want = (
        win.groupby("l_suppkey").size().rename("numwait").reset_index()
        .merge(sup[["s_suppkey", "s_name"]],
               left_on="l_suppkey", right_on="s_suppkey")
        [["s_name", "numwait"]]
        .sort_values(["numwait", "s_name"], ascending=[False, True])
        .reset_index(drop=True)
    )
    got = relational.q21_suppliers_waiting(SF)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        want.astype({"numwait": "int64"}),
    )


def test_q21_tiers_agree(ray_session):
    """Broadcast tier and the large-large cogroup tier must produce
    identical rows (same inner-join + only-offender semantics)."""
    broad = relational.q21_suppliers_waiting(SF)
    coj = relational.q21_suppliers_waiting(SF, broadcast_max_rows=0)
    pd.testing.assert_frame_equal(broad, coj)


def test_q11_threshold_is_integer_exact(ray_session):
    """Every returned part must clear cents*denom > total and every
    withheld part must not (recomputed from the oracle's per-part
    cents)."""
    pv = _oracle("""
        SELECT l.l_partkey,
               SUM(CAST(floor(l_extendedprice*(1-l_discount)*100
                              + 0.5) AS BIGINT)) AS cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
        GROUP BY 1
    """)
    total = int(pv["cents"].sum())
    want = set(
        pv.loc[pv["cents"] * 1000 > total, "l_partkey"].astype(int)
    )
    got = set(
        relational.q11_important_parts(SF)["l_partkey"].astype(int)
    )
    assert got == want and len(want) > 0
