"""As-of join and preceding-range window count over event streams."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from autoner_ray.stages import asof


def _events_table():
    # user 1: clicks at t0, t10; purchases at t5, t10, t20
    #   -> purchase@5 matches click@0 (lag 5), purchase@10 matches
    #      click@10 (lag 0, inclusive), purchase@20 matches click@10
    # user 2: purchase with no prior click -> dropped (inner asof)
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        (1, 1, "click", 0),
        (2, 1, "purchase", 5),
        (3, 1, "click", 10),
        (4, 1, "purchase", 10),
        (5, 1, "purchase", 20),
        (6, 2, "purchase", 3),
        (7, 2, "click", 9),
    ]
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "ts": pa.array(
                [base + pd.Timedelta(seconds=r[3]) for r in rows],
                pa.timestamp("us"),
            ),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array([""] * len(rows), pa.string()),
        }
    )


def test_events_asof_hand_computed(ray_session):
    import ray.data as rd

    got = (
        asof.events_asof(rd.from_arrow(_events_table()))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["event_id"].tolist() == [2, 4, 5]
    assert got["click_id"].tolist() == [1, 3, 3]
    assert got["lag_s"].tolist() == [5, 0, 10]


def test_events_asof_matches_duckdb(ray_session):
    import ray.data as rd

    t = _events_table()
    got = (
        asof.events_asof(rd.from_arrow(t))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(asof.events_asof_oracle_sql())
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)[got.columns]
    )
    for c in ("ts", "click_ts"):
        want[c] = want[c].astype("datetime64[us]")
        got[c] = got[c].astype("datetime64[us]")
    want["lag_s"] = want["lag_s"].astype("int64")
    assert got.equals(want)


def test_window_count_hand_computed(ray_session):
    import ray.data as rd

    got = (
        asof.window_count(rd.from_arrow(_events_table()), minutes=5)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    # 5-min window >> all gaps here: count = all user events with
    # ts' <= ts, INCLUDING other events at the identical timestamp
    # (events 3 and 4 share ts, so each counts the other -> both 4),
    # exactly the BETWEEN ... AND a.ts semantics of the SQL oracle
    assert got["n_window"].tolist() == [1, 2, 4, 4, 5, 1, 2]


def test_window_count_matches_duckdb_small_window(ray_session):
    import ray.data as rd

    t = _events_table()
    got = (
        asof.window_count(rd.from_arrow(t), minutes=1)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("events", t)
    want = (
        con.execute(asof.window_count_oracle_sql(minutes=1))
        .df()
        .sort_values("event_id")
        .reset_index(drop=True)[got.columns]
    )
    want["ts"] = want["ts"].astype("datetime64[us]")
    got["ts"] = got["ts"].astype("datetime64[us]")
    want["n_window"] = want["n_window"].astype("int64")
    assert got.equals(want)


def test_asof_right_tie_dedupe(ray_session):
    """Two right rows at the same (user, ts): the max event_id wins on
    both the engine and the oracle (deterministic tie rule)."""
    import ray.data as rd

    base = pd.Timestamp("2026-01-01")
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(
                ["click", "click", "purchase"], pa.string()
            ),
            "ts": pa.array(
                [base, base, base + pd.Timedelta(seconds=1)],
                pa.timestamp("us"),
            ),
            "value": pa.array([0.0] * 3, pa.float64()),
            "props": pa.array([""] * 3, pa.string()),
        }
    )
    got = asof.events_asof(rd.from_arrow(t)).to_pandas()
    assert got["click_id"].tolist() == [2]
