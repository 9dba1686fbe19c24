"""As-of and range-window joins over event streams (engine extensions —
operators Ray Data lacks; the brief's canonical "custom operator" case).

Shape: ONE hash shuffle on the ``by`` key (tagged union of both sides,
same machinery as :mod:`autoner_ray.stages.joins`), then a single
vectorized ``pandas.merge_asof(..., by=key)`` per partition — no global
sort, no per-key Python calls. Partitioning assumption: all rows of one
``by`` key land in one partition (hash partition guarantees it); skewed
keys should be rare for user-keyed event streams, salt upstream if not.

Determinism: the right side is deduplicated to one row per (by, on)
keeping the largest tiebreak id, so "most recent at or before" is a pure
function of the input multiset and the DuckDB ``ASOF JOIN`` oracle
cannot pick a different row among equal timestamps.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from autoner_ray.stages.joins import _stable_part_col

_SIDE = "__asof_side"
_PART = "__asof_part"


def asof_join(left, right, by: str, on: str, tiebreak: str,
              num_partitions: int | None = None):
    """Backward-inclusive as-of INNER join: each left row matches the
    right row with the greatest ``on`` value ≤ the left's ``on`` within
    the same ``by`` group (right deduped per (by, on) by max
    ``tiebreak``). Non-key column names must be disjoint; unmatched left
    rows are dropped (DuckDB ``ASOF JOIN`` semantics).
    """
    from autoner_ray.cluster import default_num_partitions

    P = num_partitions or default_num_partitions()
    lschema, rschema = left.schema(), right.schema()
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    lcols = [c for c in lschema.names if c not in (by, on)]
    rcols = [c for c in rschema.names if c not in (by, on)]
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"non-key columns collide: {overlap}"
    assert tiebreak in rcols, "tiebreak must be a right-side payload col"
    out_schema = pa.schema(
        [(by, ltypes[by]), (on, ltypes[on])]
        + [(c, ltypes[c]) for c in lcols]
        + [(f"r_{on}", rtypes[on])]
        + [(c, rtypes[c]) for c in rcols]
    )

    def tag(side, own_cols, own_types, other_cols, other_types):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {by: t[by], on: t[on]}
            for c in own_cols:
                cols[c] = t[c]
            for c in other_cols:
                cols[c] = pa.nulls(n, other_types[c])
            cols[_SIDE] = pa.array([side] * n, pa.int8())
            cols[_PART] = _stable_part_col(t, (by,), P)
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        tag(0, lcols, ltypes, rcols, rtypes), batch_format="pyarrow"
    ).union(
        right.map_batches(
            tag(1, rcols, rtypes, lcols, ltypes), batch_format="pyarrow"
        )
    )

    def join_partition(t: pa.Table) -> pa.Table:
        # empty partitions can arrive as zero-column blocks (Ray 2.49
        # map_groups RefBundle quirk) — declare the schema explicitly
        if t.num_columns == 0 or len(t) == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        l = df[df[_SIDE] == 0][[by, on] + lcols]
        r = df[df[_SIDE] == 1][[by, on] + rcols]
        if l.empty or r.empty:
            return out_schema.empty_table()
        m = asof_match_frame(l, r, by=by, on=on, tiebreak=tiebreak)
        return pa.Table.from_pandas(
            m[out_schema.names], preserve_index=False
        ).cast(out_schema)

    return tagged.groupby(_PART).map_groups(
        join_partition, batch_format="pyarrow"
    )


def events_asof(events_ds, left_type: str = "purchase",
                right_type: str = "click"):
    """Attribution as-of join: each ``left_type`` event matched to the
    most recent ``right_type`` event at-or-before it by the same user.
    Output: user_id, ts, event_id, click_id, click_ts, lag_s (whole
    seconds, int64).
    """
    import pyarrow.compute as pc

    def side(ev_type, id_name):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["event_type"], ev_type))
            return pa.table(
                {
                    "user_id": t["user_id"],
                    "ts": t["ts"],
                    id_name: t["event_id"],
                }
            )

        return fn

    left = events_ds.map_batches(
        side(left_type, "event_id"), batch_format="pyarrow"
    )
    right = events_ds.map_batches(
        side(right_type, "click_id"), batch_format="pyarrow"
    )
    joined = asof_join(left, right, by="user_id", on="ts",
                       tiebreak="click_id")

    def finish(t: pa.Table) -> pa.Table:
        lag_us = pc.cast(
            pc.subtract(
                pc.cast(t["ts"], pa.int64()),
                pc.cast(t["r_ts"], pa.int64()),
            ),
            pa.int64(),
        )
        lag_s = pc.divide(lag_us, pa.scalar(1_000_000, pa.int64()))
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "click_id": t["click_id"],
                "click_ts": t["r_ts"],
                "lag_s": lag_s,
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


def events_asof_oracle_sql(left_type: str = "purchase",
                           right_type: str = "click") -> str:
    # right deduped per (user, ts) by max event_id — same rule as the
    # engine, so equal-timestamp ties cannot diverge. lag in whole
    # seconds via integer epoch microseconds (exact on both sides).
    return f"""
        WITH l AS (
            SELECT user_id, ts, event_id FROM events
            WHERE event_type = '{left_type}'
        ),
        r AS (
            SELECT user_id, ts, MAX(event_id) AS click_id FROM events
            WHERE event_type = '{right_type}'
            GROUP BY user_id, ts
        )
        SELECT l.user_id, l.ts, l.event_id, r.click_id,
               r.ts AS click_ts,
               (epoch_us(l.ts) - epoch_us(r.ts)) // 1000000 AS lag_s
        FROM l ASOF JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """


def count_window_frame(df: pd.DataFrame, w: pd.Timedelta) -> pd.DataFrame:
    """Per-event count of same-user events in ``[ts - w, ts]`` for one
    partition's (event_id, user_id, ts) frame — the vectorized kernel
    under :func:`window_count`, exposed for property tests. Count =
    rank_at(ts) - rank_before(ts - w) via two merge_asof rank lookups;
    merge_asof keeps the LAST row among equal timestamps, i.e. the max
    cumcount, so equal-ts events count each other (BETWEEN semantics).
    """
    df = df.sort_values(["ts", "event_id"], kind="mergesort").reset_index(
        drop=True
    )
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["k"] = df.groupby("user_id", sort=False).cumcount()
    ranks = df[["user_id", "ts", "k"]]
    le = pd.merge_asof(
        df[["user_id", "ts"]], ranks, on="ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )["k"]
    lo = df[["user_id", "ts"]].copy()
    # whole-minute shift keeps microsecond resolution exact; astype pins
    # the dtype back to us (pandas Timedelta math promotes to ns)
    lo["ts"] = (lo["ts"] - w).astype("datetime64[us]")
    lt = pd.merge_asof(
        lo, ranks, left_on="ts", right_on="ts", by="user_id",
        direction="backward", allow_exact_matches=False,
    )["k"]
    out = df[["event_id", "user_id", "ts"]].copy()
    out["n_window"] = (le - lt.fillna(-1)).astype("int64")
    return out


def asof_match_frame(l: pd.DataFrame, r: pd.DataFrame, by: str, on: str,
                     tiebreak: str) -> pd.DataFrame:
    """Backward-inclusive as-of inner match for one partition's frames —
    the kernel under :func:`asof_join`, exposed for property tests.
    Right is deduped per (by, on) keeping max ``tiebreak``; unmatched
    left rows are dropped."""
    r = r.sort_values([on, tiebreak], kind="mergesort").drop_duplicates(
        [by, on], keep="last"
    )
    r = r.sort_values(on, kind="mergesort")
    r = r.copy()
    r[f"r_{on}"] = r[on]
    l = l.sort_values(on, kind="mergesort")
    m = pd.merge_asof(
        l, r, on=on, by=by, direction="backward",
        allow_exact_matches=True,
    )
    return m.dropna(subset=[f"r_{on}"])


def window_count(events_ds, minutes: int = 5,
                 num_partitions: int | None = None):
    """Per-event preceding-range count: how many events by the same user
    in ``[ts - minutes, ts]`` (inclusive both ends, self included) — the
    range-join burst-detection signal. One hash shuffle by user, then
    two vectorized ``merge_asof`` rank lookups per partition (count =
    rank_at(ts) - rank_before(ts - w)); no per-user Python.
    """
    from autoner_ray.cluster import default_num_partitions

    P = num_partitions or default_num_partitions()
    w = pd.Timedelta(minutes=minutes)

    def part(t: pa.Table) -> pa.Table:
        return t.append_column(
            _PART, _stable_part_col(t, ("user_id",), P)
        )

    _empty = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("n_window", pa.int64()),
        ]
    )

    def count_partition(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _empty.empty_table()
        df = t.select(["event_id", "user_id", "ts"]).to_pandas()
        if df.empty:
            return _empty.empty_table()
        out = count_window_frame(df, w)
        return pa.Table.from_pandas(out, preserve_index=False).cast(_empty)

    return (
        events_ds.map_batches(part, batch_format="pyarrow")
        .groupby(_PART)
        .map_groups(count_partition, batch_format="pyarrow")
    )


def window_count_oracle_sql(minutes: int = 5) -> str:
    return f"""
        SELECT a.event_id, a.user_id, a.ts,
               COUNT(*) AS n_window
        FROM events a JOIN events b
          ON a.user_id = b.user_id
         AND b.ts BETWEEN a.ts - INTERVAL {minutes} MINUTE AND a.ts
        GROUP BY a.event_id, a.user_id, a.ts
    """
