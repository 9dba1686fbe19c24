"""Property tests: the vectorized as-of / window kernels equal an O(n²)
brute-force reference on random event sets (hypothesis-driven). These
exercise the REAL per-partition kernels (`count_window_frame`,
`asof_match_frame`) — hash partitioning only routes whole users, so a
single-frame run covers the distributed semantics."""

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from autoner_ray.stages.asof import asof_match_frame, count_window_frame

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=120),  # seconds offset
        st.sampled_from(["click", "purchase"]),
    ),
    min_size=1,
    max_size=40,
)


def _frame(rows):
    base = pd.Timestamp("2026-01-01")
    return pd.DataFrame(
        {
            "event_id": pd.array(
                range(1, len(rows) + 1), dtype="int64"
            ),
            "user_id": pd.array([r[0] for r in rows], dtype="int64"),
            "event_type": [r[2] for r in rows],
            "ts": pd.Series(
                [base + pd.Timedelta(seconds=r[1]) for r in rows],
                dtype="datetime64[us]",
            ),
        }
    )


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_window_count_equals_bruteforce(rows):
    df = _frame(rows)
    w = pd.Timedelta(minutes=1)
    got = count_window_frame(
        df[["event_id", "user_id", "ts"]].copy(), w
    )
    brute = set()
    for _, a in df.iterrows():
        n = int(
            (
                (df["user_id"] == a["user_id"])
                & (df["ts"] >= a["ts"] - w)
                & (df["ts"] <= a["ts"])
            ).sum()
        )
        brute.add((int(a["event_id"]), n))
    assert {
        (int(r["event_id"]), int(r["n_window"]))
        for _, r in got.iterrows()
    } == brute


@settings(max_examples=60, deadline=None)
@given(events_strategy)
def test_asof_match_equals_bruteforce(rows):
    """Rule: each purchase matches the click with max ts <= its ts;
    among equal ts, the max event_id. Unmatched purchases drop."""
    df = _frame(rows)
    l = df[df.event_type == "purchase"][["user_id", "ts", "event_id"]]
    r = (
        df[df.event_type == "click"][["user_id", "ts", "event_id"]]
        .rename(columns={"event_id": "click_id"})
    )
    want = {}
    for _, a in l.iterrows():
        cand = df[
            (df["event_type"] == "click")
            & (df["user_id"] == a["user_id"])
            & (df["ts"] <= a["ts"])
        ]
        if len(cand):
            best = cand.sort_values(["ts", "event_id"]).iloc[-1]
            want[int(a["event_id"])] = int(best["event_id"])
    if l.empty or r.empty:
        return
    m = asof_match_frame(
        l.copy(), r.copy(), by="user_id", on="ts", tiebreak="click_id"
    )
    got = {
        int(a): int(b) for a, b in zip(m["event_id"], m["click_id"])
    }
    assert got == want
