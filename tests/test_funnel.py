"""funnel_counts vs a per-user brute force on random event sets and on
the sf0.001 events fixture."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _brute(df: pd.DataFrame, steps=("view", "click", "purchase")):
    out = {}
    for k in range(len(steps)):
        out[k + 1] = 0
    for _, g in df.groupby("user_id"):
        t = None
        for k, s in enumerate(steps):
            e = g[g["event_type"] == s]
            if t is not None:
                e = e[e["ts"] > t]
            if e.empty:
                break
            t = e["ts"].min()
            out[k + 1] += 1
    return out


def _run(ray_session, df):
    import ray

    from autoner_ray.stages.windows import funnel_counts

    ds = ray.data.from_pandas(df)
    got = funnel_counts(ds).to_pandas()
    return dict(zip(got["depth"].astype(int), got["users"].astype(int)))


def test_funnel_random_matches_bruteforce(ray_session):
    rng = np.random.default_rng(7)
    for _ in range(3):
        n = 300
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 25, n),
                "ts": pd.to_datetime(
                    rng.integers(0, 10_000, n), unit="s"
                ).astype("datetime64[us]"),
                "event_type": rng.choice(
                    ["view", "click", "purchase", "error"], n
                ),
            }
        )
        assert _run(ray_session, df) == _brute(df)


def test_funnel_fixture_nontrivial(ray_session):
    import ray

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    from autoner_ray.stages.windows import funnel_counts

    got = funnel_counts(ds).to_pandas().sort_values("depth")
    users = got["users"].tolist()
    # monotone non-increasing depth counts, non-trivial at depth 3
    assert users[0] >= users[1] >= users[2]
    assert users[2] > 0


def test_retention_cohorts_matches_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.windows import retention_cohorts

    df = pd.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "ts"],
    )
    ud = df.assign(day=df["ts"].dt.normalize()).loc[
        :, ["user_id", "day"]
    ].drop_duplicates()
    first = ud.groupby("user_id")["day"].min().rename("cohort")
    m = ud.merge(first, left_on="user_id", right_index=True)
    m["off"] = (m["day"] - m["cohort"]).dt.days
    brute = (
        m.groupby([m["cohort"].dt.date, "off"]).size().to_dict()
    )
    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/events.parquet",
        columns=["user_id", "ts", "event_type"],
    )
    got_df = retention_cohorts(ds).to_pandas()
    got = {
        (c, int(o)): int(u)
        for c, o, u in zip(
            got_df["cohort_day"], got_df["day_offset"], got_df["users"]
        )
    }
    assert got == brute
    assert got


def test_pivot_totals_match_lang_counts(ray_session):
    import ray

    from autoner_ray.stages.analysis import source_lang_pivot

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["source", "lang"],
    )
    wide = source_lang_pivot(ds).to_pandas()
    df = pd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["source", "lang"],
    )
    assert wide["n_total"].sum() == len(df)
    assert (wide["n_other"] == 0).all()
    for lg in ("en", "de"):
        assert wide[f"n_{lg}"].sum() == (df["lang"] == lg).sum()
