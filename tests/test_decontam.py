"""Decontamination operator: broadcast tier vs join tier vs a plain
python brute-force oracle on the sf0.001 fixture (benchmark side =
doc_id % 10 == 0, the same split the driver query uses)."""

from __future__ import annotations

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
N = 8


def _brute_hits():
    from autoner_ray.stages.decontam import _doc_grams

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    bench: set[str] = set()
    for did, txt in zip(ids, texts):
        if did % 10 == 0:
            bench.update(_doc_grams(txt, N))
    out = {}
    for did, txt in zip(ids, texts):
        if did % 10 == 0:
            continue
        h = sum(1 for g in set(_doc_grams(txt, N)) if g in bench)
        if h:
            out[did] = h
    return out


def _split(ray_session):
    import ray

    from autoner_ray.cluster import tune_data_context

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    corpus = ds.filter(lambda r: r["doc_id"] % 10 != 0)
    bench = ds.filter(lambda r: r["doc_id"] % 10 == 0)
    return corpus, bench


def _as_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["doc_id"].astype(int), df["n_hits"].astype(int)))


def test_broadcast_tier_matches_bruteforce(ray_session):
    from autoner_ray.stages.decontam import contamination_hits

    corpus, bench = _split(ray_session)
    got = _as_dict(contamination_hits(corpus, bench, n=N))
    assert got == _brute_hits()
    assert got, "fixture must produce non-trivial contamination"


def test_join_tier_matches_broadcast(ray_session):
    from autoner_ray.stages.decontam import contamination_hits

    corpus, bench = _split(ray_session)
    got = _as_dict(
        contamination_hits(corpus, bench, n=N, force_join=True)
    )
    assert got == _brute_hits()


def test_decontaminate_removes_hit_docs(ray_session):
    from autoner_ray.stages.decontam import decontaminate

    corpus, bench = _split(ray_session)
    kept = set(
        decontaminate(corpus, bench, n=N).to_pandas()["doc_id"].astype(int)
    )
    brute = _brute_hits()
    all_ids = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    corpus_ids = {d for d in all_ids if d % 10 != 0}
    assert kept == corpus_ids - set(brute)

def test_crossdoc_dup_windows_matches_bruteforce(ray_session):
    import ray

    from autoner_ray.stages.decontam import (
        _doc_grams,
        crossdoc_dup_windows,
    )

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    grams = {
        did: set(_doc_grams(txt, N))
        for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    from collections import Counter

    df_count = Counter(g for gs in grams.values() for g in gs)
    brute = {}
    for did, gs in grams.items():
        c = sum(1 for g in gs if df_count[g] >= 2)
        if c:
            brute[did] = c
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    df = crossdoc_dup_windows(ds, n=N).to_pandas()
    got = dict(zip(df["doc_id"].astype(int), df["dup_grams"].astype(int)))
    assert got == brute
    assert got, "fixture must contain cross-doc duplicated windows"


def test_bloom_tier_superset_and_exact_when_oversized(ray_session):
    """Bloom tier: never misses a contaminated doc; with an oversized
    filter it is EXACTLY the broadcast tier's answer on the fixture."""
    from autoner_ray.stages.decontam import bloom_contamination_flags

    corpus, bench = _split(ray_session)
    exact = _brute_hits()

    # oversized: 2^22 bits for a few thousand grams -> FP ~ 0
    got = _as_dict(
        bloom_contamination_flags(corpus, bench, n=N, m_bits=1 << 22)
    )
    assert got == exact

    # deliberately undersized: deterministic FPs allowed, no FNs, and
    # every true doc's hit count can only grow (FP grams add hits)
    tiny = _as_dict(
        bloom_contamination_flags(
            corpus, bench, n=N, m_bits=1 << 10, k_hashes=2
        )
    )
    for did, h in exact.items():
        assert did in tiny and tiny[did] >= h
