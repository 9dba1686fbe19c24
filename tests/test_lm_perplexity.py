"""Bigram-LM perplexity operator vs a single-process brute-force twin
on the sf0.001 fixture (same tokenization, smoothing, micro-nat
quantization)."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _brute():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = [x or "" for x in t["text"].to_pylist()]
    vocab: set[str] = set()
    c2: Counter = Counter()
    for txt in texts:
        toks = txt.split(" ")
        vocab.update(toks)
        c2.update(zip(toks, toks[1:]))
    c1: Counter = Counter()
    for (w1, _), c in c2.items():
        c1[w1] += c
    v = len(vocab)
    out = {}
    for did, txt in zip(ids, texts):
        toks = txt.split(" ")
        if len(toks) < 2:
            continue
        nll = 0
        for pair in zip(toks, toks[1:]):
            nll += int(
                math.floor(
                    math.log((c1[pair[0]] + v) / (c2[pair] + 1.0)) * 1e6
                    + 0.5
                )
            )
        out[did] = (len(toks) - 1, nll)
    return out


def test_lm_perplexity_matches_bruteforce(ray_session):
    import ray

    from autoner_ray.cluster import tune_data_context
    from autoner_ray.stages.analysis import lm_perplexity

    tune_data_context()
    ds = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    )
    df = lm_perplexity(ds).to_pandas()
    got = {
        int(r.doc_id): (int(r.n_bigrams), int(r.nll_micro))
        for r in df.itertuples()
    }
    brute = _brute()
    assert got == brute
    # sanity: scores are positive and perplexity is finite
    assert all(nll > 0 for _, nll in got.values())
