"""Distributed BPE-merge learning vs a single-process reference
implementation (same delimiter-replace merge semantics, same
tie-break), plus the replace-semantics equivalence pin the SQL twin
relies on."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _reference_bpe(texts: list[str], k: int):
    words = Counter(
        w for t in texts for w in t.split(" ") if w != ""
    )
    seg = {" ".join(w): c for w, c in words.items()}
    merges = []
    for rank in range(1, k + 1):
        pairs: Counter = Counter()
        for s, c in seg.items():
            sym = s.split(" ")
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (lft, rgt), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((rank, lft, rgt, cnt))
        pat, rep = f" {lft} {rgt} ", f" {lft}{rgt} "
        seg = {
            (" " + s + " ").replace(pat, rep).strip(): c
            for s, c in seg.items()
        }
    return merges


def test_learn_bpe_matches_reference(ray_session):
    import ray

    from autoner_ray.stages.bpe import learn_bpe_merges

    texts = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["text"]
    )["text"].tolist()
    want = _reference_bpe(texts, 6)

    got = learn_bpe_merges(
        ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["text"]
        ),
        num_merges=6,
    ).to_pandas()
    got_t = list(
        got[["rank", "left_sym", "right_sym", "pair_count"]]
        .itertuples(index=False, name=None)
    )
    assert got_t == want


def test_replace_merge_semantics_match_duckdb():
    """The merge kernel (left-to-right non-overlapping replace on the
    space-joined symbols) must behave identically in Python and DuckDB
    — including the same-symbol-run quirk the module doc declares."""
    import duckdb

    cases = [" a a a a a ", " a b a b ", " b a b a b ", " x a b y "]
    for s in cases:
        py = s.replace(" a a ", " aa ").replace(" a b ", " ab ")
        db = duckdb.sql(
            f"SELECT replace(replace('{s}', ' a a ', ' aa '),"
            f" ' a b ', ' ab ')"
        ).fetchone()[0]
        assert py == db, s


def test_pair_counts_batch_bruteforce():
    from autoner_ray.stages.bpe import _pair_counts_batch

    t = pa.table(
        {
            "s": pa.array(["h e l l o", "x", "l l", "h e"], pa.string()),
            "cnt": pa.array([3, 5, 2, 1], pa.int64()),
        }
    )
    got = _pair_counts_batch(t).to_pandas()
    got = {
        (r.lft, r.rgt): r.c for r in got.itertuples(index=False)
    }
    want = {
        ("h", "e"): 4, ("e", "l"): 3, ("l", "l"): 5, ("l", "o"): 3,
    }
    assert got == want


def test_bpe_compression_stats_bruteforce(ray_session):
    """Train-then-apply per-source totals vs a single-process
    recomputation using the reference learner."""
    import ray

    from autoner_ray.stages.bpe import bpe_compression_stats

    docs = pd.read_parquet(
        f"{SF}/documents.parquet", columns=["text", "source"]
    )
    merges = _reference_bpe(docs["text"].tolist(), 6)

    def n_tokens(word: str) -> int:
        s = " " + " ".join(word) + " "
        for _, lft, rgt, _ in merges:
            s = s.replace(f" {lft} {rgt} ", f" {lft}{rgt} ")
        return len(s.split()) if s.strip() else 0

    memo: dict[str, int] = {}
    rows: dict[str, list[int]] = {}
    for src, text in zip(docs["source"], docs["text"]):
        acc = rows.setdefault(src, [0, 0, 0])
        for w in text.split(" "):
            if not w:
                continue
            acc[0] += 1
            acc[1] += len(w)
            if w not in memo:
                memo[w] = n_tokens(w)
            acc[2] += memo[w]
    want = (
        pd.DataFrame(
            [(s, a, b, c) for s, (a, b, c) in rows.items()],
            columns=["source", "n_words", "n_char_syms",
                     "n_bpe_tokens"],
        )
        .sort_values("source").reset_index(drop=True)
    )

    got = (
        bpe_compression_stats(
            ray.data.read_parquet(
                f"{SF}/documents.parquet", columns=["text", "source"]
            )
        )
        .to_pandas().sort_values("source").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["source", "n_words", "n_char_syms", "n_bpe_tokens"]]
        .astype({"n_words": "int64", "n_char_syms": "int64",
                 "n_bpe_tokens": "int64"}),
        want,
    )
