"""Train the numpy Tie-or-Break tagger on engine-generated distant
supervision (T5, single-node — mirrors the reference's train step being a
one-process CLI over engine-produced files, `autoner_train.sh:56-62`).

Pipeline: sf0.001 pages -> extract -> tokenize (driver-side, small) ->
DictMatcher segments (distant labels) -> numpy bi-GRU training with
token-budget batches -> artifact ``autoner_ray/artifacts/tagger_demo.npz``
(weights + vocab maps, S11-style single checkpoint) + dev span-F1 print.

Usage: python scripts/train_tagger.py [--epochs 40] [--out PATH]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SF = "/root/testdata/sf0.001"


def load_sentences(sf_dir: str):
    """Tokenized sentences straight from the parquet (driver-side: the
    train corpus is deliberately small; the DISTRIBUTED tokenize path is
    the kg pipeline — this mirrors the reference's single-process encode
    step)."""
    import pyarrow.parquet as pq

    from autoner_ray.sources.pages import derive_pages_batch
    from autoner_ray.stages.extract import extract_text_batch
    from autoner_ray.stages.tokenize import tokenize_pages_batch

    docs = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    sents = tokenize_pages_batch(extract_text_batch(derive_pages_batch(docs)))
    return sents["tokens"].to_pylist(), sents["doc_id"].to_pylist()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--budget", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--sample-ratio", type=float, default=1.0,
                    help="keep each training sentence w.p. ratio "
                         "(T7/O3, dataset.py:281)")
    ap.add_argument("--sf-dir", default=SF)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "autoner_ray", "artifacts", "tagger_demo.npz",
        ),
    )
    args = ap.parse_args()

    from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS
    from autoner_ray.stages.dict_match import DictMatcher
    from autoner_ray.state.tagger import (
        Tagger,
        build_vocabs,
        encode_sentence,
        f1_from_counts,
        segments_to_slots,
        span_f1_counts,
        spans_from_segments,
        token_budget_batches,
    )
    from autoner_ray.state.trie import FILTERED_TYPE

    tokens_col, doc_ids = load_sentences(args.sf_dir)
    matcher = DictMatcher(CORE_DICT, FULL_DICT, STOPWORDS)
    segments_col = [matcher.segments(t) for t in tokens_col]
    type_lists = [
        [ty for _, _, ty in segs if ty and ty != FILTERED_TYPE]
        for segs in segments_col
    ]
    c_map, w_map, tl_map = build_vocabs(tokens_col, type_lists,
                                        char_min_count=5)
    print(f"sentences={len(tokens_col)} chars={len(c_map)} "
          f"words={len(w_map)} types={tl_map}")

    # dev split: every 5th doc (deterministic on doc_id)
    train_idx = [i for i, d in enumerate(doc_ids) if d % 5 != 0]
    dev_idx = [i for i, d in enumerate(doc_ids) if d % 5 == 0]

    def to_record(i):
        ci, wi, slots = encode_sentence(tokens_col[i], c_map, w_map)
        brk, known = segments_to_slots(len(tokens_col[i]), segments_col[i])
        spans = spans_from_segments(segments_col[i], tl_map)
        return (ci, wi, slots, brk, known, spans)

    if args.sample_ratio < 1.0:  # Bernoulli keep (T7, dataset.py:281)
        keep_rng = np.random.default_rng(11)
        train_idx = [
            i for i in train_idx if keep_rng.random() < args.sample_ratio
        ]
    train_recs = [to_record(i) for i in train_idx]
    tagger = Tagger(c_map, w_map, tl_map, hidden=args.hidden)

    def dev_f1():
        ng = npred = nh = 0
        sents = [tokens_col[i] for i in dev_idx]
        preds = tagger.predict_batch(sents)
        for i, pred in zip(dev_idx, preds):
            gold = [
                (l, r, ty)
                for l, r, ty in segments_col[i]
                if ty and ty != FILTERED_TYPE
            ]
            g, p, h = span_f1_counts(gold, pred)
            ng += g; npred += p; nh += h
        return f1_from_counts(ng, npred, nh)

    vel = None
    rng = np.random.default_rng(7)
    best, best_blob = -1.0, None
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        order = rng.permutation(len(train_recs))  # O2 epoch shuffle
        shuffled = [train_recs[i] for i in order]
        tot, nb = 0.0, 0
        for batch in token_budget_batches(shuffled, budget=args.budget):
            loss, vel = tagger.train_batch(batch, lr=args.lr, velocity=vel)
            tot += loss; nb += 1
        stats = dev_f1()
        print(f"epoch {epoch}: loss={tot / max(nb, 1):.4f} "
              f"dev={stats} ({time.perf_counter() - t0:.1f}s)")
        if stats["f1"] > best:  # best-checkpoint idiom (S11)
            best, best_blob = stats["f1"], tagger.to_bytes()

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(best_blob)
    print(f"saved best (dev F1 {best:.4f}) -> {args.out}")


if __name__ == "__main__":
    main()
