"""Train the numpy Tie-or-Break tagger on REAL BC5CDR distant supervision
and evaluate against the human gold (`truth_dev.ck` / `truth_test.ck`).

This is the engine's honest AutoNER-style run: supervision comes from
the dictionary matcher (never the gold), exactly like the reference's
pipeline (`autoner_train.sh` step 3 feeds step 5); gold is only ever an
eval set. The model is the numpy bi-GRU (`--rnn_unit gru` family) with
no pretrained embeddings, so the ceiling is below the paper's torch
LSTM + word vectors (84.80); the dictionary-match baseline this should
beat on recall is F1 71.98.

Usage: python scripts/train_tagger_bc5cdr.py [--epochs 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REF = Path("/root/reference")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--budget", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=48)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "autoner_ray", "artifacts", "tagger_bc5cdr.npz",
        ),
    )
    args = ap.parse_args()

    from bench_reference import sentences_from_lines
    from eval_bc5cdr_dictmatch import parse_gold

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

    core = (REF / "data/BC5CDR/dict_core.txt").read_text().splitlines()
    full = (REF / "data/BC5CDR/dict_full.txt").read_text().splitlines()
    stop = (REF / "data/stopwords.txt").read_text().splitlines()
    matcher = DictMatcher(core, full, stop)

    lines = (REF / "data/BC5CDR/raw_text.txt").read_text().splitlines()
    train_sents = [
        [t for t in s if t != "\n"] for s in sentences_from_lines(lines)
    ]
    print(f"train sentences (distant supervision): {len(train_sents)}")
    seg_col = [matcher.segments(t) for t in train_sents]
    type_lists = [
        [ty for _, _, ty in segs if ty and ty != FILTERED_TYPE]
        for segs in seg_col
    ]
    c_map, w_map, tl_map = build_vocabs(train_sents, type_lists,
                                        char_min_count=5)
    print(f"chars={len(c_map)} words={len(w_map)} types={tl_map}")

    recs = []
    for toks, segs in zip(train_sents, seg_col):
        ci, wi, slots = encode_sentence(toks, c_map, w_map)
        brk, known = segments_to_slots(len(toks), segs)
        recs.append((ci, wi, slots, brk, known,
                     spans_from_segments(segs, tl_map)))

    gold = {
        split: parse_gold(REF / f"data/BC5CDR/truth_{split}.ck")
        for split in ("dev", "test")
    }

    tagger = Tagger(c_map, w_map, tl_map, hidden=args.hidden)

    def eval_split(split, limit=None):
        sents = gold[split][:limit] if limit else gold[split]
        ng = npd = nh = 0
        toks_all = [t for t, _ in sents]
        for i in range(0, len(toks_all), 256):
            preds = tagger.predict_batch(toks_all[i : i + 256])
            for (toks, gspans), pred in zip(sents[i : i + 256], preds):
                g, p, h = span_f1_counts(gspans, pred)
                ng += g; npd += p; nh += h
        return f1_from_counts(ng, npd, nh)

    rng = np.random.default_rng(7)
    vel, best, best_blob = None, -1.0, None
    lr, plateau = args.lr, 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        order = rng.permutation(len(recs))
        tot, nb = 0.0, 0
        for batch in token_budget_batches(
            [recs[i] for i in order], budget=args.budget
        ):
            loss, vel = tagger.train_batch(batch, lr=lr, velocity=vel)
            tot += loss; nb += 1
        dev = eval_split("dev", limit=2000)
        print(f"epoch {epoch}: loss={tot / max(nb, 1):.4f} "
              f"dev(2k)={dev} ({time.perf_counter() - t0:.0f}s)", flush=True)
        if dev["f1"] > best:
            best, best_blob = dev["f1"], tagger.to_bytes()
            plateau = 0
        else:
            plateau += 1
            if plateau >= 2:  # reference lr-decay-on-plateau idiom (T5)
                lr *= 0.5
                plateau = 0
                print(f"  lr -> {lr}", flush=True)

    tagger = Tagger.from_bytes(best_blob)
    final = {split: eval_split(split) for split in ("dev", "test")}
    print(json.dumps({"final": final, "published_autoner_f1": 0.848,
                      "dict_match_f1": 0.7198}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(best_blob)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
