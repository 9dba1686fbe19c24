"""Reproduce the reference's published Dictionary-Match row (README.md:38:
F1 71.98, P 93.93, R 58.35 on BC5CDR) with THIS engine's kernels.

Gold: the human-annotated Tie-or-Break files shipped with the reference
(`data/BC5CDR/truth_dev.ck`, `truth_test.ck`; 3-col ``token I/O type``).
Prediction: our trie + segmentDP over the gold files' own token streams
with the real dictionaries. Spans = maximal chunks starting at ``I``
tokens; an entity span is a chunk whose type != None; matching is exact
(boundaries + type), the reference's span-F1 definition
(`model_partial_ner/utils.py:119-180`).

Prints one JSON line per split plus the README deltas.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = Path("/root/reference")


def parse_gold_labels(path: Path):
    """-> list of (tokens, labels[(is_break_before, type)]) per sentence —
    the raw per-token view (for mixed gold+distant training records)."""
    sentences = []
    toks: list[str] = []
    labels: list[tuple[int, str]] = []
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        cols = line.split(" ")
        if len(cols) != 3:
            continue
        tok, io, ty = cols
        if tok == "<s>":
            toks, labels = [], []
            continue
        if tok == "<eof>":
            if toks:
                sentences.append((toks, labels))
            continue
        toks.append(tok)
        labels.append((1 if io == "I" else 0, ty))
    return sentences


def parse_gold(path: Path):
    """-> list of (tokens, gold_spans[(l, r, type)]) per sentence."""
    sentences = []
    toks: list[str] = []
    labels: list[tuple[int, str]] = []  # (is_break, type)
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        cols = line.split(" ")
        if len(cols) != 3:
            continue
        tok, io, ty = cols
        if tok == "<s>":
            toks, labels = [], []
            continue
        if tok == "<eof>":
            spans = []
            start = 0
            for i in range(len(toks) + 1):
                boundary = i == len(toks) or labels[i][0] == 1
                if boundary and i > start:
                    ty0 = labels[start][1]
                    if ty0 != "None":
                        spans.append((start, i, ty0))
                if boundary:
                    start = i
            sentences.append((toks, spans))
            continue
        toks.append(tok)
        labels.append((1 if io == "I" else 0, ty))
    return sentences


def main() -> None:
    from autoner_ray.stages.dict_match import DictMatcher
    from autoner_ray.state.trie import FILTERED_TYPE

    core = (REF / "data/BC5CDR/dict_core.txt").read_text().splitlines()
    full = (REF / "data/BC5CDR/dict_full.txt").read_text().splitlines()
    stop = (REF / "data/stopwords.txt").read_text().splitlines()
    matcher = DictMatcher(core, full, stop)

    published = {"test": (93.93, 58.35, 71.98)}
    for split in ("dev", "test"):
        sentences = parse_gold(REF / f"data/BC5CDR/truth_{split}.ck")
        n_gold = n_pred = n_hit = 0
        for toks, gold in sentences:
            pred = [
                (l, r, ty)
                for l, r, ty in matcher.segments(toks)
                if ty and ty != FILTERED_TYPE
            ]
            g, p = set(gold), set(pred)
            n_gold += len(g)
            n_pred += len(p)
            n_hit += len(g & p)
        prec = 100.0 * n_hit / max(n_pred, 1)
        rec = 100.0 * n_hit / max(n_gold, 1)
        f1 = 2 * prec * rec / max(prec + rec, 1e-9)
        out = {
            "split": split,
            "sentences": len(sentences),
            "gold_spans": n_gold,
            "pred_spans": n_pred,
            "precision": round(prec, 2),
            "recall": round(rec, 2),
            "f1": round(f1, 2),
        }
        if split in published:
            pp, pr, pf = published[split]
            out["published"] = {"precision": pp, "recall": pr, "f1": pf}
            out["delta_f1"] = round(f1 - pf, 2)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
