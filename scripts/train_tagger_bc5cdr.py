"""Train the numpy Tie-or-Break tagger on REAL BC5CDR distant supervision
and evaluate against the human gold (`truth_dev.ck` / `truth_test.ck`).

Supervision comes from the dictionary matcher (never the gold), exactly
like the reference's pipeline (`autoner_train.sh` step 3 feeds step 5);
gold is only ever an eval set — UNLESS ``--mixed`` is given, which adds
gold DEV sentences as fully-supervised records (the reference's
DS_GOLD_MIXED path, `model_partial_ner/dataset.py:298-404` /
`preprocess_partial_ner/encode_mixed_dataset.py`). The last 2000 dev
sentences are then EXCLUDED from training and used only for epoch
selection, so selection never scores training sentences; the reported
number is TEST either way.

Architectures:
- ``--arch lstm`` (default): the reference default — stacked bi-LSTM
  (`--rnn_unit lstm --layer_num 2`), highway + label-dim projection
  heads (`ner.py:57-64`), dropout, Adam (`train_partial_ner.py:50`).
- ``--arch gru``: the round-1 single-layer bi-GRU + SGD/momentum.

Usage: python scripts/train_tagger_bc5cdr.py [--epochs 8 --mixed]
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
    ap.add_argument("--arch", choices=("gru", "lstm"), default="lstm")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=None,
                    help="default: 1e-3 (lstm/Adam), 0.05 (gru/SGD)")
    ap.add_argument("--budget", type=int, default=3000)
    ap.add_argument("--hidden", type=int, default=100)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--char-dim", type=int, default=30)
    ap.add_argument("--word-dim", type=int, default=50)
    ap.add_argument("--label-dim", type=int, default=50)
    ap.add_argument("--droprate", type=float, default=0.5)
    ap.add_argument("--word-drop", type=float, default=0.0,
                    help="word-level <unk> dropout prob per epoch "
                         "(offline stand-in for pretrained embeddings)")
    ap.add_argument("--mixed", action="store_true",
                    help="add gold DEV sentences (DS_GOLD_MIXED path)")
    ap.add_argument("--emb-subword", action="store_true",
                    help="fastText-style char-n-gram back-off for "
                         "rare-word PPMI-SVD vectors")
    ap.add_argument("--emb-subword-min-count", type=int, default=10)
    ap.add_argument("--emb-num-context", type=int, default=1024)
    ap.add_argument("--no-pretrained-emb", action="store_true",
                    help="skip PPMI-SVD corpus word vectors (the "
                         "reference's load_pretrained_word_embedding "
                         "step, trained locally — see state/word_vectors)")
    ap.add_argument("--sample-ratio", type=float, default=1.0,
                    help="Bernoulli keep-rate for DISTANT records in "
                         "--mixed (dataset.py:383)")
    ap.add_argument("--eval-limit", type=int, default=2000)
    ap.add_argument("--self-train-from", default=None,
                    help="prior artifact (.npz); its predictions pseudo-"
                         "label the FILTERED (unknown) regions of the "
                         "distant supervision before training")
    ap.add_argument("--pseudo-min-score", type=float,
                    default=float("-inf"),
                    help="typing-logit confidence floor for pseudo spans")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "autoner_ray", "artifacts", "tagger_bc5cdr.npz",
        ),
    )
    args = ap.parse_args()

    from bench_reference import sentences_from_lines
    from eval_bc5cdr_dictmatch import parse_gold, parse_gold_labels

    from autoner_ray.stages.dict_match import DictMatcher
    from autoner_ray.state.tagger import (
        Tagger,
        build_vocabs,
        encode_sentence,
        f1_from_counts,
        mixed_records,
        segments_from_gold_labels,
        segments_to_slots,
        span_f1_counts,
        spans_from_segments,
        token_budget_batches,
        word_dropout_records,
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

    if args.self_train_from:
        from autoner_ray.state.tagger import (
            Tagger as _BaseTagger,
            carve_pseudo_segments,
        )

        base = _BaseTagger.from_bytes(
            open(args.self_train_from, "rb").read()
        )
        n_added = n_sents = 0
        for si in range(0, len(train_sents), 256):
            batch = train_sents[si : si + 256]
            for j, pred in enumerate(base.predict_batch(batch)):
                merged, k = carve_pseudo_segments(
                    seg_col[si + j], pred, len(batch[j]),
                    min_score=args.pseudo_min_score,
                )
                seg_col[si + j] = merged
                n_added += k
                n_sents += k > 0
        print(f"self-training: +{n_added} pseudo spans in {n_sents} "
              f"sentences from {args.self_train_from}")

    # --mixed trains on gold DEV *minus* the model-selection tail: the
    # last `sel_tail` dev sentences are excluded from training so epoch
    # selection never scores sentences the model was trained on (test is
    # untouched either way)
    sel_tail = 2000
    gold_label_sents = (
        parse_gold_labels(REF / "data/BC5CDR/truth_dev.ck")[:-sel_tail]
        if args.mixed
        else []
    )
    gold_seg_col = [
        segments_from_gold_labels(labels) for _, labels in gold_label_sents
    ]

    type_lists = [
        [ty for _, _, ty in segs if ty and ty != FILTERED_TYPE]
        for segs in seg_col + gold_seg_col
    ]
    vocab_sents = train_sents + [toks for toks, _ in gold_label_sents]
    c_map, w_map, tl_map = build_vocabs(vocab_sents, type_lists,
                                        char_min_count=5)
    print(f"chars={len(c_map)} words={len(w_map)} types={tl_map}")

    def to_record(toks, segs):
        ci, wi, slots = encode_sentence(toks, c_map, w_map)
        brk, known = segments_to_slots(len(toks), segs)
        return (ci, wi, slots, brk, known,
                spans_from_segments(segs, tl_map))

    distant = [
        to_record(toks, segs) for toks, segs in zip(train_sents, seg_col)
    ]
    gold_recs = [
        to_record(toks, segs)
        for (toks, _), segs in zip(gold_label_sents, gold_seg_col)
    ]
    recs = mixed_records(distant, gold_recs, args.sample_ratio) \
        if args.mixed else distant
    print(f"records: {len(recs)} (distant={len(distant)} "
          f"gold={len(gold_recs)})")

    gold = {
        split: parse_gold(REF / f"data/BC5CDR/truth_{split}.ck")
        for split in ("dev", "test")
    }
    # with --mixed, selection uses the dev TAIL, which is held out of
    # training above — selection and training sentences are disjoint
    sel_split, sel_slice = ("dev", slice(-sel_tail, None)) if args.mixed \
        else ("dev", slice(0, args.eval_limit))

    if args.arch == "lstm":
        tagger = Tagger(
            c_map, w_map, tl_map, arch="lstm",
            char_dim=args.char_dim, word_dim=args.word_dim,
            hidden=args.hidden, layers=args.layers,
            label_dim=args.label_dim,
        )
        lr = args.lr if args.lr is not None else 1e-3
        if not args.no_pretrained_emb:
            from autoner_ray.state.word_vectors import ppmi_svd_embeddings

            t0 = time.perf_counter()
            emb = ppmi_svd_embeddings(
                vocab_sents, w_map, dim=args.word_dim,
                num_context=args.emb_num_context,
                subword=args.emb_subword,
                subword_min_count=args.emb_subword_min_count,
            )
            tagger.load_word_embeddings(emb)
            print(f"pretrained PPMI-SVD word vectors "
                  f"({time.perf_counter() - t0:.0f}s)")
    else:
        tagger = Tagger(c_map, w_map, tl_map, hidden=args.hidden)
        lr = args.lr if args.lr is not None else 0.05

    def eval_sents(sents, model=None):
        model = model if model is not None else tagger
        ng = npd = nh = 0
        toks_all = [t for t, _ in sents]
        for i in range(0, len(toks_all), 256):
            preds = model.predict_batch(toks_all[i : i + 256])
            for (toks, gspans), pred in zip(sents[i : i + 256], preds):
                g, p, h = span_f1_counts(gspans, pred)
                ng += g; npd += p; nh += h
        return f1_from_counts(ng, npd, nh)

    rng = np.random.default_rng(7)
    state, best, best_blob = None, -1.0, None
    epoch_blobs: list[tuple[float, bytes]] = []
    plateau = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        order = rng.permutation(len(recs))
        tot, nb = 0.0, 0
        for batch in token_budget_batches(
            [recs[i] for i in order], budget=args.budget
        ):
            if args.arch == "lstm":
                loss, state = tagger.train_batch_v2(
                    word_dropout_records(batch, args.word_drop, rng),
                    lr=lr, droprate=args.droprate,
                    adam_state=state, rng=rng,
                )
            else:
                loss, state = tagger.train_batch(batch, lr=lr,
                                                 velocity=state)
            tot += loss; nb += 1
        dev = eval_sents(gold[sel_split][sel_slice])
        print(f"epoch {epoch}: loss={tot / max(nb, 1):.4f} "
              f"sel({sel_split})={dev} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
        epoch_blobs.append((dev["f1"], tagger.to_bytes()))
        if dev["f1"] > best:
            best, best_blob = dev["f1"], tagger.to_bytes()
            plateau = 0
        else:
            plateau += 1
            if plateau >= 2:  # reference lr-decay-on-plateau idiom (T5)
                lr *= 0.5
                plateau = 0
                print(f"  lr -> {lr}", flush=True)

    # checkpoint averaging: mean of the top-3 epochs' float weights often
    # beats the single best epoch (averages out the SGD tail noise);
    # keep whichever wins on the SELECTION slice (test untouched)
    top = sorted(epoch_blobs, key=lambda t: -t[0])[:3]
    if len(top) >= 2:
        models = [Tagger.from_bytes(b) for _, b in top]
        avg = Tagger.from_bytes(top[0][1])
        for k, v in avg.params.items():
            if np.issubdtype(v.dtype, np.floating):
                avg.params[k] = np.mean(
                    [m.params[k] for m in models], axis=0
                )
        avg_sel = eval_sents(gold[sel_split][sel_slice], model=avg)
        print(f"avg(top3) sel={avg_sel} vs best-single sel f1={best}",
              flush=True)
        if avg_sel["f1"] > best:
            best, best_blob = avg_sel["f1"], avg.to_bytes()

    tagger = Tagger.from_bytes(best_blob)
    final = {split: eval_sents(gold[split]) for split in ("dev", "test")}
    print(json.dumps({"final": final, "arch": args.arch,
                      "mixed": args.mixed,
                      "published_autoner_f1": 0.848,
                      "dict_match_f1": 0.7198}))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(best_blob)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
