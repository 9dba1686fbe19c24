"""Neural tagger stages: actor-pool inference + distributed span-F1 eval.

- :class:`TaggerScorer` (T3/T4): weights + vocab maps load ONCE per actor
  from a broadcast artifact blob (``ray.put`` handle); each ``__call__``
  re-buckets the batch by char-sequence length (token-budget batching,
  T6 — Ray batches are row-counted so the budget slicing happens inside
  the actor, SURVEY §7.3) and emits one row per decoded mention with its
  chunk-head score (S12 shape).
- :class:`TaggerEval` (A4/A5): holds BOTH the dictionary trie (gold
  distant labels) and the model; emits per-batch partial span counts and
  score min/max, merged with a tiny ``sum``/``min``/``max`` aggregate —
  the distributed form of `model_partial_ner/utils.py:119-180`.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from autoner_ray.state.tagger import (
    Tagger,
    f1_from_counts,
    span_f1_counts,
    token_budget_batches,
    encode_sentence,
)


def _maybe_get(obj):
    try:
        import ray

        if isinstance(obj, ray.ObjectRef):
            return ray.get(obj)
    except ImportError:
        pass
    return obj


def bucketed_predict(tagger, tokens_col, threshold: float = 0.0,
                     budget: int = 12000, with_chunk_stats: bool = False,
                     none_bias: float = 0.0):
    """Length-bucketed ``predict_batch`` over a whole Ray batch (T6):
    same-scale sentences share one padded forward, so a mixed-length web
    batch doesn't pad every row to the longest sentence (~2x measured
    at budget 12000 vs one unbucketed 512-row call). Returns the span
    lists in input order, plus batch-wide chunk-score min/max when
    ``with_chunk_stats``."""
    records = [
        (*encode_sentence(t, tagger.c_map, tagger.w_map), i)
        for i, t in enumerate(tokens_col)
    ]
    out: list[list] = [[] for _ in tokens_col]
    smin, smax = float("inf"), float("-inf")
    for bucket in token_budget_batches(records, budget):
        idxs = [rec[3] for rec in bucket]
        res = tagger.predict_batch(
            [tokens_col[i] for i in idxs], threshold,
            with_chunk_stats=with_chunk_stats, none_bias=none_bias,
        )
        if with_chunk_stats:
            preds, bmin, bmax = res
            smin = min(smin, bmin)
            smax = max(smax, bmax)
        else:
            preds = res
        for i, spans in zip(idxs, preds):
            out[i] = spans
    if with_chunk_stats:
        return out, smin, smax
    return out


class TaggerScorer:
    def __init__(self, model_blob, threshold: float = 0.0,
                 token_budget: int = 12000) -> None:
        self.tagger = Tagger.from_bytes(_maybe_get(model_blob))
        self.threshold = threshold
        self.token_budget = token_budget

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens_col = batch["tokens"].to_pylist()
        urls = batch["url"].to_pylist()
        dids = batch["doc_id"].to_pylist()
        sids = batch["sent_id"].to_pylist()
        preds_all = bucketed_predict(
            self.tagger, tokens_col, self.threshold, self.token_budget
        )
        cols = {k: [] for k in (
            "url", "doc_id", "sent_id", "l", "r", "surface", "types", "score"
        )}
        for i, spans in enumerate(preds_all):
            for l, r, ty, score in spans:
                cols["url"].append(urls[i])
                cols["doc_id"].append(dids[i])
                cols["sent_id"].append(sids[i])
                cols["l"].append(l)
                cols["r"].append(r)
                cols["surface"].append(" ".join(tokens_col[i][l:r]))
                cols["types"].append(ty)
                cols["score"].append(round(score, 6))
        return pa.table(
            {
                "url": pa.array(cols["url"], pa.string()),
                "doc_id": pa.array(cols["doc_id"], pa.int64()),
                "sent_id": pa.array(cols["sent_id"], pa.int32()),
                "l": pa.array(cols["l"], pa.int32()),
                "r": pa.array(cols["r"], pa.int32()),
                "surface": pa.array(cols["surface"], pa.string()),
                "types": pa.array(cols["types"], pa.string()),
                "score": pa.array(cols["score"], pa.float64()),
            }
        )


class TaggerEval:
    """Per-batch partial counts: gold = dictionary segments (distant
    labels from the trie), pred = model spans. One row per batch."""

    def __init__(self, model_blob, core_lines, full_lines=(),
                 stopword_lines=(), threshold: float = 0.0) -> None:
        from autoner_ray.stages.dict_match import DictMatcher

        self.tagger = Tagger.from_bytes(_maybe_get(model_blob))
        self.matcher = DictMatcher(core_lines, full_lines, stopword_lines)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from autoner_ray.state.trie import FILTERED_TYPE

        tokens_col = batch["tokens"].to_pylist()
        # A5 = min/max over the CHUNK-head score of every boundary slot —
        # what the reference inference driver tracks for threshold
        # selection (`test_partial_ner.py:80-89`), NOT the typing logits.
        # Empty batches emit +/-inf sentinels, which can never win the
        # downstream min/max merge (no 0.0 filler contaminating it).
        preds, smin, smax = bucketed_predict(
            self.tagger, tokens_col, self.threshold, with_chunk_stats=True
        )
        n_gold = n_pred = n_hit = 0
        for toks, pred in zip(tokens_col, preds):
            gold = [
                (l, r, ty)
                for l, r, ty in self.matcher.segments(toks)
                if ty and ty != FILTERED_TYPE
            ]
            g, p, h = span_f1_counts(gold, pred)
            n_gold += g
            n_pred += p
            n_hit += h
        return pa.table(
            {
                "n_gold": pa.array([n_gold], pa.int64()),
                "n_pred": pa.array([n_pred], pa.int64()),
                "n_hit": pa.array([n_hit], pa.int64()),
                "score_min": pa.array([smin], pa.float64()),
                "score_max": pa.array([smax], pa.float64()),
            }
        )


def neural_mentions(sentences_ds, model_blob, concurrency=None,
                    threshold: float = 0.0, batch_size: int = 128):
    """Sentence rows -> decoded mention rows. Task pool with a
    per-worker model cache (``cached_stage_fn``): the blob deserializes
    once per worker per session, not once per actor per run.

    batch_size bounds TASK size (Ray bundles blocks up to it), so it is
    the inference stage's parallelism dial: tasks ≈ rows/batch_size.
    Total inference CPU is flat from 512 down to 128 (length-bucketed
    GEMMs stay big enough), so 128 buys 4× the concurrency on small
    inputs at no CPU cost; at web scale the task count is large either
    way."""
    from autoner_ray.stages.dict_match import cached_stage_fn

    return sentences_ds.map_batches(
        cached_stage_fn(
            TaggerScorer, model_blob=model_blob, threshold=threshold
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def eval_span_f1(sentences_ds, model_blob, core_lines, full_lines=(),
                 stopword_lines=(), concurrency=None) -> pa.Table:
    """Distributed span-F1 (A4) + global score min/max (A5): partial
    counts per batch, one tiny final merge."""
    from autoner_ray.stages.dict_match import cached_stage_fn

    partials = sentences_ds.map_batches(
        cached_stage_fn(
            TaggerEval,
            model_blob=model_blob,
            core_lines=core_lines,
            full_lines=full_lines,
            stopword_lines=stopword_lines,
        ),
        batch_format="pyarrow",
        # parallelism dial — see neural_mentions docstring
        batch_size=128,
        concurrency=concurrency,
        num_cpus=1,
    )
    import pandas as pd

    df = partials.to_pandas()  # one row per batch — tiny
    n_gold = int(df["n_gold"].sum())
    n_pred = int(df["n_pred"].sum())
    n_hit = int(df["n_hit"].sum())
    stats = f1_from_counts(n_gold, n_pred, n_hit)
    return pa.table(
        {
            "n_gold": pa.array([n_gold], pa.int64()),
            "n_pred": pa.array([n_pred], pa.int64()),
            "n_hit": pa.array([n_hit], pa.int64()),
            "precision": pa.array([stats["precision"]], pa.float64()),
            "recall": pa.array([stats["recall"]], pa.float64()),
            "f1": pa.array([stats["f1"]], pa.float64()),
            # inf sentinels drop out of the merge; null only if EVERY
            # batch was slot-free
            "score_min": pa.array(
                [None if np.isinf(smin_all := float(df["score_min"].min()))
                 else smin_all],
                pa.float64(),
            ),
            "score_max": pa.array(
                [None if np.isinf(smax_all := float(df["score_max"].max()))
                 else smax_all],
                pa.float64(),
            ),
        }
    )


class HybridPairs:
    """Union mention source (SURVEY §7.2 step 6): one actor holds BOTH
    the dictionary trie and the neural tagger; per sentence the entity
    set is the union of dictionary mentions and decoded neural spans
    (canonicalized surfaces), and the batch leaves as pre-aggregated
    co-occurrence pair partials — same zero-shuffle shape as
    ``DictMatcher(output="pairs")``."""

    def __init__(self, model_blob, core_lines, full_lines=(),
                 stopword_lines=(), threshold: float = 0.0) -> None:
        from autoner_ray.stages.dict_match import DictMatcher

        self.matcher = DictMatcher(core_lines, full_lines, stopword_lines)
        self.tagger = Tagger.from_bytes(_maybe_get(model_blob))
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter
        from itertools import combinations

        from autoner_ray.functions.text import normalize_surface
        from autoner_ray.stages.triples import PRED_COOCCUR

        tokens_col = batch["tokens"].to_pylist()
        preds = bucketed_predict(self.tagger, tokens_col, self.threshold)
        counter: Counter[tuple[str, str]] = Counter()
        for toks, spans in zip(tokens_col, preds):
            ents = {m[4] for m in self.matcher.mentions_of(toks)}
            for l, r, ty, _score in spans:
                ents.add(normalize_surface(" ".join(toks[l:r])))
            for a, b in combinations(sorted(ents), 2):
                counter[(a, b)] += 1
        subjs = [a for a, _ in counter]
        objs = [b for _, b in counter]
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array([PRED_COOCCUR] * len(subjs), pa.string()),
                "obj": pa.array(objs, pa.string()),
                "w": pa.array(list(counter.values()), pa.int64()),
            }
        )


def hybrid_triples(sentences_ds, model_blob, core_lines, full_lines=(),
                   stopword_lines=(), concurrency=None):
    """Edge weights over the dict+neural union mention stream."""
    import ray

    from autoner_ray.stages.dict_match import cached_stage_fn
    from autoner_ray.stages.triples import aggregate_edges

    pairs = sentences_ds.map_batches(
        cached_stage_fn(
            HybridPairs,
            model_blob=model_blob,
            core_lines=core_lines,
            full_lines=full_lines,
            stopword_lines=stopword_lines,
        ),
        batch_format="pyarrow",
        # parallelism dial — see neural_mentions docstring
        batch_size=128,
        concurrency=concurrency,
        num_cpus=1,
    )
    # coalesce off: the inference stream is far slower than the bundler
    # and the edge vocab is tiny — see aggregate_edges docstring
    return aggregate_edges(pairs, coalesce=False)


def mentions_to_tsv(mention_rows, tl_map) -> str:
    """S12: decoded-mention TSV in the reference's exact shape
    (`test_partial_ner.py:99-109`): per span a tab-joined
    ``st  ed  surface  type_id  type`` line, a blank line after each
    sentence's block. ``mention_rows`` is an iterable of
    (sent_key, l, r, surface, type) sorted by sent_key."""
    out: list[str] = []
    _unset = object()
    prev_key = _unset
    for key, l, r, surface, ty in mention_rows:
        if prev_key is not _unset and key != prev_key:
            out.append("\n")
        prev_key = key
        type_id = tl_map.get(ty, 0)
        out.append("\t".join(str(v) for v in (l, r, surface, type_id, ty)))
        out.append("\n")
    if out:
        out.append("\n")
    return "".join(out)


def mention_contexts(sentences_ds, core_lines, full_lines=(),
                     stopword_lines=(), window: int = 3, concurrency=None):
    """Training-data export: one row per mention with ±``window`` token
    context strings — the classic distant-supervision NER example shape.
    Runs inside the DictMatcher-holding actor so the sentence is never
    re-shipped."""
    from autoner_ray.stages.dict_match import DictMatcher

    class Contexts(DictMatcher):
        def __init__(self, **kw) -> None:
            super().__init__(**kw)

        def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
            cols = {k: [] for k in (
                "url", "doc_id", "sent_id", "surface", "types",
                "left_ctx", "right_ctx",
            )}
            urls = batch["url"].to_pylist()
            dids = batch["doc_id"].to_pylist()
            sids = batch["sent_id"].to_pylist()
            for url, did, sid, toks in zip(
                urls, dids, sids, batch["tokens"].to_pylist()
            ):
                for l, r, surface, ty, _canon in self.mentions_of(toks):
                    cols["url"].append(url)
                    cols["doc_id"].append(did)
                    cols["sent_id"].append(sid)
                    cols["surface"].append(surface)
                    cols["types"].append(ty)
                    cols["left_ctx"].append(
                        " ".join(toks[max(0, l - window) : l])
                    )
                    cols["right_ctx"].append(" ".join(toks[r : r + window]))
            return pa.table(
                {
                    "url": pa.array(cols["url"], pa.string()),
                    "doc_id": pa.array(cols["doc_id"], pa.int64()),
                    "sent_id": pa.array(cols["sent_id"], pa.int32()),
                    "surface": pa.array(cols["surface"], pa.string()),
                    "types": pa.array(cols["types"], pa.string()),
                    "left_ctx": pa.array(cols["left_ctx"], pa.string()),
                    "right_ctx": pa.array(cols["right_ctx"], pa.string()),
                }
            )

    from autoner_ray.stages.dict_match import cached_stage_fn

    return sentences_ds.map_batches(
        cached_stage_fn(
            Contexts,
            # window is closure state inside the local class — key it
            _cache_key_extra=f"window={window}",
            core_lines=core_lines,
            full_lines=full_lines,
            stopword_lines=stopword_lines,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )


def export_training_set(sentences_ds, core_lines, full_lines=(),
                        stopword_lines=(), out_dir: str | None = None,
                        concurrency=2):
    """S10 as a distributed sink: sentence rows -> supervision records
    (boundary labels, known mask, span type strings) as Parquet-ready
    columns; ``write_parquet(out_dir)`` when a path is given."""
    from autoner_ray.stages.dict_match import DictMatcher
    from autoner_ray.state.tagger import segments_to_slots

    class Encoder(DictMatcher):
        def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
            brks, knowns, span_cols = [], [], []
            tokens_col = batch["tokens"].to_pylist()
            for toks in tokens_col:
                segs = self.segments(toks)
                brk, known = segments_to_slots(len(toks), segs)
                brks.append([int(x) for x in brk])
                knowns.append([bool(x) for x in known])
                span_cols.append(
                    [f"{l}:{r}:{ty}" for l, r, ty in segs if ty]
                )
            return pa.table(
                {
                    "url": batch["url"],
                    "doc_id": batch["doc_id"],
                    "sent_id": batch["sent_id"],
                    "tokens": batch["tokens"],
                    "break_labels": pa.array(
                        brks, pa.list_(pa.int8())
                    ),
                    "known_mask": pa.array(knowns, pa.list_(pa.bool_())),
                    "typed_spans": pa.array(
                        span_cols, pa.list_(pa.string())
                    ),
                }
            )

    from autoner_ray.stages.dict_match import cached_stage_fn

    ds = sentences_ds.map_batches(
        cached_stage_fn(
            Encoder,
            core_lines=core_lines,
            full_lines=full_lines,
            stopword_lines=stopword_lines,
        ),
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
        num_cpus=1,
    )
    if out_dir is not None:
        ds.write_parquet(out_dir)
    return ds
