"""Triple extraction + edge aggregation (north-rule A7/J5 stages).

Rule (deterministic, sentence-scoped): for every unordered pair of distinct
canonical entities co-occurring in a sentence, emit
``(subj=min, pred="cooccurs_with", obj=max)``; the edge weight is the
number of sentences where the pair co-occurs.

Scale design (SURVEY.md §4):
- pair generation is a stateless ``map_batches`` over SENTENCE rows (a
  sentence is never split across batches, so no pair is lost);
- counts are PRE-AGGREGATED inside each batch (combiner) so the wide
  ``groupby([subj,pred,obj])`` shuffle moves one row per distinct edge per
  batch instead of one per occurrence — with Zipfian heads this is the
  difference between shipping O(corpus) and O(edge-vocab × blocks);
- hot-key salting is unnecessary after the combiner for count aggregation
  (associative merge), which is exactly why the combiner runs first.
"""

from __future__ import annotations

from collections import Counter
from itertools import combinations

import pyarrow as pa

PRED_COOCCUR = "cooccurs_with"


def pair_counts_batch(batch: pa.Table) -> pa.Table:
    """sentence rows (entities list) -> partial (subj, pred, obj, w) rows."""
    counter: Counter[tuple[str, str]] = Counter()
    for ents in batch["entities"].to_pylist():
        # entities are sorted distinct per sentence -> combinations are
        # already (min, max) ordered
        for a, b in combinations(ents, 2):
            counter[(a, b)] += 1
    subjs, objs, ws = [], [], []
    for (a, b), w in counter.items():
        subjs.append(a)
        objs.append(b)
        ws.append(w)
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array([PRED_COOCCUR] * len(ws), pa.string()),
            "obj": pa.array(objs, pa.string()),
            "w": pa.array(ws, pa.int64()),
        }
    )


def aggregate_edges(pairs_ds):
    """Final edge weights: small shuffle over pre-aggregated partials."""
    from ray.data.aggregate import Sum

    return pairs_ds.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("w", alias_name="weight")
    )


def entity_doc_freq(sentences_ds):
    """Canonical-entity document frequency (per-sentence distinct)."""
    from ray.data.aggregate import Sum

    def explode(batch: pa.Table) -> pa.Table:
        counter: Counter[str] = Counter()
        for ents in batch["entities"].to_pylist():
            counter.update(ents)
        return pa.table(
            {
                "entity": pa.array(list(counter.keys()), pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    return (
        sentences_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("n", alias_name="sent_freq"))
    )


def aggregate_edges_with_evidence(pairs_ev_ds):
    """Edge weights + min evidence pointer ("url#sent_id") per edge."""
    from ray.data.aggregate import Min, Sum

    return pairs_ev_ds.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("w", alias_name="weight"),
        Min("ev", alias_name="evidence"),
    )
