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


def aggregate_edges(pairs_ds, num_partitions: int | None = None,
                    coalesce: bool = True):
    """Final edge weights: ONE hash shuffle on ``subj`` (every row of an
    edge shares its subj, so co-location holds) + a vectorized pandas
    sum per partition. Replaces Ray's multi-key row aggregate, which
    costs ~3 ms/row in Python.

    ``coalesce`` (default True) inserts a streaming 64k-row pre-combine
    BEFORE the shuffle: the sort-shuffle's driver-side metadata scales
    with input blocks × partitions (~0.9 GB measured at 1.5k tiny
    partial blocks), and merging blocks is the only fix. Turn it OFF
    for pipelines whose upstream is much slower than the partial stream
    AND whose total partial rows never fill a batch (e.g. the hybrid
    tagger at small scale): a bundler waiting on a starved slow stream
    measurably drags the whole topology (4.3 s → 11 s at sf0.1)."""
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.joins import _stable_part_col

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def precombine(t: pa.Table) -> pa.Table:
        # streaming coalesce: many tiny per-task partial blocks merge
        # into ≤ edge-vocab rows per 64k-row batch BEFORE the shuffle.
        # The AllToAll's driver-side state scales with input blocks ×
        # partitions (~100k object metadata records at 1.5k blocks —
        # the measured 0.9 GB), so cutting blocks is the real fix.
        g = (
            t.select(["subj", "pred", "obj", "w"])
            .group_by(["subj", "pred", "obj"])
            .aggregate([("w", "sum")])
        )
        return g.rename_columns(["subj", "pred", "obj", "w"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", _stable_part_col(t, ("subj",), num_partitions)
        )

    def combine(df):
        g = df.groupby(["subj", "pred", "obj"], as_index=False,
                       sort=False)["w"].sum()
        return pd.DataFrame(
            {
                "subj": g["subj"], "pred": g["pred"], "obj": g["obj"],
                "weight": g["w"],
            }
        )

    ds = pairs_ds
    if coalesce:
        # num_cpus=0.5 BREAKS operator fusion with the upstream match
        # chain (Ray fuses map_batches ops only when remote args are
        # equal). Fused, the whole read->match->precombine chain bundles
        # to THIS stage's 64k-row batch_size, collapsing the expensive
        # match stage to corpus/65536 tasks (measured: 8 tasks for 1024
        # blocks at sf0.01x1024 — half the cluster idle at any width
        # beyond that). Unfused, match parallelizes per read block and
        # only the cheap arrow combine bundles 64k rows; the fractional
        # CPU also lets the coalescer interleave with the match wave.
        ds = ds.map_batches(
            precombine, batch_format="pyarrow", batch_size=65536,
            num_cpus=0.5,
        )
        return (
            ds.map_batches(
                add_part, batch_format="pyarrow", num_cpus=0.5
            )
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
        )
    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
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

    def precombine(t: pa.Table) -> pa.Table:
        g = t.group_by("entity").aggregate([("n", "sum")])
        return g.rename_columns(["entity", "n"])

    return (
        sentences_ds.map_batches(explode, batch_format="pyarrow")
        .map_batches(precombine, batch_format="pyarrow", batch_size=None)
        .groupby("entity")
        .aggregate(Sum("n", alias_name="sent_freq"))
    )


def aggregate_edges_with_evidence(pairs_ev_ds,
                                  num_partitions: int | None = None,
                                  coalesce: bool = True):
    """Edge weights + min evidence pointer ("url#sent_id") per edge —
    same single-shuffle partition combine (and ``coalesce`` contract)
    as :func:`aggregate_edges`."""
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.joins import _stable_part_col

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def precombine(t: pa.Table) -> pa.Table:
        g = (
            t.select(["subj", "pred", "obj", "w", "ev"])
            .group_by(["subj", "pred", "obj"])
            .aggregate([("w", "sum"), ("ev", "min")])
        )
        return g.rename_columns(["subj", "pred", "obj", "w", "ev"])

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part", _stable_part_col(t, ("subj",), num_partitions)
        )

    def combine(df):
        g = df.groupby(["subj", "pred", "obj"], as_index=False,
                       sort=False).agg(weight=("w", "sum"),
                                       evidence=("ev", "min"))
        return pd.DataFrame(
            {
                "subj": g["subj"], "pred": g["pred"], "obj": g["obj"],
                "weight": g["weight"], "evidence": g["evidence"],
            }
        )

    ds = pairs_ev_ds
    if coalesce:
        # num_cpus=0.5 breaks fusion with the upstream match chain —
        # see aggregate_edges above for the measured parallelism cap
        ds = ds.map_batches(
            precombine, batch_format="pyarrow", batch_size=65536,
            num_cpus=0.5,
        )
        return (
            ds.map_batches(
                add_part, batch_format="pyarrow", num_cpus=0.5
            )
            .groupby("part")
            .map_groups(combine, batch_format="pandas")
        )
    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )
