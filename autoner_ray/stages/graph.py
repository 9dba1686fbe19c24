"""Graph materialization: sorted adjacency-list Parquet shards.

north-rule final stage (SURVEY.md §7.1 "graph materialize"): edges
``(subj, pred, obj, weight)`` are hash-partitioned by ``subj`` into P
shards; within a shard, rows are sorted by ``(subj, pred, obj)`` and
written as one Parquet directory per shard so a failed run resumes by
skipping completed shards (see autoner_ray.state.manifest).

Partition id is a pure content hash (md5 of subj) — stable across runs,
processes and cluster layouts; never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc


def stable_part(key: str, num_parts: int) -> int:
    return int.from_bytes(
        hashlib.md5(key.encode()).digest()[:8], "big"
    ) % num_parts


def add_partition_batch(num_parts: int):
    def fn(batch: pa.Table) -> pa.Table:
        parts = pa.array(
            [stable_part(s, num_parts) for s in batch["subj"].to_pylist()],
            pa.int32(),
        )
        return batch.append_column("part", parts)

    return fn


def _sort_shard(df):
    return df.sort_values(["subj", "pred", "obj"], kind="mergesort")


def materialize_graph(edges_ds, out_dir: str, num_parts: int = 16):
    """edges -> sorted per-shard Parquet under ``out_dir/part=K/``."""
    ds = edges_ds.map_batches(
        add_partition_batch(num_parts), batch_format="pyarrow"
    )
    ds = ds.groupby("part").map_groups(_sort_shard, batch_format="pandas")
    ds.write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def adjacency_lists(edges_ds):
    """edges -> (src, edges: list<struct<pred,dst,weight>>) rows."""
    import pandas as pd

    def to_adj(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["pred", "obj"], kind="mergesort")
        src = df["subj"].iloc[0]
        edges = [
            {"pred": p, "dst": o, "weight": int(w)}
            for p, o, w in zip(df["pred"], df["obj"], df["weight"])
        ]
        return pd.DataFrame({"src": [src], "edges": [edges]})

    return edges_ds.groupby("subj").map_groups(to_adj, batch_format="pandas")


def pagerank(edges_ds, damping: float = 0.85, iters: int = 20):
    """PageRank over the entity co-occurrence graph (undirected edges
    expanded to both directions, weight-proportional transition).

    The entity vocabulary is DICTIONARY-BOUNDED (SURVEY §9: ~10^6 at web
    scale), so after the distributed edge aggregation the adjacency fits
    one node comfortably and the power iteration runs as a driver-side
    numpy loop over a CSR-ish matvec — the idiomatic split: corpus-sized
    work distributed, vocab-sized work local. (A trillion-edge graph over
    an UNBOUNDED vocab would instead iterate rank as a Dataset with a
    broadcast-join per step.)

    Returns a pa.Table (entity, rank float64 rounded 1e-9) sorted by
    (rank desc, entity).
    """
    import numpy as np

    df = edges_ds.to_pandas()
    ents = sorted(set(df["subj"]) | set(df["obj"]))
    idx = {e: i for i, e in enumerate(ents)}
    n = len(ents)
    if n == 0:
        return pa.table({"entity": pa.array([], pa.string()),
                         "rank": pa.array([], pa.float64())})
    src = np.fromiter(
        (idx[s] for s in df["subj"]), dtype=np.int64, count=len(df)
    )
    dst = np.fromiter(
        (idx[o] for o in df["obj"]), dtype=np.int64, count=len(df)
    )
    w = df["weight"].to_numpy(dtype=np.float64)
    # undirected: both directions
    rows = np.concatenate([src, dst])
    cols = np.concatenate([dst, src])
    ww = np.concatenate([w, w])
    out_w = np.zeros(n)
    np.add.at(out_w, rows, ww)
    ww_norm = ww / out_w[rows]
    rank = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, cols, rank[rows] * ww_norm)
        rank = (1 - damping) / n + damping * contrib
    order = sorted(range(n), key=lambda i: (-rank[i], ents[i]))
    return pa.table(
        {
            "entity": pa.array([ents[i] for i in order], pa.string()),
            "rank": pa.array(
                [round(float(rank[i]), 9) for i in order], pa.float64()
            ),
        }
    )


def connected_components(edges_ds):
    """Connected components of the entity graph.

    Same locality argument as :func:`pagerank`: the distributed edge
    aggregate bounds the data to the (dictionary-bounded) entity vocab,
    so the union-find runs driver-side on the aggregated edges. Returns
    (entity, component) where component = the lexicographically smallest
    member — a content-derived, execution-order-independent label.
    """
    df = edges_ds.to_pandas()
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for s, o in zip(df["subj"], df["obj"]):
        rs, ro = find(s), find(o)
        if rs != ro:
            parent[max(rs, ro)] = min(rs, ro)
    ents = sorted(parent)
    labels = [find(e) for e in ents]
    return pa.table(
        {
            "entity": pa.array(ents, pa.string()),
            "component": pa.array(labels, pa.string()),
        }
    )
