"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk`: exact cosine top-k — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, ``ray.get`` in actor
  ``__init__``), then a driver-side merge of per-batch top-k partials.
  The scan streams; only k rows per batch reach the driver.
- :class:`IVFIndex` / :func:`ivf_topk`: the scale path — k-means coarse
  quantizer (trained on a sample), batches assign vectors to centroids,
  the query probes ``nprobe`` nearest lists. Same partial-top-k merge.

Float outputs are rounded to 6 dp so value-hash compares are stable.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    # float64 so cosine matches a double-precision oracle after 6-dp round
    ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
    mat = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, mat


def _cosine(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    qn = q / (np.linalg.norm(q) + 1e-30)
    norms = np.linalg.norm(mat, axis=1) + 1e-30
    return (mat @ qn) / norms


def brute_force_topk(emb_ds, query_vec, k: int = 10):
    """Exact cosine top-k; returns a pyarrow Table (vec_id, sim)."""
    q = np.asarray(query_vec, dtype=np.float64)

    def partial_topk(batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        sims = _cosine(mat, q)
        if len(ids) > k:
            idx = np.argpartition(-sims, k)[:k]
        else:
            idx = np.arange(len(ids))
        return pa.table(
            {
                "vec_id": pa.array(ids[idx], pa.int64()),
                "sim": pa.array(sims[idx].astype(np.float64), pa.float64()),
            }
        )

    partials = emb_ds.map_batches(partial_topk, batch_format="pyarrow")
    # merge: k rows per block reach the driver — tiny
    heap: list[tuple[float, int]] = []
    for b in partials.iter_batches(batch_size=4096, batch_format="pyarrow"):
        for vid, sim in zip(b["vec_id"].to_pylist(), b["sim"].to_pylist()):
            heapq.heappush(heap, (sim, -vid))
            if len(heap) > k:
                heapq.heappop(heap)
    top = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return pa.table(
        {
            "vec_id": pa.array([-v for _, v in top], pa.int64()),
            "sim": pa.array([round(s, 6) for s, _ in top], pa.float64()),
        }
    )


class IVFIndex:
    """Coarse k-means quantizer trained driver-side on a sample.

    At 100 TB the train sample stays bounded (``train_rows``); centroids are
    broadcast (``ray.put``) and batches only compute argmin over C
    centroids. Lists are the partition key for a pre-filtered scan.
    """

    def __init__(self, centroids: np.ndarray):
        self.centroids = centroids  # (C, D), L2-normalized

    @staticmethod
    def train(emb_ds, num_lists: int = 16, train_rows: int = 4096,
              iters: int = 10, seed: int = 13) -> "IVFIndex":
        sample = emb_ds.limit(train_rows).to_pandas()
        mat = np.array(sample["embedding"].to_list(), dtype=np.float32)
        mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-30)
        rng = np.random.default_rng(seed)
        c = mat[rng.choice(len(mat), size=min(num_lists, len(mat)),
                           replace=False)]
        for _ in range(iters):
            assign = np.argmax(mat @ c.T, axis=1)
            for j in range(len(c)):
                members = mat[assign == j]
                if len(members):
                    v = members.mean(axis=0)
                    c[j] = v / (np.linalg.norm(v) + 1e-30)
        return IVFIndex(c)

    def assign_batch(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        matn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-30)
        lists = np.argmax(matn @ self.centroids.T, axis=1)
        return batch.append_column(
            "ivf_list", pa.array(lists.astype(np.int32), pa.int32())
        )


def ivf_topk(emb_ds, query_vec, k: int = 10, num_lists: int = 16,
             nprobe: int = 4):
    """ANN top-k probing ``nprobe`` IVF lists; exact cosine within lists."""
    index = IVFIndex.train(emb_ds, num_lists=num_lists)
    q = np.asarray(query_vec, dtype=np.float32)
    qn = q / (np.linalg.norm(q) + 1e-30)
    probe = set(
        np.argsort(-(index.centroids @ qn))[:nprobe].astype(int).tolist()
    )

    assigned = emb_ds.map_batches(index.assign_batch, batch_format="pyarrow")
    filtered = assigned.map_batches(
        lambda t: t.filter(
            pa.compute.is_in(
                t["ivf_list"], value_set=pa.array(sorted(probe), pa.int32())
            )
        ),
        batch_format="pyarrow",
    )
    return brute_force_topk(filtered, query_vec, k)


class NearDupPairs:
    """Embedding-cosine near-duplicate pairs (broadcast right side).

    The full (id, vector) matrix is ``ray.put`` once and read in each
    actor's ``__init__``; every batch computes a block x all similarity
    slab and emits (a, b, sim) for a < b with sim >= threshold. Exact —
    the O(n^2/P) baseline. At 10^9+ vectors the same emit step runs
    after an IVF/LSH bucket groupby (bucket = candidate set) instead of
    against the broadcast matrix; see :class:`IVFIndex`.
    """

    def __init__(self, all_ref, threshold: float) -> None:
        import ray

        ids, mat = (
            ray.get(all_ref) if isinstance(all_ref, ray.ObjectRef) else all_ref
        )
        self.ids = ids
        self.mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-30)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(batch)
        matn = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-30)
        sims = matn @ self.mat.T  # (b, N)
        rows_a, rows_b, out_sims = [], [], []
        for i, a in enumerate(ids):
            hits = np.nonzero(sims[i] >= self.threshold)[0]
            for j in hits:
                b = self.ids[j]
                if a < b:
                    rows_a.append(a)
                    rows_b.append(b)
                    out_sims.append(round(float(sims[i, j]), 6))
        return pa.table(
            {
                "vec_a": pa.array(rows_a, pa.int64()),
                "vec_b": pa.array(rows_b, pa.int64()),
                "sim": pa.array(out_sims, pa.float64()),
            }
        )


def embedding_neardup(emb_ds, threshold: float = 0.9, concurrency: int = 2):
    """All embedding pairs with cosine >= threshold (exact, broadcast)."""
    import ray

    full = emb_ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = np.asarray(full["vec_id"].to_list(), dtype=np.int64)
    mat = np.array(full["embedding"].to_list(), dtype=np.float64)
    ref = ray.put((ids, mat))
    return emb_ds.map_batches(
        NearDupPairs,
        fn_constructor_kwargs={"all_ref": ref, "threshold": threshold},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
