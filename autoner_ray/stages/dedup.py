"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (ray_guide aggregation/dedup patterns):
- exact: md5 content hash per batch (vectorizable) -> groupby(hash) ->
  keep min(doc_id). The shuffle moves one short row per doc, not the text.
- MinHash+LSH near-dup: per batch compute K minhashes over token shingles,
  split into B bands; explode to (band, band_hash, doc_id) rows; a
  groupby([band, band_hash]) collects candidate buckets; pairs from
  buckets are verified with exact shingle Jaccard. Buckets are capped
  (``max_bucket``) so a degenerate hot bucket cannot produce O(n²) pairs —
  the cap is logged, not silent.
- SimHash: 64-bit signature from token-hash bit votes; near-dups are
  pairs at Hamming distance <= k within LSH-style bit-band buckets.

All hashing is content-derived (md5) — never Python's salted ``hash``.
"""

from __future__ import annotations

import hashlib


import numpy as np
import pyarrow as pa

from autoner_ray.stages.tokenize import sentence_token_stream

# -- exact -------------------------------------------------------------------


def exact_dedup(docs_ds):
    """documents -> (doc_id, text_md5): first (min doc_id) row per content."""
    from ray.data.aggregate import Min

    from autoner_ray.stages.analysis import md5_batch

    return (
        docs_ds.map_batches(md5_batch, batch_format="pyarrow")
        .groupby("text_md5")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


# -- shingles + minhash ------------------------------------------------------


def _shingles(text: str, k: int = 3) -> set[bytes]:
    toks = sentence_token_stream(text)
    if len(toks) < k:
        return {" ".join(toks).encode()} if toks else set()
    return {" ".join(toks[i : i + k]).encode() for i in range(len(toks) - k + 1)}


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    sh = _shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    return np.frombuffer(
        b"".join(hashlib.md5(s).digest()[:8] for s in sorted(sh)),
        dtype=np.uint64,
    )


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


_PARAMS_CACHE: dict[int, tuple[np.ndarray, np.ndarray]] = {}


def _cached_minhash_params(num_hashes: int):
    """Per-worker-process cache (deterministic, so every worker agrees)."""
    if num_hashes not in _PARAMS_CACHE:
        _PARAMS_CACHE[num_hashes] = _minhash_params(num_hashes)
    return _PARAMS_CACHE[num_hashes]


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """K-row signature: min over shingles of (a·h + b) mod p (vectorized)."""
    h = _shingle_hashes(text)
    # (K, S) product in uint64 with modular wrap is fine for min-comparison
    # determinism as long as both sides compute identically (same dtype).
    prod = (np.outer(a, h) + b[:, None]) % _MERSENNE
    return prod.min(axis=1)


def minhash_lsh_candidates(
    docs_ds,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.6,
    max_bucket: int = 64,
):
    """Near-duplicate pairs (doc_a < doc_b, jaccard) via MinHash LSH."""

    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    # TASK pool, not an actor pool: the minhash params are deterministic
    # and cheap (seeded rng), so a module-level cache per worker replaces
    # actor state. A FIXED actor pool here can claim every CPU on a small
    # cluster and starve the join aggregators downstream in the same
    # streaming topology (observed deadlock at num_cpus=4).
    def sign(batch: pa.Table) -> pa.Table:
        a, b = _cached_minhash_params(num_hashes)
        doc_ids, band_ids, band_hashes = [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = minhash_signature(text or "", a, b)
            for bi in range(bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                doc_ids.append(did)
                band_ids.append(bi)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )

    sigs = docs_ds.map_batches(sign, batch_format="pyarrow").materialize()

    # HOT-BUCKET CAP: a degenerate bucket with k members emits O(k²) join
    # rows, so buckets larger than ``max_bucket`` are dropped BEFORE the
    # self-join via a (band, band_hash) count + inner-join pre-filter
    # (near-identical floods are the exact-dedup stage's job, not LSH's).
    # The count table is one row per distinct bucket — same size class as
    # the signature table, fully distributed; the drop is logged.
    if max_bucket is not None:
        from ray.data.aggregate import Count as _Count

        _CAP = 5_000_000
        # one bounded job: the hot keys themselves (rare BY CONSTRUCTION
        # — at most total_rows/max_bucket of them). ``limit`` caps the
        # driver transfer; exceeding it means the corpus is dominated by
        # near-identical floods and the cap refuses to proceed.
        hot_rows = (
            sigs.groupby(["band", "band_hash"])
            .aggregate(_Count(alias_name="bucket_n"))
            .filter(lambda r: r["bucket_n"] > max_bucket)
            .select_columns(["band", "band_hash"])
            .limit(_CAP + 1)
            .take_all()
        )
        n_hot = len(hot_rows)
        if n_hot:
            import logging

            logging.getLogger(__name__).warning(
                "minhash LSH: dropping %d hot buckets (> %d members)",
                n_hot,
                max_bucket,
            )
            # Drop hot-bucket rows via a BROADCAST anti-filter, not a
            # join: the key set is small enough for ray.put even at web
            # scale (see the limit above), and it sidesteps a Ray 2.49
            # hash-join crash when a partition receives zero blocks from
            # one side.
            if n_hot > _CAP:
                raise ValueError(
                    f">{_CAP} hot LSH buckets (> {max_bucket} members "
                    "each) — the corpus is dominated by near-identical "
                    "floods; run exact_dedup first"
                )
            import ray
            hot_ref = ray.put(
                {(r["band"], r["band_hash"]) for r in hot_rows}
            )

            def drop_hot(t: pa.Table) -> pa.Table:
                hot = ray.get(hot_ref)
                keep = [
                    (b, h) not in hot
                    for b, h in zip(
                        t["band"].to_pylist(), t["band_hash"].to_pylist()
                    )
                ]
                return t.filter(pa.array(keep, pa.bool_()))

            sigs = sigs.map_batches(
                drop_hot, batch_format="pyarrow"
            ).materialize()
            if sigs.count() == 0:
                import ray.data as rd

                return rd.from_arrow(
                    pa.schema(
                        [
                            ("doc_a", pa.int64()),
                            ("doc_b", pa.int64()),
                            ("n_bands", pa.int64()),
                        ]
                    ).empty_table()
                )

    # candidates via hash-partitioned SELF-JOIN on the bucket key — the
    # join kernel pairs bucket members vectorized instead of one Python
    # map_groups call per bucket (there are ~docs*bands tiny buckets; the
    # per-group form costs ~0.2 ms each and dominates the stage).
    right = sigs.map_batches(
        lambda t: pa.table(
            {
                "band": t["band"],
                "band_hash": t["band_hash"],
                "doc_b": t["doc_id"],
            }
        ),
        batch_format="pyarrow",
    )
    from autoner_ray.stages.joins import cogroup_join

    joined = cogroup_join(sigs, right, on=("band", "band_hash"))

    def ordered_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.less(t["doc_id"], t["doc_b"])
        t = t.filter(keep)
        return pa.table({"doc_a": t["doc_id"], "doc_b": t["doc_b"]})

    from ray.data.aggregate import Count

    # distinct pairs; Count doubles as the LSH agreement strength.
    return (
        joined.map_batches(ordered_pairs, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )


def verify_jaccard(cand_ds, docs_ds, jaccard_threshold: float = 0.6):
    """Exact-Jaccard verification of LSH candidate pairs.

    Scale shape: the candidate texts come back via TWO hash joins of the
    pair table against ``documents`` (on doc_a, then doc_b) — the corpus
    is never materialized on the driver; both joins shuffle only the
    (small-by-construction) candidate rows plus the doc texts that match
    them. Keeps pairs with shingle Jaccard >= threshold, rounded 6 dp.
    """
    import ray.data as rd

    _out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )
    # Ray's hash join crashes when one side is entirely empty (its
    # partition builders produce schema-less tables), so the no-candidate
    # case short-circuits.
    if cand_ds.count() == 0:
        return rd.from_arrow(_out_schema.empty_table())
    docs2 = docs_ds.select_columns(["doc_id", "text"])
    a_side = docs2.map_batches(
        lambda t: pa.table({"doc_a": t["doc_id"], "text_a": t["text"]}),
        batch_format="pyarrow",
    )
    b_side = docs2.map_batches(
        lambda t: pa.table({"doc_b": t["doc_id"], "text_b": t["text"]}),
        batch_format="pyarrow",
    )
    from autoner_ray.stages.joins import cogroup_join

    pairs = cand_ds.select_columns(["doc_a", "doc_b"])
    with_texts = cogroup_join(
        cogroup_join(pairs, a_side, on=("doc_a",)),
        b_side,
        on=("doc_b",),
    )

    def verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a_id, b_id, ta, tb in zip(
            batch["doc_a"].to_pylist(),
            batch["doc_b"].to_pylist(),
            batch["text_a"].to_pylist(),
            batch["text_b"].to_pylist(),
        ):
            sa = _shingles(ta or "")
            sb = _shingles(tb or "")
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= jaccard_threshold:
                out_a.append(a_id)
                out_b.append(b_id)
                out_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    return with_texts.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(docs_ds, threshold: float = 0.6, **lsh_kwargs):
    """End-to-end near-dup: LSH candidates -> exact-Jaccard verification.

    The candidate pair set is materialized between the two phases — it
    is small by construction (LSH-selective), and the barrier keeps the
    verify phase's two text joins in their own streaming topology (see
    the aggregator-CPU note in :func:`minhash_lsh_candidates`)."""
    cand = minhash_lsh_candidates(
        docs_ds, jaccard_threshold=threshold, **lsh_kwargs
    ).materialize()
    return verify_jaccard(cand, docs_ds, threshold)


# -- simhash -----------------------------------------------------------------


def simhash64(text: str) -> int:
    toks = sentence_token_stream(text)
    if not toks:
        return 0
    shifts = np.arange(64, dtype=np.uint64)
    votes = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = np.uint64(
            int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        votes += 2 * bits.astype(np.int64) - 1
    bits = (votes > 0).astype(np.uint64)
    return int((bits << shifts).sum(dtype=np.uint64))


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [simhash64(t or "") for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
        }
    )


def simhash_neardup_pairs(docs_ds, max_hamming: int = 3, bands: int = 4):
    """SimHash near-duplicate pairs: 64-bit signatures split into
    ``bands`` bit-bands (pigeonhole: any pair within ``max_hamming`` < 
    ``bands`` bits shares at least one exact band); band-equality
    candidates come from the same vectorized self-join shape as MinHash
    LSH, then exact Hamming distance filters. Emits (doc_a, doc_b,
    hamming)."""
    import numpy as np

    assert max_hamming < bands, "pigeonhole needs max_hamming < bands"
    band_bits = 64 // bands

    def sign(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_vals, sigs = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            h = simhash64(text or "")
            for bi in range(bands):
                doc_ids.append(did)
                band_ids.append(bi)
                band_vals.append(
                    (h >> (bi * band_bits)) & ((1 << band_bits) - 1)
                )
                sigs.append(h - (1 << 63))  # store as signed int64
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "band_val": pa.array(band_vals, pa.int64()),
                "sig": pa.array(sigs, pa.int64()),
            }
        )

    sigs_ds = docs_ds.map_batches(sign, batch_format="pyarrow").materialize()
    right = sigs_ds.map_batches(
        lambda t: pa.table(
            {
                "band": t["band"],
                "band_val": t["band_val"],
                "doc_b": t["doc_id"],
                "sig_b": t["sig"],
            }
        ),
        batch_format="pyarrow",
    )
    from autoner_ray.stages.joins import cogroup_join

    joined = cogroup_join(sigs_ds, right, on=("band", "band_val"))

    def verify(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.less(t["doc_id"], t["doc_b"]))
        a = t["sig"].to_numpy().astype(np.int64).view(np.uint64)
        b = t["sig_b"].to_numpy().astype(np.int64).view(np.uint64)
        ham = np.bitwise_count(np.bitwise_xor(a, b)) if hasattr(
            np, "bitwise_count"
        ) else np.array(
            [bin(int(x)).count("1") for x in np.bitwise_xor(a, b)]
        )
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": t["doc_id"].to_numpy()[keep],
                "doc_b": t["doc_b"].to_numpy()[keep],
                "hamming": pa.array(
                    np.asarray(ham)[keep].astype(np.int64), pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Min

    # distinct pairs (a pair can agree on several bands)
    return (
        joined.map_batches(verify, batch_format="pyarrow")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )
