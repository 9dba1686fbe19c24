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
    from autoner_ray.functions.hashing import md5_64_array

    sh = _shingles(text, k)
    if not sh:
        return np.zeros(1, dtype=np.uint64)
    # byteswap(): md5_64_array holds the BIG-endian digest prefix; the
    # original np.frombuffer read those same 8 bytes little-endian, and
    # the sketch outputs are pinned — swapping restores bit-identity.
    return md5_64_array(sorted(sh)).byteswap()


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


def _band_rows(text: str, a, b, bands: int, rows_per_band: int,
               num_partitions: int):
    """(band_id, band_hash, part) triples for one doc — THE banding
    kernel, shared by :func:`minhash_lsh_candidates` and
    :func:`minhash_bucket_histogram` so the tuning diagnostic can never
    desynchronize from the stage it tunes."""
    sig = minhash_signature(text, a, b)
    out = []
    for bi in range(bands):
        chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
        bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
        out.append((bi, bh, int(bh[:8], 16) % num_partitions))
    return out


def minhash_lsh_candidates(
    docs_ds,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.6,
    max_bucket: int = 64,
    num_partitions: int | None = None,
):
    """Near-duplicate candidate pairs (doc_a < doc_b, n_bands) via
    MinHash LSH.

    Physical shape (2 shuffles total):
    1. ONE hash shuffle co-locates every bucket (``part`` is derived
       from the bucket hash, so a bucket never splits); inside each
       partition a vectorized acero self-join pairs bucket members —
       and the HOT-BUCKET CAP is applied there exactly (a degenerate
       bucket with k members would emit O(k²) rows; buckets over
       ``max_bucket`` are dropped and logged — near-identical floods
       are the exact-dedup stage's job, not LSH's).
    2. A global groupby dedups pairs that agree in several bands;
       Count doubles as the LSH agreement strength.

    ``num_partitions`` defaults to 2× the session's CPUs
    (autoner_ray.cluster): each pairing task then holds ~1/(2·CPUs) of
    the signature table as pandas — callers streaming very large corpora
    through few CPUs should raise it so a single partition stays within
    the worker heap.
    """
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    # TASK pool, not an actor pool: the minhash params are deterministic
    # and cheap (seeded rng), so a module-level cache per worker replaces
    # actor state. A FIXED actor pool here can claim every CPU on a small
    # cluster and starve downstream shuffle actors in the same streaming
    # topology (observed deadlock at num_cpus=4).
    def sign(batch: pa.Table) -> pa.Table:
        a, b = _cached_minhash_params(num_hashes)
        doc_ids, band_ids, band_hashes, parts = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            # content-derived partition: bucket members always meet
            for bi, bh, part in _band_rows(
                text or "", a, b, bands, rows_per_band, num_partitions
            ):
                doc_ids.append(did)
                band_ids.append(bi)
                band_hashes.append(bh)
                parts.append(part)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        if max_bucket is not None:
            sizes = df.groupby(["band", "band_hash"])["doc_id"].transform(
                "size"
            )
            hot = sizes > max_bucket
            if bool(hot.any()):
                import logging

                logging.getLogger(__name__).warning(
                    "minhash LSH: dropping %d hot buckets "
                    "(> %d members)",
                    df[hot].groupby(["band", "band_hash"]).ngroups,
                    max_bucket,
                )
                df = df[~hot]
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series(dtype="int64"),
                    "doc_b": pd.Series(dtype="int64"),
                    "n_bands": pd.Series(dtype="int64"),
                    "pair_part": pd.Series(dtype="int32"),
                }
            )
        lt = pa.table(
            {
                "band": pa.array(df["band"], pa.int32()),
                "band_hash": pa.array(df["band_hash"], pa.string()),
                "doc_a": pa.array(df["doc_id"], pa.int64()),
            }
        )
        rt = lt.rename_columns(["band", "band_hash", "doc_b"])
        j = lt.join(rt, keys=["band", "band_hash"], join_type="inner")
        import pyarrow.compute as pc

        j = j.filter(pc.less(j["doc_a"], j["doc_b"]))
        # partial per-partition band-agreement counts; the global combine
        # is a second hash-partitioned pandas map_groups (pair_part), not
        # a Ray multi-key row aggregate (~3 ms/row in 2.49)
        g = (
            pd.DataFrame(
                {
                    "doc_a": j["doc_a"].to_numpy(),
                    "doc_b": j["doc_b"].to_numpy(),
                }
            )
            .groupby(["doc_a", "doc_b"], as_index=False)
            .agg(n_bands=("doc_a", "size"))
        )
        g["pair_part"] = _pair_part(
            g["doc_a"].to_numpy(), g["doc_b"].to_numpy(), num_partitions
        )
        return g

    def combine_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            n_bands=("n_bands", "sum")
        )

    return (
        docs_ds.map_batches(sign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
        .groupby("pair_part")
        .map_groups(combine_pairs, batch_format="pandas")
    )


def verify_jaccard(cand_ds, docs_ds, jaccard_threshold: float = 0.6):
    """Exact-Jaccard verification of LSH candidate pairs.

    Scale shape (tiered; the corpus is NEVER materialized on the
    driver):
    1. semi-join reduction — broadcast the candidate doc-id set and
       pre-filter ``documents`` to just the docs that appear in a pair;
    2. if the surviving doc set is tiny (<= 20k), broadcast those texts
       and verify in a stateless map (zero joins);
    3. otherwise TWO sparse-key-safe hash joins (on doc_a, then doc_b)
       shuffle only candidate rows + matching texts.
    Keeps pairs with shingle Jaccard >= threshold, rounded 6 dp.
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
    n_cand = cand_ds.count()
    if n_cand == 0:
        return rd.from_arrow(_out_schema.empty_table())
    docs2 = docs_ds.select_columns(["doc_id", "text"])
    # SEMI-JOIN REDUCTION: only docs that appear in a candidate pair are
    # needed, and the candidate set is small by construction (LSH-
    # selective), so broadcast its doc-id set and pre-filter the corpus —
    # the joins then shuffle |candidate docs| texts, not |corpus|.
    # Bounded: above the cap, fall back to the full join (still correct).
    if n_cand <= 2_500_000:
        import ray

        ids: set[int] = set()
        for b in cand_ds.select_columns(["doc_a", "doc_b"]).iter_batches(
            batch_size=65536, batch_format="pyarrow"
        ):
            ids.update(b["doc_a"].to_pylist())
            ids.update(b["doc_b"].to_pylist())
        ids_ref = ray.put(ids)

        def keep_candidates(t: pa.Table) -> pa.Table:
            wanted = ray.get(ids_ref)
            mask = [d in wanted for d in t["doc_id"].to_pylist()]
            return t.filter(pa.array(mask, pa.bool_()))

        docs2 = docs2.map_batches(keep_candidates, batch_format="pyarrow")

        if len(ids) <= 20_000:
            # SMALL-SIDE BROADCAST tier: the candidate texts fit the
            # object store comfortably, so skip the two hash joins and
            # verify against a broadcast {doc_id: text} of candidate
            # docs ONLY (bounded — never the corpus; the join path below
            # handles everything larger).
            texts: dict[int, str] = {}
            for b in docs2.iter_batches(
                batch_size=4096, batch_format="pyarrow"
            ):
                texts.update(
                    zip(b["doc_id"].to_pylist(), b["text"].to_pylist())
                )
            texts_ref = ray.put(texts)

            def verify_broadcast(batch: pa.Table) -> pa.Table:
                lut = ray.get(texts_ref)
                out_a, out_b, out_j = [], [], []
                for a_id, b_id in zip(
                    batch["doc_a"].to_pylist(), batch["doc_b"].to_pylist()
                ):
                    sa = _shingles(lut.get(a_id, "") or "")
                    sb = _shingles(lut.get(b_id, "") or "")
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

            return cand_ds.select_columns(["doc_a", "doc_b"]).map_batches(
                verify_broadcast, batch_format="pyarrow"
            )
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
    from autoner_ray.functions.hashing import md5_64_array

    toks = sentence_token_stream(text)
    if not toks:
        return 0
    hs = md5_64_array(toks)  # memoized md5 per distinct token
    shifts = np.arange(64, dtype=np.uint64)
    # one (n_tokens, 64) unpack instead of a 64-wide numpy op per token
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    bits_out = (votes > 0).astype(np.uint64)
    return int((bits_out << shifts).sum(dtype=np.uint64))


def simhash_batch(batch: pa.Table) -> pa.Table:
    hs = [simhash64(t or "") for t in batch["text"].to_pylist()]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "simhash": pa.array([f"{h:016x}" for h in hs], pa.string()),
        }
    )


def simhash_neardup_pairs(docs_ds, max_hamming: int = 3, bands: int = 4,
                          num_partitions: int | None = None):
    """SimHash near-duplicate pairs: 64-bit signatures split into
    ``bands`` bit-bands (pigeonhole: any pair within ``max_hamming`` <
    ``bands`` bits shares at least one exact band). Same 2-shuffle
    shape as MinHash LSH: one content-hash partition shuffle co-locates
    each (band, band_val) bucket, a vectorized in-partition self-join
    pairs members and filters exact Hamming distance, and a global
    groupby dedups pairs that agree on several bands. Emits
    (doc_a, doc_b, hamming)."""
    import numpy as np
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    assert max_hamming < bands, "pigeonhole needs max_hamming < bands"
    band_bits = 64 // bands

    def sign(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_vals, sigs, parts = [], [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            h = simhash64(text or "")
            for bi in range(bands):
                bv = (h >> (bi * band_bits)) & ((1 << band_bits) - 1)
                doc_ids.append(did)
                band_ids.append(bi)
                band_vals.append(bv)
                sigs.append(h - (1 << 63))  # store as signed int64
                parts.append(
                    int.from_bytes(
                        hashlib.md5(f"{bi}:{bv}".encode()).digest()[:4],
                        "big",
                    )
                    % num_partitions
                )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(band_ids, pa.int32()),
                "band_val": pa.array(band_vals, pa.int64()),
                "sig": pa.array(sigs, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        lt = pa.table(
            {
                "band": pa.array(df["band"], pa.int32()),
                "band_val": pa.array(df["band_val"], pa.int64()),
                "doc_a": pa.array(df["doc_id"], pa.int64()),
                "sig_a": pa.array(df["sig"], pa.int64()),
            }
        )
        rt = lt.rename_columns(["band", "band_val", "doc_b", "sig_b"])
        import pyarrow.compute as pc

        j = lt.join(rt, keys=["band", "band_val"], join_type="inner")
        j = j.filter(pc.less(j["doc_a"], j["doc_b"]))
        a = j["sig_a"].to_numpy().astype(np.int64).view(np.uint64)
        b = j["sig_b"].to_numpy().astype(np.int64).view(np.uint64)
        ham = np.bitwise_count(np.bitwise_xor(a, b)) if hasattr(
            np, "bitwise_count"
        ) else np.array(
            [bin(int(x)).count("1") for x in np.bitwise_xor(a, b)],
            dtype=np.int64,
        )
        keep = np.asarray(ham) <= max_hamming
        g = pd.DataFrame(
            {
                "doc_a": j["doc_a"].to_numpy()[keep],
                "doc_b": j["doc_b"].to_numpy()[keep],
                "hamming": np.asarray(ham)[keep].astype(np.int64),
            }
        ).drop_duplicates(["doc_a", "doc_b"])  # hamming is pair-determined
        g["pair_part"] = _pair_part(
            g["doc_a"].to_numpy(), g["doc_b"].to_numpy(), num_partitions
        )
        return g

    # distinct pairs (a pair can agree on several bands, possibly in
    # different bucket partitions) — same hash-partitioned pandas combine
    # as the minhash/ngram paths, not a Ray multi-key row aggregate
    def combine_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["doc_a", "doc_b"])[
            ["doc_a", "doc_b", "hamming"]
        ]

    return (
        docs_ds.map_batches(sign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
        .groupby("pair_part")
        .map_groups(combine_pairs, batch_format="pandas")
    )


# -- exact n-gram Jaccard (no sketching) --------------------------------------


def _pair_part(a: np.ndarray, b: np.ndarray, P: int) -> np.ndarray:
    """Vectorized deterministic partition id for (doc_a, doc_b) pairs
    (splitmix64 finalizer over both ids) — every occurrence of a pair
    lands in the same partition regardless of which task emitted it."""
    z = a.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15) * (
        b.astype(np.uint64) + np.uint64(1)
    )
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(P)).astype(np.int32)


def ngram_jaccard_exact_pairs(
    docs_ds,
    threshold: float = 0.6,
    k: int = 3,
    num_partitions: int | None = None,
    max_df: int | None = None,
    score_mode: str = "jaccard",
):
    """EXACT n-gram Jaccard near-duplicate pairs via a shared-shingle
    join — the deterministic twin of :func:`ngram_jaccard_pairs` (which
    goes through MinHash LSH candidates and is the at-scale default).

    Shape: one ``map_batches`` explodes each doc into DISTINCT k-token
    shingle hashes, every row carrying the doc's shingle-set size; one
    content-hash shuffle co-locates each shingle (``groupby(part)``), a
    vectorized in-partition self-join counts common shingles per pair,
    and a global pair groupby sums the partials — each shingle lives in
    exactly ONE partition, so partition-local pair counts add up to the
    exact intersection and no text or set ever lands on the driver.
    Jaccard = common / (|A| + |B| - common), computed from exact integer
    counts in float64 (bit-stable vs a SQL oracle).

    Scale note: a promiscuous shingle shared by m docs emits m² join
    rows. Because partitioning is BY shingle, document frequency is
    exact within a partition, so ``max_df`` prunes hot shingles (e.g.
    boilerplate) locally with no extra pass — at the cost of exactness
    for pairs whose overlap rides only on pruned shingles. Default None
    (fully exact) for oracle parity; set it for web-scale corpora.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from autoner_ray.cluster import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, shingles, sizes, parts = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = _shingles(text or "", k)
            if not sh:
                continue  # shingle-less docs cannot pair (matches SQL)
            from autoner_ray.functions.hashing import md5_64_array

            hs = md5_64_array(sorted(sh))
            n = len(hs)
            doc_ids.extend([did] * n)
            # signed view for Arrow int64; partition on the unsigned value
            shingles.extend(hs.view(np.int64).tolist())
            sizes.extend([n] * n)
            parts.extend((hs % np.uint64(num_partitions)).astype(np.int32).tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "shingle": pa.array(shingles, pa.int64()),
                "size": pa.array(sizes, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    _empty_partials = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "common": pd.Series([], dtype="int64"),
            "size_a": pd.Series([], dtype="int64"),
            "size_b": pd.Series([], dtype="int64"),
            "pair_part": pd.Series([], dtype="int32"),
        }
    )

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        if max_df is not None:
            # partitioning is by shingle -> local df IS global df
            df = df[df.groupby("shingle")["shingle"].transform("size") <= max_df]
        lt = pa.table(
            {
                "shingle": pa.array(df["shingle"], pa.int64()),
                "doc_a": pa.array(df["doc_id"], pa.int64()),
                "size_a": pa.array(df["size"], pa.int64()),
            }
        )
        rt = lt.rename_columns(["shingle", "doc_b", "size_b"])
        j = lt.join(rt, keys=["shingle"], join_type="inner")
        j = j.filter(pc.less(j["doc_a"], j["doc_b"]))
        if j.num_rows == 0:
            return _empty_partials
        g = (
            j.select(["doc_a", "doc_b", "size_a", "size_b"])
            .to_pandas()
            .groupby(["doc_a", "doc_b"], as_index=False)
            .agg(common=("size_a", "size"), size_a=("size_a", "first"),
                 size_b=("size_b", "first"))
        )
        g["pair_part"] = _pair_part(
            g["doc_a"].to_numpy(), g["doc_b"].to_numpy(), num_partitions
        )
        return g[["doc_a", "doc_b", "common", "size_a", "size_b", "pair_part"]]

    # The global pair combine is a SECOND hash-partitioned map_groups
    # (partition key derived from the pair), NOT a Ray row-level
    # groupby().aggregate() — Ray 2.49's multi-key sort aggregate costs
    # ~3 ms/row in Python; the pandas combine below is vectorized.
    def combine_pairs(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            common=("common", "sum"), size_a=("size_a", "first"),
            size_b=("size_b", "first"),
        )
        c = g["common"].to_numpy().astype(np.float64)
        sa = g["size_a"].to_numpy().astype(np.float64)
        sb = g["size_b"].to_numpy().astype(np.float64)
        if score_mode == "containment":
            # symmetric max-containment c/min(|A|,|B|): 1.0 whenever one
            # doc's shingle set is a subset of the other's — the
            # quote/boilerplate-inclusion detector Jaccard misses when
            # the containing doc is much larger
            scr = c / np.minimum(sa, sb)
            col = "containment"
        else:
            scr = c / (sa + sb - c)
            col = "jaccard"
        keep = scr >= threshold
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].to_numpy()[keep],
                "doc_b": g["doc_b"].to_numpy()[keep],
                col: scr[keep],
            }
        )

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
        .groupby("pair_part")
        .map_groups(combine_pairs, batch_format="pandas")
    )


def neardup_keep_one(
    docs_ds,
    threshold: float = 0.6,
    k: int = 3,
    num_partitions: int | None = None,
    driver_cc_max_pairs: int = 2_000_000,
    pair_source: str = "exact",
):
    """End-to-end near-duplicate REMOVAL — the pipeline a training-data
    run actually executes (pairs alone are diagnostics): n-gram Jaccard
    pairs (``pair_source="exact"``: deterministic shared-shingle join,
    oracle-checkable; ``"lsh"``: MinHash-LSH candidates + verify, the
    sub-quadratic web-scale default) → distributed
    min-id label propagation over the pair graph
    (``connected_components_distributed``, int64 nodes) → every cluster
    keeps its smallest ``doc_id``; docs in no pair survive untouched.

    Returns a Dataset of surviving ``doc_id`` rows.

    Scale shape: the pair graph holds ONLY near-duplicate docs, so the
    label table is the duplicate fraction of the corpus, never the
    corpus. TIERED like ``verify_jaccard``: a pair set up to
    ``driver_cc_max_pairs`` runs union-find on the driver (the common
    case — each distributed CC iteration costs 2 shuffles, pure fixed
    cost on a small graph); above the bound, distributed min-label
    propagation (``connected_components_distributed``, int64 nodes)
    takes over with identical results. The loser set (cluster members
    minus winners) is broadcast once via ``ray.put`` and the full doc
    stream anti-filters against it with a vectorized ``pc.is_in`` — no
    shuffle of the corpus. At extreme duplicate rates (loser set too
    big for one object) swap the broadcast for a ``cogroup_join``
    anti-join on doc_id; the rest of the pipeline is unchanged.
    """
    import ray

    import pyarrow.compute as pc

    if pair_source == "exact":
        pairs = ngram_jaccard_exact_pairs(
            docs_ds, threshold=threshold, k=k,
            num_partitions=num_partitions,
        ).materialize()
    elif pair_source == "lsh":
        # at-scale default pair generator: MinHash-LSH candidates +
        # exact verification; sub-quadratic, recall < 1 by design
        pairs = ngram_jaccard_pairs(
            docs_ds, threshold=threshold
        ).materialize()
    else:
        raise ValueError(f"unknown pair_source: {pair_source!r}")

    if pairs.count() <= driver_cc_max_pairs:
        pdf = pairs.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        loser_ids = [n for n in parent if find(n) != n]
    else:
        from autoner_ray.stages.graph import (
            connected_components_distributed,
        )

        _edge_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

        def pairs_to_edges(t: pa.Table) -> pa.Table:
            # schema-less empty blocks reach UDFs after sparse shuffles
            # (same RefBundle quirk losers_batch guards against)
            if t.num_columns == 0 or len(t) == 0:
                return _edge_schema.empty_table()
            return pa.table({"subj": t["doc_a"], "obj": t["doc_b"]})

        edges = pairs.map_batches(pairs_to_edges, batch_format="pyarrow")
        labels = connected_components_distributed(
            edges, num_partitions=num_partitions, as_dataset=True
        )
        # losers: members whose propagated min-label is a smaller id
        _loser_schema = pa.schema([("doc_id", pa.int64())])

        def losers_batch(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _loser_schema.empty_table()
            keep = pc.less(t["label"], t["src"])
            return pa.table({"doc_id": t["src"].filter(keep)})

        loser_ids = labels.map_batches(
            losers_batch, batch_format="pyarrow"
        ).to_pandas()["doc_id"]
    losers_ref = ray.put(pa.array(loser_ids, pa.int64()))

    class SurvivorFilter:
        def __init__(self) -> None:
            self.losers = ray.get(losers_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t["doc_id"], value_set=self.losers))
            return pa.table({"doc_id": t["doc_id"].filter(mask)})

    return docs_ds.select_columns(["doc_id"]).map_batches(
        SurvivorFilter, batch_format="pyarrow", concurrency=2
    )


def neardup_cluster_sizes(
    docs_ds,
    threshold: float = 0.6,
    k: int = 3,
    num_partitions: int | None = None,
    driver_cc_max_pairs: int = 2_000_000,
    pair_source: str = "exact",
):
    """Near-duplicate CLUSTER SIZE histogram: (cluster_size,
    n_clusters) over the connected components of the near-dup pair
    graph — the dedup-report companion to ``neardup_keep_one`` (how
    much mass sits in big boilerplate clusters vs scattered pairs).

    Same tiered component labeling as ``neardup_keep_one`` (driver
    union-find under ``driver_cc_max_pairs``, distributed min-label
    propagation above); cluster sizes come from a label count and the
    size histogram from the bounded combine. Only docs that appear in
    a qualifying pair belong to a cluster (sizes >= 2 by
    construction)."""
    import ray
    import ray.data as rd

    from autoner_ray.stages.combine import bounded_key_sum

    if pair_source == "exact":
        pairs = ngram_jaccard_exact_pairs(
            docs_ds, threshold=threshold, k=k,
            num_partitions=num_partitions,
        ).materialize()
    elif pair_source == "lsh":
        pairs = ngram_jaccard_pairs(
            docs_ds, threshold=threshold
        ).materialize()
    else:
        raise ValueError(f"unknown pair_source: {pair_source!r}")

    if pairs.count() <= driver_cc_max_pairs:
        from collections import Counter

        pdf = pairs.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        sizes = Counter(find(n) for n in parent)
        hist = Counter(sizes.values())
        return rd.from_arrow(
            pa.table(
                {
                    "cluster_size": pa.array(
                        sorted(hist.keys()), pa.int64()
                    ),
                    "n_clusters": pa.array(
                        [hist[s] for s in sorted(hist.keys())],
                        pa.int64(),
                    ),
                }
            )
        )

    from autoner_ray.stages.graph import connected_components_distributed

    _edge_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

    def pairs_to_edges(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _edge_schema.empty_table()
        return pa.table({"subj": t["doc_a"], "obj": t["doc_b"]})

    labels = connected_components_distributed(
        pairs.map_batches(pairs_to_edges, batch_format="pyarrow"),
        num_partitions=num_partitions, as_dataset=True,
    )

    def label_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        agg = t.select(["label"]).group_by("label").aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns(["label", "n"])

    # label keyset = number of clusters (duplicate fraction of the
    # corpus) — key-distributed; int64 labels partition vectorized
    from autoner_ray.stages.combine import partitioned_key_sum

    per_cluster = partitioned_key_sum(
        labels.map_batches(label_partial, batch_format="pyarrow"),
        ["label"], ["n"], part_on=("label",),
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "cluster_size": pa.array([], pa.int64()),
                    "n_clusters": pa.array([], pa.int64()),
                }
            )
        agg = (
            t.select(["n"])
            .rename_columns(["cluster_size"])
            .group_by("cluster_size")
            .aggregate([([], "count_all")])
        )
        return agg.rename_columns(["cluster_size", "n_clusters"])

    return bounded_key_sum(
        per_cluster.map_batches(hist_partial, batch_format="pyarrow"),
        ["cluster_size"], ["n_clusters"],
    )


def winnowing_neardup_pairs(
    docs_ds,
    min_shared: int = 5,
    k: int = 8,
    w: int = 4,
    num_partitions: int | None = None,
    max_df: int | None = None,
):
    """Substring-level near-duplicate pairs via shared WINNOWED
    fingerprints: docs whose winnow-selected k-gram fingerprint sets
    intersect in at least ``min_shared`` entries — the MOSS-style
    detector that catches long verbatim passages (each shared fp
    certifies a shared k-token run) where whole-set Jaccard dilutes.

    Same partitioned shape as :func:`ngram_jaccard_exact_pairs`: one
    map explodes each doc to its DISTINCT winnowed fps (fp count is
    ~2·tokens/w, so this stream is ~8x smaller than the shingle
    explode), one content-hash shuffle co-locates each fp, an
    in-partition vectorized self-join counts shared fps per pair, and
    a pair-partitioned combine sums partials. ``max_df`` prunes
    boilerplate fps locally (df is exact per partition) for web-scale
    corpora; None keeps oracle exactness.

    Output: (doc_a, doc_b, n_shared, size_a, size_b) — all exact
    int64, no float in the hash.
    """
    import pandas as pd
    import pyarrow.compute as pc

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.analysis import (
        _poly_gram_hashes,
        _winnow_positions,
    )

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, fps, sizes, parts = [], [], [], []
        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            grams = _poly_gram_hashes((text or "").split(" "), k)
            arr = np.array(grams, np.uint64)
            sel = np.unique(arr[_winnow_positions(arr, w)])
            n = len(sel)
            if n == 0:
                continue
            doc_ids.extend([did] * n)
            fps.extend(sel.view(np.int64).tolist())
            sizes.extend([n] * n)
            parts.extend(
                (sel % np.uint64(num_partitions)).astype(np.int32).tolist()
            )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "fp": pa.array(fps, pa.int64()),
                "size": pa.array(sizes, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    _empty_partials = pd.DataFrame(
        {
            "doc_a": pd.Series([], dtype="int64"),
            "doc_b": pd.Series([], dtype="int64"),
            "n_shared": pd.Series([], dtype="int64"),
            "size_a": pd.Series([], dtype="int64"),
            "size_b": pd.Series([], dtype="int64"),
            "pair_part": pd.Series([], dtype="int32"),
        }
    )

    def pairs_in_partition(df: pd.DataFrame) -> pd.DataFrame:
        # zero-column groups reach UDFs after sparse shuffles (the
        # Ray 2.49 RefBundle pathology every sibling callable guards)
        if len(df) == 0 or "fp" not in df.columns:
            return _empty_partials
        if max_df is not None:
            df = df[df.groupby("fp")["fp"].transform("size") <= max_df]
        lt = pa.table(
            {
                "fp": pa.array(df["fp"], pa.int64()),
                "doc_a": pa.array(df["doc_id"], pa.int64()),
                "size_a": pa.array(df["size"], pa.int64()),
            }
        )
        rt = lt.rename_columns(["fp", "doc_b", "size_b"])
        j = lt.join(rt, keys=["fp"], join_type="inner")
        j = j.filter(pc.less(j["doc_a"], j["doc_b"]))
        if j.num_rows == 0:
            return _empty_partials
        g = (
            j.select(["doc_a", "doc_b", "size_a", "size_b"])
            .to_pandas()
            .groupby(["doc_a", "doc_b"], as_index=False)
            .agg(n_shared=("size_a", "size"), size_a=("size_a", "first"),
                 size_b=("size_b", "first"))
        )
        g["pair_part"] = _pair_part(
            g["doc_a"].to_numpy(), g["doc_b"].to_numpy(), num_partitions
        )
        return g[
            ["doc_a", "doc_b", "n_shared", "size_a", "size_b", "pair_part"]
        ]

    def combine_pairs(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_a" not in df.columns:
            return _empty_partials.drop(columns=["pair_part"])
        g = df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            n_shared=("n_shared", "sum"), size_a=("size_a", "first"),
            size_b=("size_b", "first"),
        )
        g = g[g["n_shared"] >= min_shared]
        return g[["doc_a", "doc_b", "n_shared", "size_a", "size_b"]]

    return (
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pandas")
        .groupby("pair_part")
        .map_groups(combine_pairs, batch_format="pandas")
    )


def winnowing_neardup_oracle_sql(min_shared: int = 5, k: int = 8,
                                 w: int = 4) -> str:
    from autoner_ray.stages.analysis import _winnow_ctes

    return f"""
        WITH {_winnow_ctes(k, w)},
        u AS MATERIALIZED (
            SELECT DISTINCT doc_id, whash FROM fpset
        ),
        sz AS MATERIALIZED (
            SELECT doc_id, COUNT(*) AS size FROM u GROUP BY doc_id
        ),
        p AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS n_shared
            FROM u a JOIN u b
              ON a.whash = b.whash AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b, CAST(n_shared AS BIGINT) AS n_shared,
               CAST(sa.size AS BIGINT) AS size_a,
               CAST(sb.size AS BIGINT) AS size_b
        FROM p
        JOIN sz sa ON sa.doc_id = p.doc_a
        JOIN sz sb ON sb.doc_id = p.doc_b
        WHERE n_shared >= {min_shared}
    """


def minhash_signatures(docs_ds, num_hashes: int = 64):
    """The raw MinHash signature table (doc_id, perm, sig) — the exact
    kernel :func:`minhash_lsh_candidates` bands over, exposed as a
    driver-checkable query so the LSH path's core arithmetic carries a
    SQL oracle (the banding itself stays pinned by the brute-force
    recall test).

    sig = min over the doc's DISTINCT 3-token shingles of
    ``(a_k·h + b_k) mod 2^64 mod (2^61-1)`` with h the little-endian
    md5-prefix shingle hash — bit-identical to the numpy uint64
    wraparound in :func:`minhash_signature`, mirrored in HUGEINT by the
    oracle. Stateless vectorized map; ~``num_hashes`` rows out per doc.
    """

    def sign(batch: pa.Table) -> pa.Table:
        a, b = _cached_minhash_params(num_hashes)
        n = len(batch)
        if batch.num_columns == 0 or n == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "perm": pa.array([], pa.int64()),
                    "sig": pa.array([], pa.int64()),
                }
            )
        doc_ids = np.repeat(
            batch["doc_id"].to_numpy(zero_copy_only=False), num_hashes
        )
        perms = np.tile(np.arange(num_hashes, dtype=np.int64), n)
        sigs = np.concatenate(
            [
                minhash_signature(t or "", a, b)
                for t in batch["text"].to_pylist()
            ]
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "perm": pa.array(perms, pa.int64()),
                # sig < 2^61 so the int64 view is value-preserving
                "sig": pa.array(sigs.view(np.int64), pa.int64()),
            }
        )

    return docs_ds.map_batches(sign, batch_format="pyarrow")


def _minhash_sig_ctes(num_hashes: int = 64, k: int = 3) -> str:
    """CTE chain ending in ``sig(doc_id, perm, sig)`` — the exact
    signature table; shared by the signature oracle and the LSH
    bucket-size histogram oracle."""
    a, b = _minhash_params(num_hashes)
    params = ", ".join(
        f"({i}, {int(ai)}, {int(bi)})"
        for i, (ai, bi) in enumerate(zip(a, b))
    )
    # little-endian uint64 of the md5 prefix: byte-reversed hex chunks
    le = " || ".join(
        f"substring(md5(sh), {2 * j + 1}, 2)" for j in reversed(range(8))
    )
    return f"""
        ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id,
                       array_to_string(
                           ws[CAST(i AS BIGINT):CAST(i AS BIGINT)+{k - 1}],
                           ' ') AS sh
                FROM ws, unnest(range(1, len(ws) - {k - 2})) AS t(i)
                WHERE len(ws) >= {k}
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ')
                FROM ws WHERE len(ws) < {k}
            )
        ),
        h AS MATERIALIZED (
            SELECT doc_id,
                   CAST(('0x' || {le}) AS UBIGINT) AS h
            FROM sh
        ),
        p(perm, a, b) AS (VALUES {params}),
        sig AS MATERIALIZED (
            SELECT doc_id, CAST(p.perm AS BIGINT) AS perm,
                   CAST(MIN(
                       ((CAST(p.a AS HUGEINT) * h.h)
                        % 18446744073709551616 + p.b)
                       % 18446744073709551616 % 2305843009213693951
                   ) AS BIGINT) AS sig
            FROM h CROSS JOIN p
            GROUP BY doc_id, p.perm
        )
    """


def minhash_signatures_oracle_sql(num_hashes: int = 64, k: int = 3) -> str:
    return f"""
        WITH {_minhash_sig_ctes(num_hashes, k)}
        SELECT doc_id, perm, sig FROM sig
    """


def minhash_bucket_histogram(docs_ds, num_hashes: int = 64,
                             bands: int = 16,
                             num_partitions: int | None = None):
    """LSH band-bucket size histogram: (bucket_size, n_buckets) over
    all (band, band-signature) buckets — THE tuning diagnostic for
    :func:`minhash_lsh_candidates`' hot-bucket cap (``max_bucket``):
    the histogram's tail says exactly how many candidate-pair
    explosions the cap will clip and how much recall that costs.

    Shape: the signature map emits one (band, band_hash) row per doc
    per band with the same content-derived partition as the LSH stage
    (a bucket never splits), so per-partition bucket sizes are exact;
    a bounded combine sums the (size -> count) partials. The oracle
    groups by the raw 4-sig tuple instead of the md5 band key — the
    size distribution is identical absent an md5 collision WITHIN a
    band (2^-64-scale; none possible on test corpora).
    """
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.combine import bounded_key_sum

    if num_partitions is None:
        num_partitions = default_num_partitions()
    rows_per_band = num_hashes // bands
    assert rows_per_band * bands == num_hashes

    def sign(batch: pa.Table) -> pa.Table:
        a, b = _cached_minhash_params(num_hashes)
        band_ids, band_hashes, parts = [], [], []
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table(
                {
                    "band": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.string()),
                    "part": pa.array([], pa.int32()),
                }
            )
        for text in batch["text"].to_pylist():
            for bi, bh, part in _band_rows(
                text or "", a, b, bands, rows_per_band, num_partitions
            ):
                band_ids.append(bi)
                band_hashes.append(bh)
                parts.append(part)
        return pa.table(
            {
                "band": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def local_hist(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "band" not in df.columns:
            return pd.DataFrame(
                {
                    "bucket_size": pd.Series(dtype="int64"),
                    "n_buckets": pd.Series(dtype="int64"),
                }
            )
        sizes = df.groupby(["band", "band_hash"], sort=False).size()
        hist = sizes.value_counts()
        return pd.DataFrame(
            {
                "bucket_size": hist.index.to_numpy(np.int64),
                "n_buckets": hist.to_numpy(np.int64),
            }
        )

    return bounded_key_sum(
        docs_ds.map_batches(sign, batch_format="pyarrow")
        .groupby("part")
        .map_groups(local_hist, batch_format="pandas"),
        ["bucket_size"], ["n_buckets"],
    )


def minhash_bucket_histogram_oracle_sql(num_hashes: int = 64,
                                        bands: int = 16,
                                        k: int = 3) -> str:
    rpb = num_hashes // bands
    return f"""
        WITH {_minhash_sig_ctes(num_hashes, k)},
        bucket AS (
            SELECT doc_id, perm // {rpb} AS band,
                   list(sig ORDER BY perm) AS key
            FROM sig GROUP BY doc_id, perm // {rpb}
        ),
        sizes AS (
            SELECT band, key, COUNT(*) AS bucket_size
            FROM bucket GROUP BY band, key
        )
        SELECT CAST(bucket_size AS BIGINT) AS bucket_size,
               CAST(COUNT(*) AS BIGINT) AS n_buckets
        FROM sizes GROUP BY bucket_size
    """


def shingle_df_histogram(docs_ds, k: int = 3,
                         num_partitions: int | None = None):
    """Document-frequency histogram of k-token shingles:
    (df, n_shingles) — the companion diagnostic to
    :func:`minhash_bucket_histogram` that tunes
    ``ngram_jaccard_exact_pairs``' ``max_df`` hot-shingle cap: the
    histogram tail is exactly the set of promiscuous (boilerplate)
    shingles whose m² join fan-out the cap must clip.

    Shape: per-batch DISTINCT-shingles-per-doc explode (each row a
    shingle string) -> one shingle-partitioned count combine (the
    shingle vocab never lands on the driver) -> per-partition
    histogram partials -> shuffle-free bounded combine over df values
    (df is bounded by corpus doc count, and in practice by the cap
    region of interest)."""
    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_sum,
    )

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "sh": pa.array([], pa.string()),
                "one": pa.array([], pa.int64()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        out: list[str] = []
        for text in batch["text"].to_pylist():
            out.extend(
                s.decode() for s in _shingles(text or "", k)
            )
        return pa.table(
            {
                "sh": pa.array(out, pa.string()),
                "one": pa.array(np.ones(len(out), np.int64)),
            }
        )

    df_counts = partitioned_key_sum(
        docs_ds.map_batches(explode, batch_format="pyarrow"),
        ["sh"], ["one"], part_on=("sh",),
        num_partitions=num_partitions,
    )

    def hist_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "one" not in (
            t.column_names
        ):
            return pa.table(
                {
                    "df": pa.array([], pa.int64()),
                    "n_shingles": pa.array([], pa.int64()),
                }
            )
        vals, counts = np.unique(
            t["one"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return pa.table(
            {
                "df": pa.array(vals, pa.int64()),
                "n_shingles": pa.array(counts, pa.int64()),
            }
        )

    return bounded_key_sum(
        df_counts.map_batches(hist_partial, batch_format="pyarrow",
                              batch_size=None),
        ["df"], ["n_shingles"],
    )


def shingle_df_histogram_oracle_sql(k: int = 3) -> str:
    return f"""
        WITH ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        sh AS MATERIALIZED (
            SELECT DISTINCT doc_id, sh FROM (
                SELECT doc_id,
                       array_to_string(
                           ws[CAST(i AS BIGINT):CAST(i AS BIGINT)+{k - 1}],
                           ' ') AS sh
                FROM ws, unnest(range(1, len(ws) - {k - 2})) AS t(i)
                WHERE len(ws) >= {k}
                UNION ALL
                SELECT doc_id, array_to_string(ws, ' ')
                FROM ws WHERE len(ws) < {k}
            )
        ),
        df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
        SELECT CAST(df AS BIGINT) AS df,
               CAST(COUNT(*) AS BIGINT) AS n_shingles
        FROM df GROUP BY df
    """


def dup_gram_coverage(docs_ds, n: int = 7,
                      num_partitions: int | None = None):
    """Per-doc duplicated-n-gram coverage (RefinedWeb/Gopher-family
    CROSS-doc repetition signal): of a doc's DISTINCT n-token grams,
    how many occur in at least one OTHER doc — (doc_id, n_grams,
    n_dup, dup_ppm). Complements ``repetition_batch`` (within-doc) and
    ``crossdoc_dup_windows`` (corpus-level window list) with the
    per-doc quality-cut number.

    Shape: per-batch explode to DISTINCT (gram-hash128, doc_id) rows;
    ONE gram-partitioned pass where local df IS global df (each gram
    lives in exactly one partition) flags dup grams; one doc-partitioned
    sum combine rolls up per-doc counts. ppm via integer floor-div on
    both sides — no float in the hash."""
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.combine import partitioned_key_sum

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def explode(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "hi": pa.array([], pa.int64()),
                "lo": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        his, los, ids, parts = [], [], [], []
        from autoner_ray.stages.decontam import (
            _doc_grams,
            _gram_hash128,
        )

        for did, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            grams = _doc_grams(text or "", n)
            if not grams:
                continue
            hi, lo = _gram_hash128(grams)
            his.extend(hi.view(np.int64).tolist())
            los.extend(lo.view(np.int64).tolist())
            ids.extend([did] * len(grams))
            parts.extend(
                (hi % np.uint64(num_partitions)).astype(np.int32).tolist()
            )
        return pa.table(
            {
                "hi": pa.array(his, pa.int64()),
                "lo": pa.array(los, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def flag_dups(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "doc_id" not in df.columns:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "n_grams": pd.Series(dtype="int64"),
                    "n_dup": pd.Series(dtype="int64"),
                }
            )
        # partitioning is by gram hash -> local df IS global df
        dup = df.groupby(["hi", "lo"])["doc_id"].transform("size") >= 2
        agg = (
            pd.DataFrame({"doc_id": df["doc_id"], "dup": dup.astype(np.int64)})
            .groupby("doc_id", sort=False)
            .agg(n_grams=("dup", "size"), n_dup=("dup", "sum"))
            .reset_index()
        )
        return agg

    per_doc = partitioned_key_sum(
        docs_ds.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flag_dups, batch_format="pandas"),
        ["doc_id"], ["n_grams", "n_dup"], part_on=("doc_id",),
        num_partitions=num_partitions,
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "n_grams" not in (
            t.column_names
        ):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_grams": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                    "dup_ppm": pa.array([], pa.int64()),
                }
            )
        g = t["n_grams"].to_numpy(zero_copy_only=False)
        d = t["n_dup"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_grams": t["n_grams"],
                "n_dup": t["n_dup"],
                "dup_ppm": pa.array(d * 1_000_000 // g, pa.int64()),
            }
        )

    return per_doc.map_batches(finish, batch_format="pyarrow")


def dup_gram_coverage_oracle_sql(n: int = 7) -> str:
    return f"""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id,
                   array_to_string(w[i:i+{n - 1}], ' ') AS g
            FROM toks,
                 unnest(generate_series(1, greatest(len(w) - {n - 1}, 0)))
                 AS t(i)
        ),
        df AS (SELECT g, COUNT(*) AS c FROM grams GROUP BY g)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup,
               CAST(SUM(CASE WHEN df.c >= 2 THEN 1 ELSE 0 END)
                    * 1000000 // COUNT(*) AS BIGINT) AS dup_ppm
        FROM grams JOIN df USING (g)
        GROUP BY doc_id
    """


def minhash_lsh_eval(docs_ds, threshold: float = 0.6,
                     num_hashes: int = 64, bands: int = 16,
                     num_partitions: int | None = None):
    """LSH quality report, fully SQL-certified: one row with the exact
    near-dup pair count (n-gram Jaccard >= ``threshold``), the LSH
    band-candidate count, their intersection, and integer-ppm
    recall/precision — the evaluation that decides a (bands x rows)
    configuration before a web-scale run. Now that the signature
    arithmetic has a bit-identical SQL twin, the BANDING stage itself
    is oracle-checked here (previously pytest-only).

    Scale shape: both pair generators keep their own partitioned
    shapes; the intersection is one cogroup join on the (doc_a, doc_b)
    pair key (pair tables are duplicate-fraction-sized, not
    corpus-sized); the report is three distributed counts + driver ppm
    division on a 1-row result. The hot-bucket cap is NOT applied here
    (fixture buckets max out at 4 members; at scale pass the capped
    candidates and mirror the cap in the twin with a windowed count).
    """
    from autoner_ray.stages.joins import cogroup_join

    true_pairs = ngram_jaccard_exact_pairs(
        docs_ds, threshold=threshold, num_partitions=num_partitions
    ).materialize()
    cands = minhash_lsh_candidates(
        docs_ds, num_hashes=num_hashes, bands=bands,
        max_bucket=None, num_partitions=num_partitions,
    ).materialize()

    def keyed(extra=None):
        def fn(t: pa.Table) -> pa.Table:
            fields = [("doc_a", pa.int64()), ("doc_b", pa.int64())]
            if extra:
                fields.append((extra, pa.int64()))
            if t.num_columns == 0 or len(t) == 0:
                return pa.schema(fields).empty_table()
            out = {
                "doc_a": pc.cast(t["doc_a"], pa.int64()),
                "doc_b": pc.cast(t["doc_b"], pa.int64()),
            }
            if extra:
                out[extra] = pc.cast(t[extra], pa.int64())
            return pa.table(out)
        return fn

    import pyarrow.compute as pc

    hits = cogroup_join(
        true_pairs.map_batches(keyed(), batch_format="pyarrow"),
        cands.map_batches(keyed("n_bands"), batch_format="pyarrow"),
        on=("doc_a", "doc_b"),
        num_partitions=num_partitions or 8,
    )
    n_true = true_pairs.count()
    n_cand = cands.count()
    n_hit = hits.count()
    recall_ppm = (n_hit * 1_000_000) // n_true if n_true else 0
    precision_ppm = (n_hit * 1_000_000) // n_cand if n_cand else 0
    return pa.table(
        {
            "n_true_pairs": pa.array([n_true], pa.int64()),
            "n_candidates": pa.array([n_cand], pa.int64()),
            "n_hits": pa.array([n_hit], pa.int64()),
            "recall_ppm": pa.array([recall_ppm], pa.int64()),
            "precision_ppm": pa.array([precision_ppm], pa.int64()),
        }
    )


def minhash_lsh_eval_oracle_sql(threshold: float = 0.6,
                                num_hashes: int = 64,
                                bands: int = 16, k: int = 3) -> str:
    rpb = num_hashes // bands
    return f"""
        WITH {_minhash_sig_ctes(num_hashes, k)},
        bucket AS MATERIALIZED (
            SELECT doc_id, perm // {rpb} AS band,
                   list(sig ORDER BY perm) AS key
            FROM sig GROUP BY doc_id, perm // {rpb}
        ),
        cand AS MATERIALIZED (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bucket a JOIN bucket b
              ON a.band = b.band AND a.key = b.key
             AND a.doc_id < b.doc_id
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM sh a JOIN sh b
              ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        truth AS MATERIALIZED (
            SELECT doc_a, doc_b FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE)
                  >= {threshold}
        ),
        agg AS (
            SELECT (SELECT COUNT(*) FROM truth) AS n_true_pairs,
                   (SELECT COUNT(*) FROM cand) AS n_candidates,
                   (SELECT COUNT(*) FROM truth t JOIN cand c
                     ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
                       AS n_hits
        )
        SELECT CAST(n_true_pairs AS BIGINT) AS n_true_pairs,
               CAST(n_candidates AS BIGINT) AS n_candidates,
               CAST(n_hits AS BIGINT) AS n_hits,
               CAST(CASE WHEN n_true_pairs = 0 THEN 0
                    ELSE n_hits * 1000000 // n_true_pairs END AS BIGINT)
                   AS recall_ppm,
               CAST(CASE WHEN n_candidates = 0 THEN 0
                    ELSE n_hits * 1000000 // n_candidates END AS BIGINT)
                   AS precision_ppm
        FROM agg
    """


# -- cross-document chunk ("paragraph") dedup with reassembly ----------------


def _chunk_rows(batch: pa.Table, w: int) -> pa.Table:
    """Explode documents into W-word chunks: (doc_id, cidx, ctext, h,
    n_chunks). ``n_chunks`` (total per doc) rides on every chunk row so
    the reassembly side never needs a second pass over the corpus.
    Splitting is ``str.split(' ')`` — the exact image of DuckDB
    ``string_split(text, ' ')`` including empty tokens on runs of
    spaces — so the oracle reproduces chunk boundaries bit-for-bit."""
    doc_ids, cidxs, ctexts, totals = [], [], [], []
    for d, t in zip(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    ):
        words = (t or "").split(" ")
        n = (len(words) + w - 1) // w
        for c in range(n):
            doc_ids.append(d)
            cidxs.append(c)
            ctexts.append(" ".join(words[c * w : (c + 1) * w]))
            totals.append(n)
    hs = [hashlib.md5(s.encode()).hexdigest() for s in ctexts]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "cidx": pa.array(cidxs, pa.int64()),
            "ctext": pa.array(ctexts, pa.string()),
            "h": pa.array(hs, pa.string()),
            "n_chunks": pa.array(totals, pa.int64()),
        }
    )


def paragraph_dedup(docs_ds, words_per_chunk: int = 16,
                    num_partitions: int | None = None):
    """Cross-document chunk-level exact dedup with in-order reassembly
    (the RefinedWeb / MassiveText "repeated passage removal" shape —
    Penedo et al. 2023 do it on lines; the fixture corpus is single-line
    so the unit here is a fixed W-word chunk).

    Semantics: every W-word chunk keeps only its globally FIRST
    occurrence (min ``(doc_id, cidx)`` lexicographically); every later
    occurrence — in another doc or later in the same doc — is dropped,
    and each surviving doc is re-emitted as its kept chunks joined in
    original order. Docs whose every chunk is a repeat vanish entirely.

    Returns (doc_id, text, n_chunks, n_kept).

    Scale shape: two hash shuffles and nothing on the driver.
    (1) explode -> partition by md5(chunk) -> per-partition pandas
    first-wins (all rows of one hash land together); (2) partition the
    SURVIVING chunks by doc_id -> per-partition in-order string join.
    Chunk text crosses both shuffles once each; at 100 TB the dedup
    shuffle could instead move (h, doc_id, cidx) only and anti-join the
    loser keys back (the neardup_keep_one broadcast pattern) — chosen
    against here because the loser set is corpus-sized when dup rates
    are high, while this version's volume is bounded by the input."""
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions

    P = num_partitions or default_num_partitions()

    def add_hash_part(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return t
        part = [int(h[:15], 16) % P for h in t["h"].to_pylist()]
        return t.append_column("part", pa.array(part, pa.int32()))

    def first_wins(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "cidx": pd.Series(dtype="int64"),
                    "ctext": pd.Series(dtype="object"),
                    "n_chunks": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["h", "doc_id", "cidx"], kind="stable")
        keep = df.drop_duplicates("h", keep="first")
        return keep[["doc_id", "cidx", "ctext", "n_chunks"]]

    def add_doc_part(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return t
        z = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        z = z + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return t.append_column(
            "part", pa.array((z % np.uint64(P)).astype(np.int32))
        )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "text": pd.Series(dtype="object"),
                    "n_chunks": pd.Series(dtype="int64"),
                    "n_kept": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["doc_id", "cidx"], kind="stable")
        g = df.groupby("doc_id", sort=False)
        out = g.agg(
            text=("ctext", " ".join),
            n_chunks=("n_chunks", "first"),
            n_kept=("cidx", "size"),
        ).reset_index()
        return out[["doc_id", "text", "n_chunks", "n_kept"]]

    kept = (
        docs_ds.map_batches(
            lambda t: _chunk_rows(t, words_per_chunk),
            batch_format="pyarrow",
        )
        .map_batches(add_hash_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(first_wins, batch_format="pandas")
    )
    return (
        kept.map_batches(add_doc_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reassemble, batch_format="pandas")
    )


def paragraph_dedup_oracle_sql(words_per_chunk: int = 16) -> str:
    w = int(words_per_chunk)
    return f"""
        WITH words AS (
            SELECT doc_id,
                   string_split(text, ' ') AS ws
            FROM documents
        ),
        chunks AS (
            SELECT doc_id,
                   CAST(g.i AS BIGINT) AS cidx,
                   array_to_string(
                       ws[g.i * {w} + 1 : g.i * {w} + {w}], ' '
                   ) AS ctext
            FROM words,
                 UNNEST(range(0, CAST(ceil(len(ws) / {w}.0) AS BIGINT)))
                     AS g(i)
        ),
        hashed AS (
            SELECT doc_id, cidx, ctext, md5(ctext) AS h FROM chunks
        ),
        winners AS (
            SELECT doc_id, cidx, ctext FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY h ORDER BY doc_id, cidx
                ) AS rn
                FROM hashed
            ) WHERE rn = 1
        ),
        tot AS (
            SELECT doc_id, COUNT(*) AS n_chunks FROM hashed GROUP BY 1
        )
        SELECT wi.doc_id,
               string_agg(wi.ctext, ' ' ORDER BY wi.cidx) AS text,
               CAST(MAX(t.n_chunks) AS BIGINT) AS n_chunks,
               CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM winners wi JOIN tot t ON wi.doc_id = t.doc_id
        GROUP BY wi.doc_id
    """


def neardup_keep_best(
    docs_ds,
    threshold: float = 0.6,
    k: int = 3,
    num_partitions: int | None = None,
    driver_cc_max_pairs: int = 2_000_000,
    pair_source: str = "exact",
):
    """Near-duplicate removal keeping the HIGHEST-QUALITY member of
    each cluster instead of the smallest id — the winner rule
    production curation actually uses (RefinedWeb/SlimPajama keep the
    longest/highest-scoring copy so truncated or boilerplate-padded
    variants lose). Winner per cluster = max ``n_words``
    (whitespace-stream token count, the same count ``docs_quality``
    scores), ties broken by smallest ``doc_id`` so the choice is
    content-derived and execution-order-independent.

    Same tiered pair/cluster machinery as :func:`neardup_keep_one`
    (shared-shingle exact pairs or LSH candidates; driver union-find
    under ``driver_cc_max_pairs``, distributed min-label CC above).
    In the distributed tier the winner argmax never leaves the
    cluster-label space: member word counts cogroup-join onto the
    (duplicate-fraction-sized) label table, a label-partitioned
    max picks the winning count, and a second label-partitioned min
    breaks ties — both mergeable combines, no cluster table on the
    driver. Losers are broadcast once and the corpus anti-filters with
    vectorized ``is_in`` (the :func:`neardup_keep_one` contract).

    Returns a Dataset of surviving ``doc_id`` rows.
    """
    import ray

    import pyarrow.compute as pc

    from autoner_ray.stages.tokenize import sentence_token_stream

    if pair_source == "exact":
        pairs = ngram_jaccard_exact_pairs(
            docs_ds, threshold=threshold, k=k,
            num_partitions=num_partitions,
        ).materialize()
    elif pair_source == "lsh":
        pairs = ngram_jaccard_pairs(
            docs_ds, threshold=threshold
        ).materialize()
    else:
        raise ValueError(f"unknown pair_source: {pair_source!r}")

    _nw_schema = pa.schema([("src", pa.int64()), ("n_words", pa.int64())])

    def nwords_batch(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _nw_schema.empty_table()
        return pa.table(
            {
                "src": t["doc_id"],
                "n_words": pa.array(
                    [
                        len(sentence_token_stream(x or ""))
                        for x in t["text"].to_pylist()
                    ],
                    pa.int64(),
                ),
            },
            schema=_nw_schema,
        )

    if pairs.count() <= driver_cc_max_pairs:
        pdf = pairs.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        members = sorted(parent)
        if not members:
            loser_ids: list[int] = []
        else:
            member_arr = ray.put(pa.array(members, pa.int64()))

            class MemberWords:
                def __init__(self) -> None:
                    self.members = ray.get(member_arr)

                def __call__(self, t: pa.Table) -> pa.Table:
                    if t.num_columns == 0 or len(t) == 0:
                        return _nw_schema.empty_table()
                    hit = t.filter(
                        pc.is_in(t["doc_id"], value_set=self.members)
                    )
                    return nwords_batch(hit)

            import pandas as pd

            mw = docs_ds.map_batches(
                MemberWords, batch_format="pyarrow", concurrency=2
            ).to_pandas()
            mw["comp"] = [find(int(d)) for d in mw["src"]]
            mw = mw.sort_values(
                ["comp", "n_words", "src"],
                ascending=[True, False, True], kind="mergesort",
            )
            winners = set(
                mw.groupby("comp", sort=False)["src"].first()
            )
            loser_ids = [int(d) for d in mw["src"] if int(d) not in winners]
    else:
        from autoner_ray.stages.combine import partitioned_key_agg
        from autoner_ray.stages.graph import (
            connected_components_distributed,
        )
        from autoner_ray.stages.joins import cogroup_join

        _edge_schema = pa.schema([("subj", pa.int64()), ("obj", pa.int64())])

        def pairs_to_edges(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _edge_schema.empty_table()
            return pa.table({"subj": t["doc_a"], "obj": t["doc_b"]})

        labels = connected_components_distributed(
            pairs.map_batches(pairs_to_edges, batch_format="pyarrow"),
            num_partitions=num_partitions, as_dataset=True,
        )
        nwords = docs_ds.map_batches(nwords_batch, batch_format="pyarrow")
        # members: (src, label, n_words) — duplicate-fraction-sized
        members = cogroup_join(
            labels, nwords, on=("src",), num_partitions=num_partitions
        ).materialize()
        _ln_schema = pa.schema([("label", pa.int64()),
                                ("n_words", pa.int64())])

        def label_words(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _ln_schema.empty_table()
            return pa.table(
                {"label": t["label"], "n_words": t["n_words"]},
                schema=_ln_schema,
            )

        mx = partitioned_key_agg(
            members.map_batches(label_words, batch_format="pyarrow"),
            keys=["label"], aggs=[("n_words", "max")],
            part_on=("label",), num_partitions=num_partitions,
        )
        _mx_schema = pa.schema([("label", pa.int64()),
                                ("max_nw", pa.int64())])

        def as_max(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _mx_schema.empty_table()
            return pa.table(
                {"label": t["label"], "max_nw": t["n_words"]},
                schema=_mx_schema,
            )

        _cand_schema = pa.schema([("label", pa.int64()),
                                  ("src", pa.int64())])

        def cands_batch(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _cand_schema.empty_table()
            keep = pc.equal(t["n_words"], t["max_nw"])
            return pa.table(
                {
                    "label": t["label"].filter(keep),
                    "src": t["src"].filter(keep),
                },
                schema=_cand_schema,
            )

        cands = cogroup_join(
            members, mx.map_batches(as_max, batch_format="pyarrow"),
            on=("label",), num_partitions=num_partitions,
        ).map_batches(cands_batch, batch_format="pyarrow")
        winners = partitioned_key_agg(
            cands, keys=["label"], aggs=[("src", "min")],
            part_on=("label",), num_partitions=num_partitions,
        )
        _win_schema = pa.schema([("label", pa.int64()),
                                 ("win", pa.int64())])

        def as_win(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _win_schema.empty_table()
            return pa.table(
                {"label": t["label"], "win": t["src"]},
                schema=_win_schema,
            )

        _loser_schema = pa.schema([("doc_id", pa.int64())])

        def losers_batch(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _loser_schema.empty_table()
            keep = pc.invert(pc.equal(t["src"], t["win"]))
            return pa.table({"doc_id": t["src"].filter(keep)})

        loser_ids = (
            cogroup_join(
                members.select_columns(["src", "label"]),
                winners.map_batches(as_win, batch_format="pyarrow"),
                on=("label",), num_partitions=num_partitions,
            )
            .map_batches(losers_batch, batch_format="pyarrow")
            .to_pandas()["doc_id"]
        )
    losers_ref = ray.put(pa.array(loser_ids, pa.int64()))

    class SurvivorFilter:
        def __init__(self) -> None:
            self.losers = ray.get(losers_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t["doc_id"], value_set=self.losers))
            return pa.table({"doc_id": t["doc_id"].filter(mask)})

    return docs_ds.select_columns(["doc_id"]).map_batches(
        SurvivorFilter, batch_format="pyarrow", concurrency=2
    )


def substring_dedup_census(docs_ds, chunk_len: int = 40,
                           num_partitions: int | None = None):
    """EXACT chunked substring dedup census — the Lee-et-al-2022
    ("Deduplicating Training Data Makes Language Models Better")
    semantics at chunk granularity: split every doc into non-overlapping
    ``chunk_len``-char chunks (full chunks only), and corpus-wide the
    FIRST occurrence of each distinct chunk wins (smallest
    ``(doc_id, chunk_idx)``); every other occurrence is a duplicated
    span a cleaner would strip. Output one row per doc that has at
    least one full chunk: (doc_id, n_chunks, n_removed, chars_before,
    chars_after) with ``chars_after = chars_before - chunk_len *
    n_removed`` — the integer census the value-hash can certify.

    Scale shape: chunk rows carry a PACKED occurrence key
    ``doc_id * 2^20 + idx`` (idx < 2^20 = 40 MB docs at the default
    chunk_len; at web scale bump the shift); ONE hash shuffle on the
    chunk content co-locates all occurrences of a chunk, the
    per-partition pandas pass marks losers (packed key != group min)
    and pre-reduces to per-doc partials, and the per-doc rollup is the
    hash-partitioned :func:`combine.partitioned_key_agg` — no
    driver-side state anywhere, no chunk ever compared across
    partitions (equal chunks hash equal). The suffix-array full
    generality (duplicated spans at ARBITRARY offsets) trades recall
    for this operator's exactness-at-chunk-alignment; winnowing
    fingerprints (``analysis``) cover the unaligned case
    approximately.
    """
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.combine import partitioned_key_agg
    from autoner_ray.stages.joins import _stable_part_col

    P = num_partitions or default_num_partitions()
    _c_schema = pa.schema(
        [("chunk", pa.string()), ("packed", pa.int64()),
         ("doc_id", pa.int64()), ("chars", pa.int64()),
         ("part", pa.int32())]
    )

    def chunk_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _c_schema.empty_table()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        texts = t["text"].to_pylist()
        c_chunk, c_packed, c_doc, c_chars = [], [], [], []
        for did, text in zip(ids, texts):
            text = text or ""
            n_full = len(text) // chunk_len
            base = int(did) << 20
            for i in range(n_full):
                c_chunk.append(text[i * chunk_len:(i + 1) * chunk_len])
                c_packed.append(base + i)
                c_doc.append(int(did))
                c_chars.append(len(text))
        out = pa.table(
            {
                "chunk": pa.array(c_chunk, pa.string()),
                "packed": pa.array(c_packed, pa.int64()),
                "doc_id": pa.array(c_doc, pa.int64()),
                "chars": pa.array(c_chars, pa.int64()),
            }
        )
        return out.append_column(
            "part", _stable_part_col(out, ("chunk",), P)
        )

    def mark_losers(df: pd.DataFrame) -> pd.DataFrame:
        # all occurrences of a chunk are in this partition; loser =
        # packed key above the group min. Pre-reduce straight to
        # per-doc partials so the shuffle out is doc-sized, not
        # chunk-sized.
        wk = df.groupby("chunk")["packed"].transform("min")
        removed = (df["packed"] != wk).astype("int64")
        g = pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_chunks": 1,
                "n_removed": removed,
                "chars_before": df["chars"],
            }
        ).groupby("doc_id", as_index=False).agg(
            n_chunks=("n_chunks", "sum"),
            n_removed=("n_removed", "sum"),
            chars_before=("chars_before", "max"),
        )
        return g

    partials = (
        docs_ds.map_batches(chunk_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(mark_losers, batch_format="pandas")
    )
    rolled = partitioned_key_agg(
        partials,
        keys=["doc_id"],
        aggs=[("n_chunks", "sum"), ("n_removed", "sum"),
              ("chars_before", "max")],
        part_on=("doc_id",),
        num_partitions=P,
    )

    _o_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_chunks", pa.int64()),
         ("n_removed", pa.int64()), ("chars_before", pa.int64()),
         ("chars_after", pa.int64())]
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_columns == 0 or len(t) == 0:
            return _o_schema.empty_table()
        after = pc.subtract(
            t["chars_before"],
            pc.multiply(t["n_removed"], pa.scalar(chunk_len, pa.int64())),
        )
        return pa.table(
            {
                "doc_id": pc.cast(t["doc_id"], pa.int64()),
                "n_chunks": pc.cast(t["n_chunks"], pa.int64()),
                "n_removed": pc.cast(t["n_removed"], pa.int64()),
                "chars_before": pc.cast(t["chars_before"], pa.int64()),
                "chars_after": pc.cast(after, pa.int64()),
            },
            schema=_o_schema,
        )

    return rolled.map_batches(finish, batch_format="pyarrow")
