"""Sparse-key-safe distributed hash join (co-group shape).

``ray.data.Dataset.join`` (Ray 2.49) crashes whenever a hash partition
receives ZERO blocks from one side: the aggregator's block builder then
produces a no-column empty table and the in-partition acero join raises
``ArrowInvalid: no match for key field``. Dense workloads never hit it;
sparse-key workloads (LSH candidate pairs, capped buckets, small
fixtures) hit it constantly.

:func:`cogroup_join` keeps the same physical shape — ONE hash shuffle on
the key, vectorized acero join per partition — but routes through
``groupby(part).map_groups`` with explicitly-constructed schemas, so an
empty side inside a partition is an empty table WITH columns, never a
schema-less one. Partition id is a content hash (md5) of the key
columns: stable across runs and cluster layouts.

Cost vs Dataset.join: identical shuffle volume; P python group calls
(P = num_partitions, not per-key); both sides' columns travel in one
unioned stream with nulls for the other side's fields.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

_SIDE = "__cg_side"
_PART = "__cg_part"


def _stable_part_col(t: pa.Table, on: tuple[str, ...], P: int) -> pa.Array:
    """Deterministic partition id per key row. Any function works as
    long as BOTH join sides compute it identically — so the branch is on
    the SCHEMA TYPE only, never on per-batch properties like null_count
    (a nullable int key split across batches must land on the same
    partition function everywhere). Single integer keys take a fully
    vectorized splitmix64 with nulls mapped to a fixed sentinel (a null
    key never matches in an inner join, so its partition only needs to
    be deterministic); single string keys take the memoized md5 path
    with the same ``str(None)`` image as the multi-key fallback;
    multi-column keys take the md5 fallback loop."""
    import numpy as np

    if len(on) == 1:
        col = t[on[0]]
        if pa.types.is_integer(col.type):
            if col.null_count:
                # fixed sentinel: deterministic, type-stable, and
                # collision with a real key only co-locates rows
                col = col.fill_null(-(1 << 62) + 0x5EED)
            z = col.to_numpy(zero_copy_only=False).astype(np.uint64)
            z = z + np.uint64(0x9E3779B97F4A7C15)
            z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            z = z ^ (z >> np.uint64(31))
            return pa.array((z % np.uint64(P)).astype(np.int32))
        if pa.types.is_string(col.type) or pa.types.is_large_string(
            col.type
        ):
            # same value as the md5 fallback below for a single string
            # key (md5(str(v)) == md5(v); nulls hash as str(None)), but
            # memoized per worker — Zipfian key streams (words,
            # entities) mostly hit the cache
            from autoner_ray.functions.hashing import md5_64_array

            vals = col.to_pylist()
            if col.null_count:
                vals = ["None" if v is None else v for v in vals]
            hs = md5_64_array(vals)
            return pa.array((hs % np.uint64(P)).astype(np.int32))
    keys = [t[c].to_pylist() for c in on]
    parts = [
        int.from_bytes(
            hashlib.md5(
                "\x1f".join(str(v) for v in row).encode()
            ).digest()[:8],
            "big",
        )
        % P
        for row in zip(*keys)
    ]
    return pa.array(parts, pa.int32())


def cogroup_join(left, right, on: tuple[str, ...],
                 num_partitions: int | None = None,
                 join_type: str = "inner"):
    """Join of two Datasets on ``on`` (shared column names), safe
    for sparse/empty key distributions. Non-key column names must be
    disjoint between the two sides. ``join_type`` is ``"inner"``
    (default) or ``"left outer"`` — left-outer preserves unmatched
    LEFT rows with null right columns (both sides still hash-partition
    on the key; a partition whose right side is empty emits the left
    rows null-padded)."""
    from autoner_ray.cluster import default_num_partitions

    if num_partitions is None:
        num_partitions = default_num_partitions()
    lschema = left.schema()  # ray.data Schema: .names + .types (pa types)
    rschema = right.schema()
    ltypes_all = dict(zip(lschema.names, lschema.types))
    rtypes_all = dict(zip(rschema.names, rschema.types))
    lcols = [n for n in lschema.names if n not in on]
    rcols = [n for n in rschema.names if n not in on]
    overlap = set(lcols) & set(rcols)
    assert not overlap, f"non-key columns collide: {overlap}"
    key_types = {c: ltypes_all[c] for c in on}
    ltypes = {c: ltypes_all[c] for c in lcols}
    rtypes = {c: rtypes_all[c] for c in rcols}
    out_fields = (
        [(c, key_types[c]) for c in on]
        + [(c, ltypes[c]) for c in lcols]
        + [(c, rtypes[c]) for c in rcols]
    )
    out_schema = pa.schema(out_fields)

    def tag(side: int, own_cols, own_types, other_cols, other_types):
        def fn(t: pa.Table) -> pa.Table:
            n = len(t)
            cols: dict[str, object] = {}
            for c in on:
                cols[c] = t[c]
            for c in own_cols:
                cols[c] = t[c]
            for c in other_cols:
                cols[c] = pa.nulls(n, other_types[c])
            cols[_SIDE] = pa.array([side] * n, pa.int8())
            cols[_PART] = _stable_part_col(t, on, num_partitions)
            return pa.table(cols)

        return fn

    tagged = left.map_batches(
        tag(0, lcols, ltypes, rcols, rtypes), batch_format="pyarrow"
    ).union(
        right.map_batches(
            tag(1, rcols, rtypes, lcols, ltypes), batch_format="pyarrow"
        )
    )

    lt_schema = pa.schema(
        [(c, key_types[c]) for c in on] + [(c, ltypes[c]) for c in lcols]
    )
    rt_schema = pa.schema(
        [(c, key_types[c]) for c in on] + [(c, rtypes[c]) for c in rcols]
    )

    def join_partition(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(t[_SIDE], 0)
        lt = t.filter(lmask).select(list(on) + lcols)
        rt = t.filter(pc.invert(lmask)).select(list(on) + rcols)
        if len(lt) == 0 or (len(rt) == 0 and join_type == "inner"):
            return out_schema.empty_table()
        # cast back to the declared schema: the null-padded union can
        # round-trip through PANDAS blocks inside the shuffle, where an
        # all-null-bearing int64 column silently becomes float64
        lt = lt.cast(lt_schema)
        rt = rt.cast(rt_schema)
        return lt.join(rt, keys=list(on), join_type=join_type).select(
            out_schema.names
        ).cast(out_schema)

    return tagged.groupby(_PART).map_groups(
        join_partition, batch_format="pyarrow"
    )
