"""Entity canonicalization (north rule J5): mention surfaces → entity ids.

Semantics (deterministic, order-independent):
- key      = ``normalize_surface(surface)`` (lower/strip/space-collapse,
  ``functions/text.py:134``) — the groupby key.
- canonical surface of an entity = its MOST FREQUENT raw surface form,
  ties broken lexicographically (smallest) so the result never depends
  on block layout.
- ``entity_id`` = dense int64 rank of entities ordered by
  (total mentions desc, key asc) — id 0 is the most-mentioned entity.

Scale design (SURVEY.md §2.4 J5 / §4 skew):
- Counting (canon, surface) pairs is ASSOCIATIVE, so a per-batch
  combiner (``map_batches`` Counter) runs first and the groupby shuffle
  moves one row per distinct (canon, surface) per block — Zipfian head
  entities ship partial counts, not raw mentions.
- The non-associative "pick canonical surface" step uses SALTED
  two-phase selection: phase 1 groups by ``(key, salt)`` (salt = hash of
  the surface, bounded) and picks a local winner, phase 2 groups the ≤S
  local winners per key and picks the global winner. A head entity with
  10^9 mentions never concentrates in a single reducer.
- Linking mentions back to ids is a BROADCAST join: the entity dim table
  is ``ray.put`` once and each map task resolves ids locally — no second
  shuffle of the big mention stream.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

from autoner_ray.functions.text import normalize_surface

DEFAULT_NUM_SALTS = 16


def surface_pair_partials(mentions_batch: pa.Table) -> pa.Table:
    """Combiner: mention rows -> partial (key, surface, n) counts."""
    counter: Counter[tuple[str, str]] = Counter()
    for surface in mentions_batch["surface"].to_pylist():
        counter[(normalize_surface(surface), surface)] += 1
    keys = [k for k, _ in counter]
    surfaces = [s for _, s in counter]
    return pa.table(
        {
            "key": pa.array(keys, pa.string()),
            "surface": pa.array(surfaces, pa.string()),
            "n": pa.array(list(counter.values()), pa.int64()),
        }
    )


def _add_salt(batch: pa.Table, num_salts: int) -> pa.Table:
    import zlib

    # stable salt from the surface bytes (NOT the key: all rows of one
    # key+surface must meet to finish the count; different surfaces of a
    # hot key spread across salts)
    salts = [
        zlib.crc32(s.encode()) % num_salts
        for s in batch["surface"].to_pylist()
    ]
    return batch.append_column("salt", pa.array(salts, pa.int32()))


def _pick_winner(df):
    """Winner surface within a group: max n, then smallest surface."""
    import pandas as pd

    df = df.sort_values(["n", "surface"], ascending=[False, True],
                        kind="mergesort")
    total = int(df["n"].sum())
    top = df.iloc[0]
    return pd.DataFrame(
        {
            "key": [top["key"]],
            "surface": [top["surface"]],
            "n": [int(top["n"])],
            "total": [total],
        }
    )


def canonical_entities(mentions_ds, num_salts: int = DEFAULT_NUM_SALTS):
    """Entity dim table: key, canonical_surface, n_mentions, entity_id.

    Returns a ray Dataset sorted by (n_mentions desc, key) with dense ids.
    """
    from ray.data.aggregate import Sum

    # phase 0: combiner + exact pair counts (associative groupby)
    pair_counts = (
        mentions_ds.map_batches(surface_pair_partials, batch_format="pyarrow")
        .groupby(["key", "surface"])
        .aggregate(Sum("n", alias_name="n"))
    )
    # phase 1: salted local winners
    local = (
        pair_counts.map_batches(
            lambda b: _add_salt(b, num_salts), batch_format="pyarrow"
        )
        .groupby(["key", "salt"])
        .map_groups(_pick_winner, batch_format="pandas")
    )
    # phase 2: global winner per key (≤ num_salts rows per key)
    def merge_winners(df):
        import pandas as pd

        total = int(df["total"].sum())
        df = df.sort_values(["n", "surface"], ascending=[False, True],
                            kind="mergesort")
        top = df.iloc[0]
        return pd.DataFrame(
            {
                "key": [top["key"]],
                "canonical_surface": [top["surface"]],
                "n_mentions": [total],
            }
        )

    return local.groupby("key").map_groups(merge_winners, batch_format="pandas")


def entity_id_table(entities_ds) -> pa.Table:
    """Dense ids by (n_mentions desc, key asc). Entity vocab is small
    relative to the corpus (dictionary-bounded), so this materializes —
    it is the broadcast side of the link join."""
    t = pa.Table.from_pandas(
        entities_ds.to_pandas(), preserve_index=False
    )
    import pyarrow.compute as pc

    order = pc.sort_indices(
        t,
        sort_keys=[("n_mentions", "descending"), ("key", "ascending")],
    )
    t = t.take(order)
    return t.append_column(
        "entity_id", pa.array(range(t.num_rows), pa.int64())
    )


class LinkMentions:
    """Broadcast-join actor: resolve mention surface -> entity_id."""

    def __init__(self, id_table_ref) -> None:
        import ray

        t = (
            ray.get(id_table_ref)
            if isinstance(id_table_ref, ray.ObjectRef)
            else id_table_ref
        )
        self.ids = dict(
            zip(t["key"].to_pylist(), t["entity_id"].to_pylist())
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = [
            self.ids.get(normalize_surface(s), -1)
            for s in batch["surface"].to_pylist()
        ]
        return batch.append_column("entity_id", pa.array(ids, pa.int64()))


def link_mentions(mentions_ds, entities_ds, concurrency: int = 2):
    """mentions + entity_id via broadcast of the entity dim table."""
    import ray

    ref = ray.put(entity_id_table(entities_ds))
    return mentions_ds.map_batches(
        LinkMentions,
        fn_constructor_kwargs={"id_table_ref": ref},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
