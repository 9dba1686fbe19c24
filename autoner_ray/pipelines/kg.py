"""Flagship KG-construction pipeline (north rule end-to-end).

    read pages -> extract_text -> tokenize (sentence rows)
      -> DictMatcher task pool w/ per-worker trie cache (trie + segmentDP)
      -> pair partial counts -> groupby edge aggregate
      -> [optional] sorted adjacency graph shards

Lifecycle mirrors SURVEY.md §3.4. Everything before the edge groupby is
an embarrassingly parallel stream; the groupby is the only all-to-all
exchange and it runs over per-batch pre-aggregated partials.

Also provides the unigram-dictionary variant whose semantics are exactly
expressible in ANSI SQL — that variant backs the driver's DuckDB
correctness gate, while the full trie/DP variant is pinned by pytest
oracle + reference-binary golden tests.
"""

from __future__ import annotations

import pyarrow as pa

from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS, UNIGRAM_DICT
from autoner_ray.sources.pages import read_pages
from autoner_ray.stages.dict_match import DictMatcher
from autoner_ray.stages.extract import extract_text_batch
from autoner_ray.stages.tokenize import (
    sentence_token_stream,
    tokenize_pages_batch,
)
from autoner_ray.stages.triples import (
    PRED_COOCCUR,
    aggregate_edges,
    pair_counts_batch,
)

DEFAULT_BATCH_SIZE = 2048


def _match_concurrency(reserve: int = 1):
    """Fixed actor-pool size: cluster CPUs minus ``reserve``.

    Kept for callers that still need a FIXED ACTOR pool (state too big
    for one-copy-per-worker, e.g. a multi-GB KB trie at narrow width).
    The default match stages now run as TASK pools with per-worker state
    caches (``dict_match_fn`` / ``cached_stage_fn``) — no per-run pool
    spawn, no fixed-pool CPU-budget deadlock: if the fixed pools of a
    topology together claim every CPU, a downstream pool can never
    start, backpressure pins the upstream operator open, and the
    pipeline deadlocks; that budgeting discipline only applies when you
    opt back into fixed actor pools. Scales with whatever session the
    driver opened — same code on 8 CPUs or a 256-node cluster.
    """
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            return max(2, cpus - reserve)
    except Exception:
        pass
    return 4


def _default_parallelism(repeat: int):
    """Block count for replicated-input runs: ~2 blocks per cluster CPU.

    Benchmarked sweet spot (16 CPUs, 640k docs): 2 blocks/CPU beats both
    1/CPU (stragglers on the fixed pool) and 4/CPU (per-task overhead +
    driver scheduling load). Single-pass runs (repeat=1) keep file-driven
    parallelism — at 100 TB the file count dwarfs the cluster.
    """
    if repeat <= 1:
        return None
    try:
        import ray

        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
            # at least 2 blocks/CPU for width, and at least one block per
            # input copy so per-task work stays ~1-2 s — coarse blocks at
            # high repeat leave the fixed pool with 2-wave straggler tails
            return max(2 * max(4, cpus), repeat)
    except Exception:
        pass
    return None


def pages_dataset(sf_dir: str, repeat: int = 1):
    return read_pages(
        sf_dir, parallelism=_default_parallelism(repeat), repeat=repeat
    )


def extracted_pages(sf_dir: str, repeat: int = 1):
    return pages_dataset(sf_dir, repeat=repeat).map_batches(
        extract_text_batch, batch_format="pyarrow"
    )


def sentences_dataset(sf_dir: str, repeat: int = 1):
    return extracted_pages(sf_dir, repeat=repeat).map_batches(
        tokenize_pages_batch, batch_format="pyarrow"
    )


def matched_sentences(
    sf_dir: str,
    concurrency=None,
    output: str = "sentences",
    repeat: int = 1,
):
    """Dictionary match over sentence rows — TASK pool with a per-worker
    trie cache (``dict_match_fn``): the trie builds once per worker for
    the whole session, so back-to-back pipelines over the same
    dictionaries carry no per-run pool-spawn or rebuild cost. Pass
    ``concurrency`` to cap concurrent tasks (tests); None = let the
    scheduler use every free CPU."""
    from autoner_ray.stages.dict_match import dict_match_fn

    return sentences_dataset(sf_dir, repeat=repeat).map_batches(
        dict_match_fn(
            CORE_DICT, FULL_DICT, STOPWORDS, output=output
        ),
        batch_format="pyarrow",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


def triples_dataset(sf_dir: str, concurrency=None, repeat: int = 1):
    """Full-pipeline edges: (subj, pred, obj, weight).

    The sentence->pair combiner runs inside the DictMatcher actor
    (``output="pairs"``) so the pool emits pre-aggregated edge partials
    directly — the only remaining task work is the read and the final
    small groupby.
    """
    pairs = matched_sentences(
        sf_dir, concurrency, output="pairs", repeat=repeat
    )
    return aggregate_edges(pairs)


def graph_shards(sf_dir: str, out_dir: str, num_parts: int = 16):
    from autoner_ray.stages.graph import materialize_graph

    return materialize_graph(triples_dataset(sf_dir), out_dir, num_parts)


# ---------------------------------------------------------------------------
# Unigram-dictionary variant (SQL-checkable; DuckDB oracle in __ray_entry__)
# ---------------------------------------------------------------------------

def _unigram_entities_batch(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, entities list) via the unigram dictionary.

    Matches the SQL ``unnest(string_split(text,' ')) JOIN dict`` semantics:
    the token stream for this corpus (words + single spaces) is identical
    under the real tokenizer and the SQL split.
    """
    ents_col = []
    for text in batch["text"].to_pylist():
        toks = sentence_token_stream(text or "")
        ents = {UNIGRAM_DICT[t][0] for t in toks if t in UNIGRAM_DICT}
        ents_col.append(sorted(ents))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "entities": pa.array(ents_col, pa.list_(pa.string())),
        }
    )


def unigram_doc_entities(sf_dir: str):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(_unigram_entities_batch, batch_format="pyarrow")


def unigram_mention_type_counts(sf_dir: str):
    """Per-type count of matched (doc, entity) pairs — SQL-checkable.

    Type cardinality is bounded by the dictionary, so the tail is a
    shuffle-free ``bounded_key_sum`` (two-level streaming combine)
    rather than a sort-shuffle groupby over a ≤|types|-row stream.
    """
    from collections import Counter

    from autoner_ray.stages.combine import bounded_key_sum

    type_of = {e: t for e, t in UNIGRAM_DICT.values()}

    def explode(batch: pa.Table) -> pa.Table:
        counter: Counter[str] = Counter()
        for ents in batch["entities"].to_pylist():
            for e in ents:
                counter[type_of[e]] += 1
        return pa.table(
            {
                "type": pa.array(list(counter.keys()), pa.string()),
                "mentions": pa.array(list(counter.values()), pa.int64()),
            }
        )

    partials = unigram_doc_entities(sf_dir).map_batches(
        explode, batch_format="pyarrow"
    )
    return bounded_key_sum(partials, ["type"], ["mentions"])


def unigram_triples(sf_dir: str):
    """Doc-scoped co-occurrence edges over the unigram dictionary."""
    pairs = unigram_doc_entities(sf_dir).map_batches(
        pair_counts_batch, batch_format="pyarrow"
    )
    return aggregate_edges(pairs)


def unigram_canonical_entities(sf_dir: str):
    """SQL-checkable canonicalization: case-insensitive unigram mentions
    -> canonical surface + dense entity ids (stages/canonicalize.py)."""
    import ray.data as rd

    from autoner_ray.stages.canonicalize import (
        canonical_entities,
        entity_id_table,
    )

    dict_keys = set(UNIGRAM_DICT)

    def surfaces(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            for tok in sentence_token_stream(text or ""):
                if tok.lower() in dict_keys:
                    out.append(tok)
        return pa.table({"surface": pa.array(out, pa.string())})

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).map_batches(surfaces, batch_format="pyarrow")
    return entity_id_table(canonical_entities(ds))


def kg_mentions_linked(sf_dir: str, concurrency=None, link_concurrency=2):
    """Full-trie mentions + dense entity ids via the broadcast link join."""
    from autoner_ray.stages.canonicalize import (
        canonical_entities,
        link_mentions,
    )

    # matcher is a task pool now (dict_match_fn) — it yields CPUs to the
    # fixed link actor pool naturally, so no width budgeting is needed.
    # (LinkMentions stays an actor pool: its broadcast table is computed
    # per run, so a per-worker cache would just accumulate stale state.)
    mentions = matched_sentences(sf_dir, concurrency, output="mentions")
    return link_mentions(
        mentions, canonical_entities(mentions), concurrency=link_concurrency
    )


def unigram_entity_doc_freq(sf_dir: str):
    from ray.data.aggregate import Sum
    from collections import Counter

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
        unigram_doc_entities(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("entity")
        .aggregate(Sum("n", alias_name="doc_freq"))
    )


def unigram_edge_pmi(sf_dir: str):
    """Edge scoring beyond counts: doc-level PMI per co-occurring entity
    pair — ``ln(c_ab * N / (c_a * c_b))`` over document frequencies.

    Distributed shape: the ENTITY doc-freq table is vocab-bounded (~10^6
    at web scale) so it is collected once and broadcast via ``ray.put``;
    the EDGE table (up to vocab² — ~10^9 rows at web scale) stays a
    Dataset and the PMI arithmetic streams through ``map_batches``.
    SQL twin in ``oracle_sql`` (same expression tree, 6-dp round)."""
    import numpy as np
    import ray

    n_docs = int(
        __import__("pyarrow.parquet", fromlist=["read_metadata"])
        .read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )
    freqs = {
        r["entity"]: int(r["doc_freq"])
        for r in unigram_entity_doc_freq(sf_dir).take_all()
    }
    freq_ref = ray.put(freqs)

    def score(batch: pa.Table) -> pa.Table:
        # vectorized gather + log over the (vocab²-sized) edge table:
        # pandas map against the broadcast doc-freq dict, numpy log,
        # np.round(…, 6) — half-even like the oracle's ROUND(x, 6);
        # the driver value-hash pins equality (brand_revenue pattern).
        import pandas as pd

        df = ray.get(freq_ref)
        dfs = pd.Series(batch["subj"].to_pylist()).map(df).to_numpy(
            np.float64
        )
        dfo = pd.Series(batch["obj"].to_pylist()).map(df).to_numpy(
            np.float64
        )
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        pmi = np.round(np.log(w * n_docs / (dfs * dfo)), 6)
        return pa.table(
            {
                "subj": batch["subj"],
                "obj": batch["obj"],
                "weight": batch["weight"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return unigram_triples(sf_dir).map_batches(
        score, batch_format="pyarrow"
    )


def unigram_entity_jaccard(sf_dir: str):
    """Entity-pair document-set Jaccard: ``|docs(a) & docs(b)| /
    |docs(a) | docs(b)|`` for every co-occurring pair — the
    set-overlap sibling of PMI (entity-resolution / relatedness
    signal). Intersection IS the aggregated edge weight (doc-scoped
    co-occurrence count) and the union derives from the broadcast
    doc-freq table, so the whole score is one streaming map over the
    edge table — same broadcast shape as ``unigram_edge_pmi``; exact
    integer intersection/union columns plus a 6-dp ratio."""
    import numpy as np
    import ray

    freqs = {
        r["entity"]: int(r["doc_freq"])
        for r in unigram_entity_doc_freq(sf_dir).take_all()
    }
    freq_ref = ray.put(freqs)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = ray.get(freq_ref)
        dfs = pd.Series(batch["subj"].to_pylist()).map(df).to_numpy(
            np.int64
        )
        dfo = pd.Series(batch["obj"].to_pylist()).map(df).to_numpy(
            np.int64
        )
        w = batch["weight"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        union = dfs + dfo - w
        jac = np.round(
            w.astype(np.float64) / union.astype(np.float64), 6
        )
        return pa.table(
            {
                "subj": batch["subj"],
                "obj": batch["obj"],
                "co_docs": pa.array(w, pa.int64()),
                "union_docs": pa.array(union, pa.int64()),
                "jaccard": pa.array(jac, pa.float64()),
            }
        )

    return unigram_triples(sf_dir).map_batches(
        score, batch_format="pyarrow"
    )


def unigram_assoc_rules(sf_dir: str):
    """Association-rule scores per DIRECTED co-occurring entity pair:
    confidence(a=>b) = co_docs/df(a) and lift = N*co_docs/(df(a)*df(b))
    — the market-basket mining face of edge scoring (PMI's ratio
    without the log, plus the directional conditional). Same broadcast
    doc-freq + streaming edge map as ``unigram_edge_pmi``; each
    undirected edge emits both directions."""
    import numpy as np
    import ray

    n_docs = int(
        __import__("pyarrow.parquet", fromlist=["read_metadata"])
        .read_metadata(f"{sf_dir}/documents.parquet").num_rows
    )
    freqs = {
        r["entity"]: int(r["doc_freq"])
        for r in unigram_entity_doc_freq(sf_dir).take_all()
    }
    freq_ref = ray.put(freqs)

    def score(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = ray.get(freq_ref)
        subj = batch["subj"].to_pylist()
        obj = batch["obj"].to_pylist()
        wi = batch["weight"].to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        dfi_s = pd.Series(subj).map(df).to_numpy(np.int64)
        dfi_o = pd.Series(obj).map(df).to_numpy(np.int64)
        # exact integer ppm (no float rounding-mode hazards); the
        # int64 bound w*N*1e6 < 2^63 holds to ~10^6-doc oracles —
        # at web scale report lift in micro units from a float path
        lift_ppm = wi * n_docs * 1_000_000 // (dfi_s * dfi_o)
        conf_ab = wi * 1_000_000 // dfi_s
        conf_ba = wi * 1_000_000 // dfi_o
        return pa.table(
            {
                "antecedent": pa.array(subj + obj, pa.string()),
                "consequent": pa.array(obj + subj, pa.string()),
                "co_docs": pa.concat_arrays(
                    [
                        batch["weight"].combine_chunks().cast(pa.int64()),
                        batch["weight"].combine_chunks().cast(pa.int64()),
                    ]
                ),
                "confidence_ppm": pa.array(
                    np.concatenate([conf_ab, conf_ba]), pa.int64()
                ),
                "lift_ppm": pa.array(
                    np.concatenate([lift_ppm, lift_ppm]), pa.int64()
                ),
            }
        )

    return unigram_triples(sf_dir).map_batches(
        score, batch_format="pyarrow"
    )


def unigram_proximity_edges(sf_dir: str):
    """PROXIMITY-weighted co-occurrence edges: every in-document
    mention pair of two distinct entities contributes
    ``floor(1e6/token_distance + 0.5)`` integer micro-weight — closer
    mentions bind harder, the decay KG construction uses when no
    dependency parse is available (vs the flat doc-scoped count of
    ``unigram_triples``). Integer micro-weights keep the distributed
    sum order-independent and hash-exact vs the SQL twin
    (string_split positions + self-join).

    Scale shape: mention pairs are quadratic per DOCUMENT (bounded by
    mentions/doc; cap or window hub documents at web scale — same
    policy as LSH hot buckets), vectorized with numpy triangle
    indices; per-batch (subj, obj) partials then combine
    key-distributed. Nothing corpus-sized leaves the batch."""
    import numpy as np
    import ray.data as rd

    from autoner_ray.stages.combine import partitioned_key_sum

    def pair_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "subj": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "n_pairs": pa.array([], pa.int64()),
                "prox_micro": pa.array([], pa.int64()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        subj_all, obj_all, micro_all = [], [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split(" ")
            pos, ents = [], []
            for i, t in enumerate(toks):
                hit = UNIGRAM_DICT.get(t)
                if hit is not None:
                    pos.append(i + 1)
                    ents.append(hit[0])
            if len(ents) < 2:
                continue
            p = np.asarray(pos, np.int64)
            e = np.asarray(ents, object)
            ii, jj = np.triu_indices(len(e), k=1)
            keep = e[ii] != e[jj]
            ii, jj = ii[keep], jj[keep]
            if len(ii) == 0:
                continue
            d = (p[jj] - p[ii]).astype(np.float64)
            micro = np.floor(1e6 / d + 0.5).astype(np.int64)
            ea, eb = e[ii], e[jj]
            lo = np.minimum(ea, eb)
            hi = np.maximum(ea, eb)
            subj_all.append(lo)
            obj_all.append(hi)
            micro_all.append(micro)
        if not subj_all:
            return empty
        t = pa.table(
            {
                "subj": pa.array(
                    np.concatenate(subj_all).tolist(), pa.string()
                ),
                "obj": pa.array(
                    np.concatenate(obj_all).tolist(), pa.string()
                ),
                "n_pairs": pa.array(
                    np.ones(sum(len(x) for x in micro_all), np.int64)
                ),
                "prox_micro": pa.array(
                    np.concatenate(micro_all), pa.int64()
                ),
            }
        )
        agg = t.group_by(["subj", "obj"]).aggregate(
            [("n_pairs", "sum"), ("prox_micro", "sum")]
        )
        return agg.rename_columns(
            ["subj", "obj", "n_pairs", "prox_micro"]
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return partitioned_key_sum(
        ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["subj", "obj"], ["n_pairs", "prox_micro"], part_on=("subj",),
    )


def unigram_cooccur_topk(sf_dir: str, k: int = 3,
                         num_partitions: int | None = None):
    """Per-entity top-k co-occurring neighbors over the unigram graph:
    (entity, neighbor, weight, rank) with rank 1..k ordered weight DESC,
    neighbor ASC (deterministic tie-break). SQL twin: ROW_NUMBER() over
    the bidirectional edge list.

    Scale shape: the input is the ALREADY-AGGREGATED edge table (≤
    vocab² rows, one per undirected pair), expanded to both directions
    inside the batch. A per-batch partial top-k bounds every entity to
    ≤k rows per batch before the single hash shuffle on entity, so the
    shuffle moves O(k · |vocab| · blocks-touching-entity) rows, never
    the full edge table; the per-partition pandas head(k) finishes. The
    corpus itself never shuffles."""
    import numpy as np
    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.functions.hashing import md5_64_array

    P = num_partitions or default_num_partitions()
    _partial_schema = pa.schema(
        [
            ("entity", pa.string()),
            ("neighbor", pa.string()),
            ("weight", pa.int64()),
            ("part", pa.int32()),
        ]
    )

    def partial_topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _partial_schema.empty_table()
        df = t.select(["subj", "obj", "weight"]).to_pandas()
        both = pd.concat(
            [
                df.rename(columns={"subj": "entity", "obj": "neighbor"}),
                df.rename(columns={"obj": "entity", "subj": "neighbor"}),
            ],
            ignore_index=True,
        )[["entity", "neighbor", "weight"]]
        both = both.sort_values(
            ["entity", "weight", "neighbor"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = both.groupby("entity", sort=False).head(k)
        pid = (
            md5_64_array(top["entity"].tolist()) % np.uint64(P)
        ).astype(np.int32)
        return pa.table(
            {
                "entity": pa.array(top["entity"], pa.string()),
                "neighbor": pa.array(top["neighbor"], pa.string()),
                "weight": pa.array(top["weight"].to_numpy(), pa.int64()),
                "part": pa.array(pid),
            }
        )

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "entity" not in df.columns:
            return pd.DataFrame(
                {
                    "entity": pd.Series([], dtype="object"),
                    "neighbor": pd.Series([], dtype="object"),
                    "weight": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(
            ["entity", "weight", "neighbor"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        top = df.groupby("entity", sort=False).head(k).copy()
        top["rank"] = top.groupby("entity", sort=False).cumcount() + 1
        return top[["entity", "neighbor", "weight", "rank"]]

    return (
        unigram_triples(sf_dir)
        .map_batches(partial_topk, batch_format="pyarrow")
        .groupby("part")
        .map_groups(final_topk, batch_format="pandas")
    )


def unigram_pagerank(sf_dir: str):
    """PageRank over the unigram co-occurrence graph — the SQL-checkable
    face of the graph stage (oracle: 20 unrolled power iterations in
    DuckDB). 6-dp round keeps the value-hash robust to float summation
    order across engines."""
    from autoner_ray.stages.graph import pagerank

    return pagerank(unigram_triples(sf_dir), round_dp=6)


def unigram_connected_components(sf_dir: str):
    """Connected components over the unigram graph (oracle: recursive
    reachability CTE, component = lexicographic min of reachable set)."""
    from autoner_ray.stages.graph import connected_components

    return connected_components(unigram_triples(sf_dir))


def unigram_bfs_distances(sf_dir: str):
    """Single-source hop distances from the lexicographically smallest
    entity over the unigram co-occurrence graph (oracle: depth-capped
    recursive reachability CTE with MIN(d) per node)."""
    from autoner_ray.stages.graph import bfs_distances

    return bfs_distances(unigram_triples(sf_dir))


def unigram_degree_distribution(sf_dir: str):
    """Degree histogram of the unigram co-occurrence graph (oracle:
    GROUP BY degree over per-src counts of the unique bidirectional
    edge list)."""
    from autoner_ray.stages.graph import degree_distribution

    return degree_distribution(unigram_triples(sf_dir))


def unigram_adamic_adar(sf_dir: str):
    """Adamic-Adar link-prediction scores over the unigram
    co-occurrence graph (oracle: wedge self-join + degree join with
    integer micro-quantized 1/ln(deg) terms)."""
    from autoner_ray.stages.graph import adamic_adar

    return adamic_adar(unigram_triples(sf_dir))


def unigram_triangles(sf_dir: str):
    """Per-entity triangle counts over the unigram co-occurrence graph
    (oracle: three-way self-join on the subj<obj pair list; each
    triangle is enumerated once at its lexicographic orientation and
    credited to all three corners)."""
    from autoner_ray.stages.graph import triangle_counts

    return triangle_counts(unigram_triples(sf_dir))


def typed_triples_dataset(sf_dir: str, concurrency=None, repeat: int = 1):
    """Pattern-rule typed triples: (subj, pred=gap-pattern|cooccurs_with,
    obj, weight) — same zero-shuffle combiner shape as the flagship."""
    pairs = matched_sentences(
        sf_dir, concurrency, output="typed_pairs", repeat=repeat
    )
    return aggregate_edges(pairs)


def triples_with_evidence(sf_dir: str, concurrency=None, repeat: int = 1):
    """Flagship edges + provenance: min (url, sent_id) evidence pointer."""
    from autoner_ray.stages.triples import aggregate_edges_with_evidence

    pairs = matched_sentences(
        sf_dir, concurrency, output="pairs_ev", repeat=repeat
    )
    return aggregate_edges_with_evidence(pairs)


def unigram_triples_with_evidence(sf_dir: str):
    """SQL-checkable twin: evidence = MIN doc_id where the pair co-occurs."""
    from collections import Counter

    from ray.data.aggregate import Min, Sum
    from itertools import combinations

    def pairs_ev(batch: pa.Table) -> pa.Table:
        counter: Counter[tuple[str, str]] = Counter()
        ev: dict[tuple[str, str], int] = {}
        for did, ents in zip(
            batch["doc_id"].to_pylist(), batch["entities"].to_pylist()
        ):
            for pair in combinations(ents, 2):
                counter[pair] += 1
                if pair not in ev or did < ev[pair]:
                    ev[pair] = did
        keys = list(counter.keys())
        return pa.table(
            {
                "subj": pa.array([k[0] for k in keys], pa.string()),
                "obj": pa.array([k[1] for k in keys], pa.string()),
                "w": pa.array([counter[k] for k in keys], pa.int64()),
                "ev": pa.array([ev[k] for k in keys], pa.int64()),
            }
        )

    return (
        unigram_doc_entities(sf_dir)
        .map_batches(pairs_ev, batch_format="pyarrow")
        .groupby(["subj", "obj"])
        .aggregate(
            Sum("w", alias_name="weight"),
            Min("ev", alias_name="evidence_doc"),
        )
    )


def unigram_entity_type_profile(sf_dir: str):
    """Per (entity, type) doc-mention counts — the type histogram face of
    the canonical entity table (SQL-checkable)."""
    from collections import Counter

    from ray.data.aggregate import Sum

    type_of = {e: t for e, t in UNIGRAM_DICT.values()}

    def explode(batch: pa.Table) -> pa.Table:
        counter: Counter[tuple[str, str]] = Counter()
        for ents in batch["entities"].to_pylist():
            for e in ents:
                counter[(e, type_of[e])] += 1
        keys = list(counter.keys())
        return pa.table(
            {
                "entity": pa.array([k[0] for k in keys], pa.string()),
                "type": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    return (
        unigram_doc_entities(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby(["entity", "type"])
        .aggregate(Sum("n", alias_name="n_docs"))
    )


def unigram_typed_edge_filter(sf_dir: str, subj_type="Operator",
                              obj_type="Structure"):
    """Edges restricted by entity TYPE on both ends — the type profile is
    a broadcast-side dim lookup, no extra shuffle (SQL-checkable)."""
    type_of = {e: t for e, t in UNIGRAM_DICT.values()}

    def keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = [
            # edges are (min, max)-ordered, so check both assignments
            (type_of.get(s) == subj_type and type_of.get(o) == obj_type)
            or (type_of.get(s) == obj_type and type_of.get(o) == subj_type)
            for s, o in zip(
                batch["subj"].to_pylist(), batch["obj"].to_pylist()
            )
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return unigram_triples(sf_dir).map_batches(keep, batch_format="pyarrow")


def unigram_clustering_coeff(sf_dir: str):
    """Per-entity local clustering coefficient (integer ppm) over the
    unigram co-occurrence graph — the triangle/wedge ratio that ranks
    how clique-like each entity's neighborhood is (oracle: the
    triangle three-way self-join left-joined onto degrees)."""
    from autoner_ray.stages.graph import clustering_coeff

    return clustering_coeff(unigram_triples(sf_dir))


def unigram_pagerank_personalized(sf_dir: str):
    """Random-walk-with-restart relevance from the lexicographically
    smallest entity over the unigram co-occurrence graph (oracle: 20
    unrolled seeded power iterations; 6-dp round for cross-engine
    float-sum robustness, same contract as :func:`unigram_pagerank`)."""
    from autoner_ray.stages.graph import pagerank_personalized

    return pagerank_personalized(unigram_triples(sf_dir))


def unigram_adjacency(sf_dir: str):
    """Adjacency-shard view of the unigram co-occurrence triple graph:
    one row per subject with its edge list serialized
    ``pred:obj:weight;...`` in (pred, obj) order plus the out-degree —
    the SQL-checkable face of :func:`~autoner_ray.stages.graph.
    adjacency_lists` / ``materialize_graph`` (same sort order the
    Parquet shards use, so the oracle certifies the shard layout
    contract, oracle: ``string_agg`` with the same ORDER BY)."""

    def to_adj(df):
        import pandas as pd

        if len(df) == 0 or "subj" not in df.columns:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="object"),
                    "adjacency": pd.Series(dtype="object"),
                    "degree": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["pred", "obj"], kind="mergesort")
        adj = ";".join(
            f"{p}:{o}:{int(w)}"
            for p, o, w in zip(df["pred"], df["obj"], df["weight"])
        )
        return pd.DataFrame(
            {
                "src": [df["subj"].iloc[0]],
                "adjacency": [adj],
                "degree": [len(df)],
            }
        )

    return (
        unigram_triples(sf_dir)
        .groupby("subj")
        .map_groups(to_adj, batch_format="pandas")
    )


def unigram_infix_relations(sf_dir: str, max_gap: int = 3,
                            min_count: int = 2):
    """Surface-pattern relation extraction (OpenIE-lite): every ORDERED
    in-document pair of distinct entity mentions at token distance
    2..``max_gap``+1 emits the triple (subj, infix-words, obj); triples
    seen ≥ ``min_count`` times survive. The infix string is the
    predicate — the "X acquired Y" / "X of Y" patterns KG construction
    mines when no dependency parser is available.

    Scale shape: pair mining is per-document and GAP-BOUNDED (each
    mention looks ≤ ``max_gap``+1 tokens ahead — linear in corpus
    size, unlike the quadratic proximity kernel); per-batch triple
    partials -> ONE hash shuffle on subj -> per-partition final sum +
    HAVING filter inside the same grouped pass. Output is pattern-
    vocabulary bounded."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.joins import _stable_part_col

    P = default_num_partitions()

    def rel_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "subj": pa.array([], pa.string()),
                "pred": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        subj_all, pred_all, obj_all = [], [], []
        for text in batch["text"].to_pylist():
            toks = (text or "").split(" ")
            pos, ents = [], []
            for i, t in enumerate(toks):
                hit = UNIGRAM_DICT.get(t)
                if hit is not None:
                    pos.append(i)
                    ents.append(hit[0])
            n = len(ents)
            for a in range(n):
                for b in range(a + 1, n):
                    gap = pos[b] - pos[a]
                    if gap > max_gap + 1:
                        break
                    if gap < 2 or ents[a] == ents[b]:
                        continue
                    subj_all.append(ents[a])
                    pred_all.append(
                        " ".join(toks[pos[a] + 1 : pos[b]])
                    )
                    obj_all.append(ents[b])
        if not subj_all:
            return empty
        t = pa.table(
            {
                "subj": pa.array(subj_all, pa.string()),
                "pred": pa.array(pred_all, pa.string()),
                "obj": pa.array(obj_all, pa.string()),
                "n": pa.array(np.ones(len(subj_all), np.int64)),
            }
        )
        agg = t.group_by(["subj", "pred", "obj"]).aggregate(
            [("n", "sum")]
        ).rename_columns(["subj", "pred", "obj", "n"])
        return agg.append_column(
            "part", _stable_part_col(agg, ("subj",), P)
        )

    def sum_having(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "subj": pd.Series(dtype="object"),
                "pred": pd.Series(dtype="object"),
                "obj": pd.Series(dtype="object"),
                "n": pd.Series(dtype="int64"),
            }
        )
        if len(df) == 0 or "subj" not in df.columns:
            return empty
        out = (
            df.groupby(["subj", "pred", "obj"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        out = out[out["n"] >= min_count]
        return out.reset_index(drop=True)

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return (
        ds.map_batches(rel_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sum_having, batch_format="pandas")
    )


def unigram_hash_walks(sf_dir: str):
    """Deterministic 2-hop graph walks for embedding-training corpora
    (the DeepWalk/node2vec sampling stage made reproducible): from
    every entity, hop h moves to the neighbor minimizing
    ``md5(cur || '|h|' || neighbor)`` — a pure content-keyed choice,
    so walks are identical across runs, widths and block layouts
    (unlike RNG-seeded walks) while still pseudo-uniform over
    neighbors. Returns (seed, hop1, hop2).

    Scale shape: ONE hash shuffle partitions the bidirectional edge
    list by src; each partition computes BOTH per-node minimizers
    (hop-1 and hop-2 salts) in a single grouped pass, then one
    vocab-bounded cogroup join stitches hop2 = next2(hop1). Nothing
    graph-sized on the driver; md5 cost is |E|-bounded (edge table,
    never the corpus)."""
    import hashlib

    import pandas as pd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.joins import _stable_part_col, cogroup_join

    P = default_num_partitions()

    def bidir(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "part": pa.array([], pa.int32()),
            }
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        src = t["subj"].to_pylist() + t["obj"].to_pylist()
        dst = t["obj"].to_pylist() + t["subj"].to_pylist()
        out = pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
            }
        )
        return out.append_column(
            "part", _stable_part_col(out, ("src",), P)
        )

    def next_hops(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "node": pd.Series(dtype="object"),
                "next1": pd.Series(dtype="object"),
                "next2": pd.Series(dtype="object"),
            }
        )
        if len(df) == 0 or "src" not in df.columns:
            return empty
        h1 = [
            hashlib.md5(f"{s}|1|{d}".encode()).hexdigest()
            for s, d in zip(df["src"], df["dst"])
        ]
        h2 = [
            hashlib.md5(f"{s}|2|{d}".encode()).hexdigest()
            for s, d in zip(df["src"], df["dst"])
        ]
        df = df.assign(h1=h1, h2=h2)
        g = df.groupby("src", sort=False)
        n1 = df.loc[g["h1"].idxmin(), ["src", "dst"]]
        n2 = df.loc[g["h2"].idxmin(), ["src", "dst"]]
        out = n1.rename(
            columns={"src": "node", "dst": "next1"}
        ).merge(
            n2.rename(columns={"src": "node", "dst": "next2"}),
            on="node",
        )
        return out.reset_index(drop=True)

    # both join sides read `hops`: pin the vocab-bounded table once so
    # the corpus-sized upstream doesn't execute twice (lazy Datasets
    # re-run per consumer)
    hops = (
        unigram_triples(sf_dir)
        .map_batches(bidir, batch_format="pyarrow")
        .groupby("part")
        .map_groups(next_hops, batch_format="pandas")
    ).materialize()

    def left_side(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "seed": pa.array([], pa.string()),
                    "node": pa.array([], pa.string()),
                }
            )
        return pa.table({"seed": t["node"], "node": t["next1"]})

    def right_side(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "hop2": pa.array([], pa.string()),
                }
            )
        return pa.table({"node": t["node"], "hop2": t["next2"]})

    walks = cogroup_join(
        hops.map_batches(left_side, batch_format="pyarrow"),
        hops.map_batches(right_side, batch_format="pyarrow"),
        on=("node",),
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "seed": pa.array([], pa.string()),
                    "hop1": pa.array([], pa.string()),
                    "hop2": pa.array([], pa.string()),
                }
            )
        return pa.table(
            {"seed": t["seed"], "hop1": t["node"], "hop2": t["hop2"]}
        )

    return walks.map_batches(finish, batch_format="pyarrow")


def unigram_label_propagation(sf_dir: str, rounds: int = 4):
    """Weighted synchronous label-propagation communities over the
    unigram co-occurrence graph (oracle: ``rounds`` unrolled
    vote-argmax steps with ROW_NUMBER tiebreak — integer weights, so
    the vote sums are exact on both sides)."""
    from autoner_ray.stages.graph import label_propagation

    return label_propagation(unigram_triples(sf_dir), rounds=rounds)


def unigram_triple_delta(sf_dir: str):
    """Incremental-KG delta: the edge updates that arrive when the odd
    half of the corpus (doc_id % 2 = 1, the "new crawl") lands on top
    of the even half (the "existing KG") — every co-occurrence edge the
    new docs touch, with its prior weight, the increment, the resulting
    total, and an is-new flag. This is the maintenance shape a
    continuously-crawled KG runs instead of full rebuilds: only touched
    edges ship downstream.

    Scale shape: one pass over documents emits per-batch (subj, obj,
    w_old, w_new) partials (the parity split is a flag on the SAME
    stream — the corpus is read once, not twice); a subj-partitioned
    distributed sum merges them (edge keys are unbounded); the final
    new-edge filter is a stateless map. No driver-sized state."""
    from collections import Counter
    from itertools import combinations

    import pyarrow.compute as pc

    from autoner_ray.stages.combine import partitioned_key_sum

    def delta_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "subj": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "old_weight": pa.array([], pa.int64()),
                "new_weight": pa.array([], pa.int64()),
            }
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        counter: Counter[tuple[str, str, int]] = Counter()
        for doc_id, ents in zip(
            t["doc_id"].to_pylist(), t["entities"].to_pylist()
        ):
            is_new = int(doc_id) % 2
            for a, b in combinations(ents, 2):
                counter[(a, b, is_new)] += 1
        subjs, objs, olds, news = [], [], [], []
        for (a, b, is_new), w in counter.items():
            subjs.append(a)
            objs.append(b)
            olds.append(0 if is_new else w)
            news.append(w if is_new else 0)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "obj": pa.array(objs, pa.string()),
                "old_weight": pa.array(olds, pa.int64()),
                "new_weight": pa.array(news, pa.int64()),
            }
        )

    merged = partitioned_key_sum(
        unigram_doc_entities(sf_dir).map_batches(
            delta_partial, batch_format="pyarrow"
        ),
        keys=["subj", "obj"], sum_cols=["old_weight", "new_weight"],
        part_on=("subj",),
    )

    _out_schema = pa.schema(
        [
            ("subj", pa.string()),
            ("obj", pa.string()),
            ("old_weight", pa.int64()),
            ("new_weight", pa.int64()),
            ("total_weight", pa.int64()),
            ("is_new_edge", pa.int64()),
        ]
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _out_schema.empty_table()
        t = t.filter(pc.greater(t["new_weight"], pa.scalar(0)))
        total = pc.add(t["old_weight"], t["new_weight"])
        is_new = pc.cast(
            pc.equal(t["old_weight"], pa.scalar(0)), pa.int64()
        )
        return pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "old_weight": t["old_weight"],
                "new_weight": t["new_weight"],
                "total_weight": total,
                "is_new_edge": is_new,
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow")


def unigram_metapath_wedges(sf_dir: str):
    """Metapath (length-2 heterogeneous path) census over the unigram
    co-occurrence graph: for every middle-entity type and unordered
    endpoint-type pair, how many distinct wedges a—c—b exist — the
    schema-level statistic heterogeneous-network pipelines (metapath2vec
    et al.) read before choosing which metapaths to sample.

    Scale shape: edges expand to both directions with the static
    dictionary type map applied in-task (module data — nothing
    broadcast); one hash shuffle groups each center's adjacency;
    per-center wedge counts per type pair come from type-count
    combinatorics (n1·n2, or C(n,2) within a type — never materializing
    the wedges); the tail is a bounded combine over |types|^3 keys."""
    import pandas as pd

    from autoner_ray.stages.combine import bounded_key_sum
    from autoner_ray.stages.joins import _stable_part_col

    # canonical entity id == word; dict values are (entity, type)
    type_of = {e: t for (e, t) in UNIGRAM_DICT.values()}
    P = 16

    def expand(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "src": pa.array([], pa.string()),
                "dst": pa.array([], pa.string()),
                "__part": pa.array([], pa.int32()),
            }
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        s = t["subj"].combine_chunks()
        o = t["obj"].combine_chunks()
        both = pa.table(
            {
                "src": pa.concat_arrays([s, o]),
                "dst": pa.concat_arrays([o, s]),
            }
        )
        return both.append_column(
            "__part", _stable_part_col(both, ("src",), P)
        )

    _out = pd.DataFrame(
        {
            "type_mid": pd.Series([], dtype="object"),
            "type_a": pd.Series([], dtype="object"),
            "type_b": pd.Series([], dtype="object"),
            "n_paths": pd.Series([], dtype="int64"),
        }
    )

    def wedge_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0 or "src" not in df.columns:
            return _out
        rows: dict[tuple[str, str, str], int] = {}
        for center, g in df.groupby("src"):
            tm = type_of[center]
            tc = g["dst"].map(type_of).value_counts()
            types = sorted(tc.index)
            for i, t1 in enumerate(types):
                n1 = int(tc[t1])
                if n1 >= 2:
                    key = (tm, t1, t1)
                    rows[key] = rows.get(key, 0) + n1 * (n1 - 1) // 2
                for t2 in types[i + 1:]:
                    key = (tm, t1, t2)
                    rows[key] = rows.get(key, 0) + n1 * int(tc[t2])
        if not rows:
            return _out
        ks = sorted(rows)
        return pd.DataFrame(
            {
                "type_mid": [k[0] for k in ks],
                "type_a": [k[1] for k in ks],
                "type_b": [k[2] for k in ks],
                "n_paths": [rows[k] for k in ks],
            }
        )

    partials = (
        unigram_triples(sf_dir)
        .map_batches(expand, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(wedge_counts, batch_format="pandas")
    )
    return bounded_key_sum(
        partials, ["type_mid", "type_a", "type_b"], ["n_paths"]
    )


def unigram_node_embedding_rp(sf_dir: str, n_dims: int = 8):
    """Deterministic random-projection node embeddings over the
    weighted unigram co-occurrence graph (FastRP depth-1): dimension d
    of entity e is the weighted sum over its neighbors n of
    sign(md5(n || '|' || d)) · weight(e, n), where the sign is the
    parity of the first hex digit — a content-derived ±1 that engine
    and SQL twin compute identically, so the embedding is
    bit-reproducible with no stored projection matrix. The standard
    cheap-embedding pass a KG runs before anything learned.

    Scale shape: edges expand to both directions and emit per-batch
    (entity, d0..d{n-1}) partial sums (signs memoized per worker via
    the neighbor's md5 — one hash per distinct (neighbor, d), not per
    edge); an entity-partitioned distributed sum merges them (entity
    keys unbounded — never driver-sized)."""
    import hashlib

    from autoner_ray.stages.combine import partitioned_key_sum

    dcols = [f"d{i}" for i in range(n_dims)]

    def rp_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"entity": pa.array([], pa.string())}
            | {c: pa.array([], pa.int64()) for c in dcols}
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        import numpy as np
        import pandas as pd

        s = t["subj"].to_pylist()
        o = t["obj"].to_pylist()
        w = t["weight"].to_numpy()
        ent = np.array(s + o, dtype=object)
        nbr = np.array(o + s, dtype=object)
        ww = np.concatenate([w, w]).astype(np.int64)

        sign_cache: dict[str, np.ndarray] = {}

        def signs(name: str) -> np.ndarray:
            v = sign_cache.get(name)
            if v is None:
                v = np.array(
                    [
                        1 if int(hashlib.md5(
                            f"{name}|{d}".encode()
                        ).hexdigest()[0], 16) % 2 == 0 else -1
                        for d in range(n_dims)
                    ],
                    np.int64,
                )
                sign_cache[name] = v
            return v
        sgn = np.stack([signs(n) for n in nbr])  # (rows, n_dims)
        contrib = sgn * ww[:, None]
        df = pd.DataFrame(contrib, columns=dcols)
        df["entity"] = ent
        agg = df.groupby("entity", sort=False, as_index=False).sum()
        return pa.table(
            {"entity": pa.array(agg["entity"], pa.string())}
            | {
                c: pa.array(agg[c].to_numpy(np.int64), pa.int64())
                for c in dcols
            }
        )

    return partitioned_key_sum(
        unigram_triples(sf_dir).map_batches(
            rp_partial, batch_format="pyarrow"
        ),
        keys=["entity"], sum_cols=dcols, part_on=("entity",),
    )


def unigram_source_hits(sf_dir: str, iters: int = 8,
                        scale: int = 1_000_000):
    """HITS hubs/authorities over the bipartite SOURCE -> ENTITY mention
    graph: edge weight = number of docs from the source mentioning the
    entity (distinct per doc). Which sources concentrate authoritative
    entities — the crawl-seeding / source-ranking signal for KG
    construction (integer-lattice iteration, see
    :func:`autoner_ray.stages.graph.hits_lattice`).

    Scale shape: corpus -> per-batch (source, entity) count partials
    (each doc is one row, so per-doc distinct entities never need a
    cross-batch dedup) -> shuffle-free bounded combine (|sources| x
    |dict| rows) -> driver lattice iteration.
    """
    import ray.data as rd

    from autoner_ray.stages.combine import bounded_key_sum
    from autoner_ray.stages.graph import hits_lattice

    dict_keys = set(UNIGRAM_DICT)

    def edge_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        counter: Counter[tuple[str, str]] = Counter()
        for src, text in zip(
            batch["source"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = set(sentence_token_stream(text or ""))
            for t in toks & dict_keys:
                counter[(src, UNIGRAM_DICT[t][0])] += 1
        keys = list(counter.keys())
        return pa.table(
            {
                "src": pa.array([k[0] for k in keys], pa.string()),
                "ent": pa.array([k[1] for k in keys], pa.string()),
                "w": pa.array(
                    [counter[k] for k in keys], pa.int64()
                ),
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    edges = bounded_key_sum(
        ds.map_batches(edge_partial, batch_format="pyarrow"),
        ["src", "ent"], ["w"],
    )
    return hits_lattice(edges, iters=iters, scale=scale)


def unigram_entity_density(sf_dir: str):
    """Per-document mention-density audit over the unigram dictionary:
    token count, dictionary-token mentions (with repeats), distinct
    entities, and density in integer ppm (mentions * 10^6 // tokens) —
    the corpus-selection signal that decides which documents feed KG
    construction (mention-sparse docs carry no triples).

    Scale shape: ONE stateless vectorized ``map_batches`` (explode ->
    isin -> per-doc integer aggregate); no shuffle, no state.
    """
    import numpy as np
    import pandas as pd
    import ray.data as rd

    dict_words = list(UNIGRAM_DICT)

    def density(df: pd.DataFrame) -> pd.DataFrame:
        cols = [
            "doc_id", "n_tokens", "n_mentions", "n_entities",
            "density_ppm",
        ]
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in cols}
            )
        words = df["text"].fillna("").str.split(" ")
        ex = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy().repeat(
                    words.str.len().to_numpy()
                ),
                "word": np.concatenate(words.to_numpy()),
            }
        )
        ex = ex[ex["word"] != ""]
        ex["hit"] = ex["word"].isin(dict_words).astype("int64")
        g = ex.groupby("doc_id", sort=False)
        agg = g.agg(
            n_tokens=("word", "size"),
            n_mentions=("hit", "sum"),
        ).reset_index()
        ents = (
            ex[ex["hit"] == 1]
            .groupby("doc_id", sort=False)["word"]
            .nunique()
        )
        agg["n_entities"] = (
            agg["doc_id"].map(ents).fillna(0).astype("int64")
        )
        agg["density_ppm"] = (
            agg["n_mentions"].to_numpy() * 1_000_000
            // agg["n_tokens"].to_numpy()
        )
        for c in cols[1:]:
            agg[c] = agg[c].astype("int64")
        return agg[cols]

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return ds.map_batches(density, batch_format="pandas")


def unigram_type_schema_census(sf_dir: str):
    """KG SCHEMA CENSUS: roll the co-occurrence edge list up to entity-
    TYPE pairs — for every unordered (type_a, type_b), the number of
    distinct entity pairs and the total co-occurrence weight. The
    schema-induction summary that tells a KG builder which relation
    types the corpus actually supports (ref contract: the typed-edge
    filter at `unigram_typed_edge_filter`, aggregated instead of
    filtered).

    Scale shape: edge list arrives pre-aggregated from
    :func:`unigram_triples` (one global row per pair); the type lookup
    is a dict-bounded broadcast map; the tail is a shuffle-free bounded
    combine over <= |types|^2 keys.
    """
    from autoner_ray.stages.combine import bounded_key_sum

    type_of = {e: t for e, t in UNIGRAM_DICT.values()}

    def rollup(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table(
                {
                    "type_a": pa.array([], pa.string()),
                    "type_b": pa.array([], pa.string()),
                    "n_pairs": pa.array([], pa.int64()),
                    "total_weight": pa.array([], pa.int64()),
                }
            )
        ta = [type_of[s] for s in batch["subj"].to_pylist()]
        tb = [type_of[o] for o in batch["obj"].to_pylist()]
        lo = [min(a, b) for a, b in zip(ta, tb)]
        hi = [max(a, b) for a, b in zip(ta, tb)]
        t = pa.table(
            {
                "type_a": pa.array(lo, pa.string()),
                "type_b": pa.array(hi, pa.string()),
                "n_pairs": pa.array([1] * len(lo), pa.int64()),
                "total_weight": batch["weight"].cast(pa.int64()),
            }
        )
        agg = t.group_by(["type_a", "type_b"]).aggregate(
            [("n_pairs", "sum"), ("total_weight", "sum")]
        )
        return agg.rename_columns(
            ["type_a", "type_b", "n_pairs", "total_weight"]
        )

    return bounded_key_sum(
        unigram_triples(sf_dir).map_batches(rollup, batch_format="pyarrow"),
        ["type_a", "type_b"], ["n_pairs", "total_weight"],
    )


def unigram_ntriples(sf_dir: str):
    """N-Triples EXPORT of the co-occurrence edge list: one canonical
    RDF line per edge (`<urn:e:subj> <urn:r:cooccurs_with> <urn:e:obj> .`)
    plus the weight column — the interchange format a downstream triple
    store ingests. IRI-escaping is the identity for this dictionary
    (entity ids are [a-z]+); :func:`parse_ntriples_batch` is the
    inverse and the roundtrip is pinned by pytest.

    Scale shape: a stateless vectorized string concat over the
    pre-aggregated edge list; no shuffle.
    """
    import pyarrow.compute as pc

    def serialize(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table(
                {
                    "ntriple": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        line = pc.binary_join_element_wise(
            "<urn:e:", batch["subj"].cast(pa.string()),
            "> <urn:r:cooccurs_with> <urn:e:",
            batch["obj"].cast(pa.string()), "> .", "",
        )
        return pa.table(
            {"ntriple": line, "weight": batch["weight"].cast(pa.int64())}
        )

    return unigram_triples(sf_dir).map_batches(
        serialize, batch_format="pyarrow"
    )


_NT_RE = (
    r"^<urn:e:(?P<subj>[^>]+)> <urn:r:(?P<pred>[^>]+)>"
    r" <urn:e:(?P<obj>[^>]+)> \.$"
)


def parse_ntriples_batch(batch: pa.Table) -> pa.Table:
    """Inverse of :func:`unigram_ntriples`: parse canonical N-Triples
    lines back to (subj, pred, obj) via one vectorized RE2 extract
    (rows that don't match the canonical form are dropped)."""
    import pyarrow.compute as pc

    line = pc.fill_null(batch["ntriple"], "").combine_chunks()
    ok = pc.match_substring_regex(line, _NT_RE)
    line = line.filter(ok)
    st = pc.extract_regex(line, _NT_RE)
    keep = {
        "subj": st.field("subj"),
        "pred": st.field("pred"),
        "obj": st.field("obj"),
    }
    if "weight" in batch.column_names:
        keep["weight"] = batch["weight"].filter(ok)
    return pa.table(keep)


def unigram_harmonic_centrality(sf_dir: str, max_depth: int = 32,
                                scale: int = 1_000_000):
    """Harmonic centrality over the unigram co-occurrence graph, in
    integer ppm: H(v) = sum over reachable u != v of ``scale // d(v,u)``
    plus the reachable-set size — the distance-based importance ranking
    that, unlike closeness, handles disconnected graphs gracefully.
    Integer floor division keeps both engines bit-exact (d >= 1, so
    trunc == floor in the DuckDB twin too).

    Scale shape: edge aggregation is distributed
    (:func:`unigram_triples`); the all-pairs BFS runs on the
    vocab-bounded driver adjacency — the same bounded default as
    ``kg_pagerank``, with the multi-source frontier-as-Dataset variant
    (``graph.bfs_multi``-shaped) the documented unbounded path.
    """
    from collections import deque

    df = unigram_triples(sf_dir).to_pandas()
    out_schema = pa.schema(
        [
            ("entity", pa.string()),
            ("harmonic_ppm", pa.int64()),
            ("n_reachable", pa.int64()),
        ]
    )
    if len(df) == 0:
        return out_schema.empty_table()
    adj: dict[str, set[str]] = {}
    for s, o in zip(df["subj"], df["obj"]):
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    nodes = sorted(adj)
    hp, nr = [], []
    for v in nodes:
        dist = {v: 0}
        q = deque([v])
        acc = 0
        while q:
            u = q.popleft()
            d = dist[u]
            if d >= max_depth:
                continue
            for w in adj[u]:
                if w not in dist:
                    dist[w] = d + 1
                    acc += scale // (d + 1)
                    q.append(w)
        hp.append(acc)
        nr.append(len(dist) - 1)
    return pa.table(
        {
            "entity": pa.array(nodes, pa.string()),
            "harmonic_ppm": pa.array(hp, pa.int64()),
            "n_reachable": pa.array(nr, pa.int64()),
        },
        schema=out_schema,
    )


def unigram_entity_context_topk(sf_dir: str, window: int = 4,
                                k: int = 5):
    """Distributional CONTEXT SIGNATURE per dictionary entity: the
    top-``k`` sliding-window neighbor words by positional co-occurrence
    count (ties lexicographic) — the feature an entity linker or
    embedding trainer consumes. Composition: the word2vec-style window
    pair counts (:func:`autoner_ray.stages.webtext.window_cooccurrence`)
    restricted to pairs touching a dictionary word, then grouped top-k.

    Scale shape: the pair table arrives globally combined and
    WORD_A-partitioned; the dict filter is a broadcast ``is_in``; the
    top-k is per-partition (each entity's rows co-locate after the
    ENTITY-hash repartition) with <= |dict| * k rows surviving.
    """
    import ray.data as rd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.functions.hashing import md5_64_array
    from autoner_ray.stages.webtext import window_cooccurrence

    P = default_num_partitions()
    dict_arr = pa.array(sorted(UNIGRAM_DICT), pa.string())

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    pairs = window_cooccurrence(docs, window=window)

    _partial_schema = pa.schema(
        [
            ("entity", pa.string()),
            ("ctx", pa.string()),
            ("n", pa.int64()),
            ("part", pa.int32()),
        ]
    )

    def orient(t: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        if t.num_columns == 0 or len(t) == 0:
            return _partial_schema.empty_table()
        ina = pc.is_in(t["word_a"], value_set=dict_arr)
        inb = pc.is_in(t["word_b"], value_set=dict_arr)
        ta = t.filter(ina)
        tb = t.filter(inb)
        both = pa.concat_tables(
            [
                pa.table({"entity": ta["word_a"], "ctx": ta["word_b"],
                          "n": ta["n"].cast(pa.int64())}),
                pa.table({"entity": tb["word_b"], "ctx": tb["word_a"],
                          "n": tb["n"].cast(pa.int64())}),
            ]
        )
        pid = (
            md5_64_array(both["entity"].to_pylist()) % np.uint64(P)
        ).astype(np.int32)
        return both.append_column("part", pa.array(pid))

    def topk(df) -> "pd.DataFrame":
        import pandas as pd

        cols = ["entity", "ctx", "n", "rank"]
        if len(df) == 0 or "entity" not in df.columns:
            return pd.DataFrame(
                {
                    "entity": pd.Series([], dtype="object"),
                    "ctx": pd.Series([], dtype="object"),
                    "n": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                }
            )
        df = df.sort_values(
            ["entity", "n", "ctx"], ascending=[True, False, True],
            kind="mergesort",
        )
        top = df.groupby("entity", sort=False).head(k).copy()
        top["rank"] = top.groupby("entity", sort=False).cumcount() + 1
        top["n"] = top["n"].astype("int64")
        top["rank"] = top["rank"].astype("int64")
        return top[cols]

    return (
        pairs.map_batches(orient, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Temporal provenance over the unigram KG (crawl-timestamp lineage)
# ---------------------------------------------------------------------------

def unigram_entity_timeline(sf_dir: str):
    """Per-entity crawl-time provenance: first_seen / last_seen
    ``warc_ts`` plus document support count.

    The KG analogue of a crawl ledger — when did each entity enter the
    graph, when was it last observed, how much evidence backs it. The
    page timestamp is the same pure doc_id derivation the pages source
    uses (`sources/pages.py::derive_pages_batch`), so the DuckDB twin
    recomputes it exactly.

    Scale shape: per-batch min/max/sum partials over the dict-bounded
    entity set, then the hash-partitioned two-level combine
    (`stages/combine.py::partitioned_key_agg`) — no corpus shuffle, no
    driver-side state.
    """
    from autoner_ray.sources.pages import _TS_BASE_US
    from autoner_ray.stages.combine import partitioned_key_agg

    def partials(batch: pa.Table) -> pa.Table:
        ents_per_doc = batch["entities"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        ent_col, first, last, n = [], [], [], []
        agg: dict[str, list[int]] = {}
        for did, ents in zip(ids, ents_per_doc):
            ts = _TS_BASE_US + did * 1_000_000
            for e in ents:
                cur = agg.get(e)
                if cur is None:
                    agg[e] = [ts, ts, 1]
                else:
                    cur[0] = min(cur[0], ts)
                    cur[1] = max(cur[1], ts)
                    cur[2] += 1
        for e in sorted(agg):
            ent_col.append(e)
            first.append(agg[e][0])
            last.append(agg[e][1])
            n.append(agg[e][2])
        return pa.table(
            {
                "entity": pa.array(ent_col, pa.string()),
                "first_us": pa.array(first, pa.int64()),
                "last_us": pa.array(last, pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
            }
        )

    agg_ds = partitioned_key_agg(
        unigram_doc_entities(sf_dir).map_batches(
            partials, batch_format="pyarrow"
        ),
        keys=["entity"],
        aggs=[("first_us", "min"), ("last_us", "max"), ("n_docs", "sum")],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "entity": pa.array([], pa.string()),
                    "first_seen": pa.array([], pa.timestamp("us")),
                    "last_seen": pa.array([], pa.timestamp("us")),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "entity": t["entity"],
                "first_seen": t["first_us"].cast(pa.timestamp("us")),
                "last_seen": t["last_us"].cast(pa.timestamp("us")),
                "n_docs": t["n_docs"],
            }
        )

    return agg_ds.map_batches(finish, batch_format="pyarrow")


def unigram_triples_temporal(sf_dir: str):
    """Co-occurrence triples with crawl-time lineage: weight plus
    first_seen / last_seen evidence timestamps per (subj, obj) edge —
    the per-partition lineage metadata the north rule asks each graph
    shard to carry, expressed as a first-class queryable table.

    Same two-level partitioned combine as the timeline; edge
    cardinality is unbounded so the combine hash-partitions on the
    (subj, obj) key pair rather than assuming boundedness.
    """
    from autoner_ray.sources.pages import _TS_BASE_US
    from autoner_ray.stages.combine import partitioned_key_agg
    from itertools import combinations

    def pair_partials(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ents_per_doc = batch["entities"].to_pylist()
        agg: dict[tuple[str, str], list[int]] = {}
        for did, ents in zip(ids, ents_per_doc):
            ts = _TS_BASE_US + did * 1_000_000
            for a, b in combinations(sorted(ents), 2):
                cur = agg.get((a, b))
                if cur is None:
                    agg[(a, b)] = [ts, ts, 1]
                else:
                    cur[0] = min(cur[0], ts)
                    cur[1] = max(cur[1], ts)
                    cur[2] += 1
        keys = sorted(agg)
        return pa.table(
            {
                "subj": pa.array([k[0] for k in keys], pa.string()),
                "obj": pa.array([k[1] for k in keys], pa.string()),
                "first_us": pa.array([agg[k][0] for k in keys], pa.int64()),
                "last_us": pa.array([agg[k][1] for k in keys], pa.int64()),
                "weight": pa.array([agg[k][2] for k in keys], pa.int64()),
            }
        )

    agg_ds = partitioned_key_agg(
        unigram_doc_entities(sf_dir).map_batches(
            pair_partials, batch_format="pyarrow"
        ),
        keys=["subj", "obj"],
        aggs=[
            ("first_us", "min"),
            ("last_us", "max"),
            ("weight", "sum"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                    "first_seen": pa.array([], pa.timestamp("us")),
                    "last_seen": pa.array([], pa.timestamp("us")),
                }
            )
        return pa.table(
            {
                "subj": t["subj"],
                "obj": t["obj"],
                "weight": t["weight"],
                "first_seen": t["first_us"].cast(pa.timestamp("us")),
                "last_seen": t["last_us"].cast(pa.timestamp("us")),
            }
        )

    return agg_ds.map_batches(finish, batch_format="pyarrow")


def negative_samples(edges_ds, k: int = 2,
                     num_partitions: int | None = None):
    """Corrupted-triple negative sampling — the training-data generator
    a KG/graph-embedding stage (TransE/DistMult) consumes: for every
    positive (subj, obj) edge (subj < obj, caller-supplied — e.g. the
    thresholded bigram collocation graph; the dense unigram entity
    graph on the test corpus is COMPLETE, leaving no valid negatives),
    ``k`` deterministic candidate corruptions of
    the object side, filtered so the corruption is neither endpoint of
    the positive nor itself a true edge. Candidate index =
    ``md5_64(subj|obj|i) % |vocab|`` over the ascending entity vocab —
    a pure content hash, identical at any parallelism, mirrored bit-
    for-bit by the SQL twin. Output (subj, obj, neg_obj, neg_i);
    filtered candidates simply emit no row (standard practice — the
    trainer resamples next epoch via a different ``i`` base).

    Scale shape: the entity vocab is DICTIONARY-BOUNDED (the same
    contract as the trie state), so the ascending-vocab array is a
    one-time ``ray.put`` broadcast; the true-edge membership test is a
    left-outer ``cogroup_join`` anti-join on the unordered pair key —
    the (possibly vocab^2-sized) edge table co-partitions instead of
    broadcasting."""
    import numpy as np

    import ray

    from autoner_ray.functions.hashing import md5_64
    from autoner_ray.stages.joins import cogroup_join

    positives = edges_ds.materialize()
    # dictionary-bounded vocab: ascending entity order -> stable index
    ents = sorted(
        set(
            positives.select_columns(["subj"]).to_pandas()["subj"]
        ) | set(
            positives.select_columns(["obj"]).to_pandas()["obj"]
        )
    )
    vocab_ref = ray.put(np.array(ents, dtype=object))

    # single combined pair key: the one-column string path of the
    # stable partitioner is memoized + vectorized (the multi-column
    # fallback is a per-row loop — ADVICE r3)
    _cand_schema = pa.schema(
        [
            ("pair", pa.string()),
            ("subj", pa.string()), ("obj", pa.string()),
            ("neg_obj", pa.string()), ("neg_i", pa.int64()),
        ]
    )

    class Corrupt:
        def __init__(self) -> None:
            self.vocab = ray.get(vocab_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _cand_schema.empty_table()
            n = len(self.vocab)
            lo, subj, obj, neg, idx = [], [], [], [], []
            for s, o in zip(t["subj"].to_pylist(), t["obj"].to_pylist()):
                for i in range(1, k + 1):
                    cand = self.vocab[md5_64(f"{s}|{o}|{i}") % n]
                    if cand == s or cand == o:
                        continue
                    a, b = (s, cand) if s < cand else (cand, s)
                    lo.append(f"{a}|{b}")
                    subj.append(s)
                    obj.append(o)
                    neg.append(cand)
                    idx.append(i)
            return pa.table(
                {
                    "pair": pa.array(lo, pa.string()),
                    "subj": pa.array(subj, pa.string()),
                    "obj": pa.array(obj, pa.string()),
                    "neg_obj": pa.array(neg, pa.string()),
                    "neg_i": pa.array(idx, pa.int64()),
                },
                schema=_cand_schema,
            )

    _edge_schema = pa.schema(
        [("pair", pa.string()), ("hit", pa.int64())]
    )

    def edge_keys(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _edge_schema.empty_table()
        import pyarrow.compute as pc

        # positives keep subj < obj by construction
        return pa.table(
            {
                "pair": pc.binary_join_element_wise(
                    t["subj"], t["obj"], "|"
                ),
                "hit": pa.array([1] * len(t), pa.int64()),
            },
            schema=_edge_schema,
        )

    cands = positives.map_batches(
        Corrupt, batch_format="pyarrow", concurrency=2
    )
    edges = positives.map_batches(edge_keys, batch_format="pyarrow")
    _out_schema = pa.schema(
        [
            ("subj", pa.string()), ("obj", pa.string()),
            ("neg_obj", pa.string()), ("neg_i", pa.int64()),
        ]
    )

    def survivors(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _out_schema.empty_table()
        import pyarrow.compute as pc

        keep = pc.is_null(t["hit"])
        return pa.table(
            {
                "subj": t["subj"].filter(keep),
                "obj": t["obj"].filter(keep),
                "neg_obj": t["neg_obj"].filter(keep),
                "neg_i": t["neg_i"].filter(keep),
            },
            schema=_out_schema,
        )

    from autoner_ray.stages.combine import materialize_or_empty

    # a fully-filtered candidate set (dense graphs leave no valid
    # corruption) must still present the contract schema
    return materialize_or_empty(
        cogroup_join(
            cands, edges, on=("pair",), num_partitions=num_partitions,
            join_type="left outer",
        ).map_batches(survivors, batch_format="pyarrow"),
        _out_schema,
    )


def community_modularity(sf_dir: str, rounds: int = 4):
    """Exact Newman modularity of the label-propagation communities
    over the unigram co-occurrence graph — the quality number that
    tells you whether the partition is better than chance. Computed in
    EXACT integers: with m = total edge weight, W_c = intra-community
    weight and S_c = community weighted degree,
    ``Q * 4m^2 = Σ_c (4m·W_c − S_c²)`` is an integer, and the emitted
    ``modularity_ppm`` is its floor-scaled ppm — bit-identical to the
    SQL twin, which reuses the unrolled vote-argmax community CTE. One
    row: (n_communities, intra_weight, total_weight, modularity_ppm).

    Scale shape: the community table is vocab-bounded (the
    label-propagation contract); edge sums are single passes over the
    aggregated pair table."""
    import numpy as np

    from autoner_ray.stages.graph import label_propagation

    edges = unigram_triples(sf_dir).materialize()
    comm_t = label_propagation(edges, rounds=rounds)
    comm = dict(zip(comm_t["entity"].to_pylist(),
                    comm_t["community"].to_pylist()))
    pdf = edges.to_pandas()
    w = pdf["weight"].to_numpy(np.int64)
    m = int(w.sum())
    ca = pdf["subj"].map(comm)
    cb = pdf["obj"].map(comm)
    intra_mask = (ca == cb).to_numpy()
    intra = int(w[intra_mask].sum())
    import collections

    W_c: dict = collections.Counter()
    for c, wt in zip(ca[intra_mask], w[intra_mask]):
        W_c[c] += int(wt)
    S_c: dict = collections.Counter()
    for c, wt in zip(ca, w):
        S_c[c] += int(wt)
    for c, wt in zip(cb, w):
        S_c[c] += int(wt)
    communities = set(comm.values())
    q_num = sum(
        4 * m * W_c.get(c, 0) - S_c.get(c, 0) ** 2 for c in communities
    )
    modularity_ppm = (q_num * 1_000_000) // (4 * m * m) if m else 0
    return pa.table(
        {
            "n_communities": pa.array([len(communities)], pa.int64()),
            "intra_weight": pa.array([intra], pa.int64()),
            "total_weight": pa.array([m], pa.int64()),
            "modularity_ppm": pa.array([modularity_ppm], pa.int64()),
        }
    )


def unigram_c4(sf_dir: str):
    """4-cycle census over the unigram co-occurrence graph (see
    ``stages/graph.py::c4_count`` for the diagonal-pair identity)."""
    from autoner_ray.stages.graph import c4_count

    return c4_count(unigram_triples(sf_dir))


def transitivity_null_model(sf_dir: str):
    """Global transitivity vs its configuration-model expectation —
    the null-model test that says whether the graph's clustering is
    structure or just degree sequence: with S1 = Σk, S2 = Σk² over the
    deduped undirected degrees, E[C] under the configuration model is
    the EXACT integer ratio (S2−S1)² / S1³, and actual transitivity is
    3·Δ / wedges with Δ the triangle total and wedges = Σ C(k,2) —
    every quantity an integer, both ratios floored to ppm. One row:
    (n_triangles, n_wedges, transitivity_ppm, config_expected_ppm).

    Scale shape: degrees/moments ride the endpoint combine (tiny
    partials); the triangle total reuses the pinned compact-forward
    counter."""
    import numpy as np

    from autoner_ray.stages.graph import triangle_counts

    edges = unigram_triples(sf_dir).materialize()
    tri = triangle_counts(edges)
    tri_t = tri if isinstance(tri, pa.Table) else pa.concat_tables(
        [b for b in tri.iter_batches(batch_format="pyarrow")]
    )
    n_triangles = int(sum(tri_t["triangles"].to_pylist())) // 3
    pdf = edges.to_pandas()
    import collections

    deg: dict = collections.Counter()
    for a, b in zip(pdf["subj"], pdf["obj"]):
        deg[a] += 1
        deg[b] += 1
    ks = np.array(list(deg.values()), np.int64)
    s1 = int(ks.sum())
    s2 = int((ks * ks).sum())
    wedges = int((ks * (ks - 1) // 2).sum())
    transitivity_ppm = (3 * n_triangles * 1_000_000) // wedges if wedges else 0
    expected_ppm = ((s2 - s1) ** 2 * 1_000_000) // (s1 ** 3) if s1 else 0
    return pa.table(
        {
            "n_triangles": pa.array([n_triangles], pa.int64()),
            "n_wedges": pa.array([wedges], pa.int64()),
            "transitivity_ppm": pa.array(
                [transitivity_ppm], pa.int64()
            ),
            "config_expected_ppm": pa.array([expected_ppm], pa.int64()),
        }
    )


def relation_cardinality(sf_dir: str):
    """Relation-cardinality schema induction over the typed
    co-occurrence graph — the KG-modeling question "is (TypeA,
    cooccurs, TypeB) one-to-one, one-to-many or many-to-many?",
    answered from data: for every ORDERED type pair, the max number of
    distinct B-partners any single A-entity has (fwd fanout), the
    reverse direction's max (bwd), and the derived class
    (1:1 / 1:N / N:1 / M:N). Output (type_a, type_b, n_pairs,
    max_fanout, cardinality).

    Scale shape: the aggregated edge table is dictionary-bounded (the
    unigram vocab contract), so the per-type-pair fanout maxes fold on
    the driver after the standard edge collect; at open-vocab scale
    the same maxes ride a (type_a, type_b, entity)-keyed
    partitioned combine."""
    import collections

    from autoner_ray.dicts import UNIGRAM_DICT

    edges = unigram_triples(sf_dir).to_pandas()
    # UNIGRAM_DICT maps word -> (entity, type); derive entity -> type
    etype = {}
    for w, v in UNIGRAM_DICT.items():
        ent, typ = v
        etype[ent] = typ
    fan: dict = collections.defaultdict(set)
    pair_counts: dict = collections.Counter()
    for a, b in zip(edges["subj"], edges["obj"]):
        ta, tb = etype[a], etype[b]
        fan[(ta, tb, a)].add(b)
        fan[(tb, ta, b)].add(a)
        pair_counts[(ta, tb)] += 1
        pair_counts[(tb, ta)] += 1
    maxf: dict = collections.Counter()
    for (ta, tb, _), partners in fan.items():
        maxf[(ta, tb)] = max(maxf[(ta, tb)], len(partners))
    rows = []
    for (ta, tb), n in sorted(pair_counts.items()):
        fwd = maxf[(ta, tb)]
        bwd = maxf[(tb, ta)]
        cls = (
            "1:1" if fwd == 1 and bwd == 1
            else "1:N" if fwd > 1 and bwd == 1
            else "N:1" if fwd == 1 and bwd > 1
            else "M:N"
        )
        rows.append((ta, tb, int(n), int(fwd), cls))
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_pairs": pa.array([r[2] for r in rows], pa.int64()),
            "max_fanout": pa.array([r[3] for r in rows], pa.int64()),
            "cardinality": pa.array([r[4] for r in rows], pa.string()),
        }
    )


def unigram_local_clustering(sf_dir: str):
    """Per-entity LOCAL clustering coefficient over the unigram
    co-occurrence graph — the node-level companion of the global
    transitivity row: lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)) in
    integer-floored ppm (0 when deg < 2). Output
    (entity, degree, triangles, lcc_ppm) for every graph node.

    Scale shape: triangles ride the pinned compact-forward counter
    (:func:`graph.triangle_counts` — O(m^1.5) wedges); degrees are the
    endpoint bounded combine; the final join/arith runs driver-side
    over the DICTIONARY-BOUNDED entity vocab (the pagerank contract)."""
    import collections

    import numpy as np

    from autoner_ray.stages.graph import triangle_counts

    edges = unigram_triples(sf_dir).materialize()
    tri = triangle_counts(edges)
    tri_t = tri if isinstance(tri, pa.Table) else pa.concat_tables(
        [b for b in tri.iter_batches(batch_format="pyarrow")]
    )
    tri_map = dict(zip(tri_t["entity"].to_pylist(),
                       tri_t["triangles"].to_pylist()))
    pdf = edges.to_pandas()
    deg: collections.Counter = collections.Counter()
    for a, b in zip(pdf["subj"], pdf["obj"]):
        deg[a] += 1
        deg[b] += 1
    ents = sorted(deg)
    d = np.array([deg[e] for e in ents], np.int64)
    t = np.array([int(tri_map.get(e, 0)) for e in ents], np.int64)
    denom = d * (d - 1)
    lcc = np.where(
        denom > 0, (2_000_000 * t) // np.maximum(denom, 1), 0
    ).astype(np.int64)
    return pa.table(
        {
            "entity": pa.array(ents, pa.string()),
            "degree": pa.array(d, pa.int64()),
            "triangles": pa.array(t, pa.int64()),
            "lcc_ppm": pa.array(lcc, pa.int64()),
        }
    )


def unigram_bipartite_projection(sf_dir: str):
    """Newman-weighted one-mode projection of the doc-entity bipartite
    graph: each doc with k >= 2 entities contributes weight
    ``1/(k-1)`` to every entity pair it contains (Newman 2001's
    collaboration weighting — a doc mentioning 20 entities says less
    about any one pair than a doc mentioning 2), quantized to integer
    micro-units per doc BEFORE summation so partials merge
    order-independently and match the SQL twin exactly. Output
    (subj, obj, n_docs, w_micro) with subj < obj.

    Scale shape: per-batch pair partials pre-aggregate (the
    pair_counts_batch pattern with a weight column), then the one
    subj-keyed shuffle of :func:`triples.aggregate_edges`'s combine
    shape — no new machinery, no driver state."""
    import pandas as pd

    from autoner_ray.stages.combine import partitioned_key_agg

    docs = unigram_doc_entities(sf_dir)

    _p_schema = pa.schema(
        [("subj", pa.string()), ("obj", pa.string()),
         ("n_docs", pa.int64()), ("w_micro", pa.int64())]
    )

    def pair_partials(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _p_schema.empty_table()
        s_col, o_col, w_col = [], [], []
        for ents in t["entities"].to_pylist():
            k = len(ents)
            if k < 2:
                continue
            w = int(1_000_000 // (k - 1))
            for i in range(k):
                for j in range(i + 1, k):
                    s_col.append(ents[i])
                    o_col.append(ents[j])
                    w_col.append(w)
        part = pa.table(
            {
                "subj": pa.array(s_col, pa.string()),
                "obj": pa.array(o_col, pa.string()),
                "n_docs": pa.array([1] * len(s_col), pa.int64()),
                "w_micro": pa.array(w_col, pa.int64()),
            },
            schema=_p_schema,
        )
        agg = part.group_by(["subj", "obj"]).aggregate(
            [("n_docs", "sum"), ("w_micro", "sum")]
        )
        return agg.rename_columns(["subj", "obj", "n_docs", "w_micro"])

    return partitioned_key_agg(
        docs.map_batches(pair_partials, batch_format="pyarrow"),
        keys=["subj", "obj"],
        aggs=[("n_docs", "sum"), ("w_micro", "sum")],
        part_on=("subj",),
    )
