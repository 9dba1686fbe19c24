"""Flagship KG-construction pipeline (north rule end-to-end).

    read pages -> extract_text -> tokenize (sentence rows)
      -> DictMatcher actor pool (trie + segmentDP)
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

DEFAULT_MATCH_CONCURRENCY = 4
DEFAULT_BATCH_SIZE = 1024


def pages_dataset(sf_dir: str):
    return read_pages(sf_dir)


def extracted_pages(sf_dir: str):
    return pages_dataset(sf_dir).map_batches(
        extract_text_batch, batch_format="pyarrow"
    )


def sentences_dataset(sf_dir: str):
    return extracted_pages(sf_dir).map_batches(
        tokenize_pages_batch, batch_format="pyarrow"
    )


def matched_sentences(
    sf_dir: str,
    concurrency: int = DEFAULT_MATCH_CONCURRENCY,
    output: str = "sentences",
):
    """Actor-pool dictionary match over sentence rows."""
    return sentences_dataset(sf_dir).map_batches(
        DictMatcher,
        fn_constructor_kwargs={
            "core_lines": CORE_DICT,
            "full_lines": FULL_DICT,
            "stopword_lines": STOPWORDS,
            "output": output,
        },
        batch_format="pyarrow",
        batch_size=DEFAULT_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


def triples_dataset(sf_dir: str, concurrency: int = DEFAULT_MATCH_CONCURRENCY):
    """Full-pipeline edges: (subj, pred, obj, weight)."""
    pairs = matched_sentences(sf_dir, concurrency).map_batches(
        pair_counts_batch, batch_format="pyarrow"
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
    """Per-type count of matched (doc, entity) pairs — SQL-checkable."""
    from ray.data.aggregate import Sum
    from collections import Counter

    type_of = {e: t for e, t in UNIGRAM_DICT.values()}

    def explode(batch: pa.Table) -> pa.Table:
        counter: Counter[str] = Counter()
        for ents in batch["entities"].to_pylist():
            for e in ents:
                counter[type_of[e]] += 1
        return pa.table(
            {
                "type": pa.array(list(counter.keys()), pa.string()),
                "n": pa.array(list(counter.values()), pa.int64()),
            }
        )

    return (
        unigram_doc_entities(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .groupby("type")
        .aggregate(Sum("n", alias_name="mentions"))
    )


def unigram_triples(sf_dir: str):
    """Doc-scoped co-occurrence edges over the unigram dictionary."""
    pairs = unigram_doc_entities(sf_dir).map_batches(
        pair_counts_batch, batch_format="pyarrow"
    )
    return aggregate_edges(pairs)


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
