"""Declared Arrow schemas for every stage boundary (SURVEY §1.3).

The reference's implicit line-format contracts (column-count asserts in
`preprocess_partial_ner/encode_folder.py:39-44`) become explicit pyarrow
schemas here. ``check(batch, name)`` is cheap (name/type comparison, no
data scan) and is wired into the pipeline seams; it turns a silent
column drift into an immediate, named error.
"""

from __future__ import annotations

import pyarrow as pa

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

EXTRACTED = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

SENTENCES = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.int64()),
        ("sent_id", pa.int32()),
        ("n_tokens", pa.int32()),
        ("tokens", pa.list_(pa.string())),
    ]
)

MENTIONS = pa.schema(
    [
        ("url", pa.string()),
        ("doc_id", pa.int64()),
        ("sent_id", pa.int32()),
        ("l", pa.int32()),
        ("r", pa.int32()),
        ("surface", pa.string()),
        ("types", pa.string()),
        ("canon", pa.string()),
    ]
)

EDGE_PARTIALS = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("w", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("weight", pa.int64()),
    ]
)

_REGISTRY = {
    "pages": PAGES,
    "extracted": EXTRACTED,
    "sentences": SENTENCES,
    "mentions": MENTIONS,
    "edge_partials": EDGE_PARTIALS,
    "edges": EDGES,
}


def check(batch: pa.Table, name: str) -> pa.Table:
    """Assert ``batch`` matches the declared schema ``name``; returns the
    batch unchanged so it can sit inline in a stage expression."""
    want = _REGISTRY[name]
    got = batch.schema
    if got.names != want.names or any(
        not got.field(i).type.equals(want.field(i).type)
        for i in range(len(want))
    ):
        raise TypeError(
            f"stage boundary '{name}' schema mismatch:\n"
            f"  want: {want}\n  got:  {got}"
        )
    return batch
