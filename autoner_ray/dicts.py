"""Deterministic built-in dictionaries for the synthetic web corpus.

The driver's test tables (`/root/testdata/sf*/documents.parquet`) carry
word-salad text over a 31-word vocabulary. These dictionaries are defined
over that vocabulary so expected mentions/triples are computable by both
the pure-python oracle and DuckDB SQL. Format matches the reference's
dictionary contract (README.md:51-56, src/annotation.h:181-217):
``types<TAB>surface`` core rows, bare-phrase full rows, unigram stopwords.

The final core row is typed ``PER`` on purpose: it exercises the
reference's ``noLowercasesForThisKB`` carry-over quirk
(src/annotation.h:184,196,214) which our trie replicates.
"""

from __future__ import annotations

# typed core dictionary (multi-token + unigram + multi-type rows)
CORE_DICT: list[str] = [
    "Operator\thash join",
    "Operator\tsort merge",
    "Operator\ttable scan",
    "Operator\tfilter",
    "Operator\tagg",
    "Operator,Clause\torder",
    "Structure\trow",
    "Structure\tcolumn",
    "Structure\tvector",
    "Structure\tbatch",
    "System\tspark",
    "PER\tcustomer",
]

# untyped high-quality phrases -> __FILTERED__ (unknown/dangerous spans)
FULL_DICT: list[str] = [
    "big data",
    "data stream",
    "key value",
    "window agg",
    "small batch",
    "fast scan",
]

STOPWORDS: list[str] = [
    "a",
    "the",
]

# unigram-only dictionary for the SQL-checkable pipeline variant
# (word -> (entity_id, type)); canonical entity id == the word itself.
UNIGRAM_DICT: dict[str, tuple[str, str]] = {
    "join": ("join", "Operator"),
    "sort": ("sort", "Operator"),
    "merge": ("merge", "Operator"),
    "filter": ("filter", "Operator"),
    "scan": ("scan", "Operator"),
    "agg": ("agg", "Operator"),
    "row": ("row", "Structure"),
    "column": ("column", "Structure"),
    "vector": ("vector", "Structure"),
    "table": ("table", "Structure"),
    "spark": ("spark", "System"),
    "customer": ("customer", "Party"),
}


def unigram_dict_sql_values() -> str:
    """The unigram dictionary as a SQL VALUES list (word, entity, type)."""
    rows = ", ".join(
        f"('{w}', '{e}', '{t}')" for w, (e, t) in sorted(UNIGRAM_DICT.items())
    )
    return f"(VALUES {rows}) AS dict(word, entity, type)"
