"""Sentence split + tokenization (stateless map_batches stage).

Emits ONE ROW PER SENTENCE (SURVEY.md §1.3): the sentence is the natural
parallel unit because dictionary matching never crosses it
(src/string_match.h:35-37). Token stream semantics: ``simpleTokenize``
(src/utils.h:195-231) with single-char WHITESPACE tokens dropped — this
reproduces the reference's pre-tokenized corpus contract (one token per
line, punctuation tokens kept, whitespace only a delimiter;
src/generate.cpp:23-32 + data/BC5CDR/raw_text.txt layout). Case is kept
(the trie holds case variants).

Output schema:
    url: string, doc_id: int64, sent_id: int32, n_tokens: int32,
    tokens: list<string>
"""

from __future__ import annotations

import pyarrow as pa

from autoner_ray.functions.text import simple_tokenize
from autoner_ray.sources.pages import URL_PREFIX

_WHITESPACE_TOKENS = frozenset(" \t\v\f\r")


def sentence_token_stream(sentence: str) -> list[str]:
    """Tokens of one sentence: separators kept, whitespace dropped."""
    return [t for t in simple_tokenize(sentence) if t not in _WHITESPACE_TOKENS]


def split_sentences(text: str) -> list[str]:
    """Newline is the sentence sentinel (src/generate.cpp:26-30)."""
    return [s for s in text.split("\n") if s.strip()]


def _doc_id_from_url(url: str) -> int:
    if url.startswith(URL_PREFIX):
        try:
            return int(url[len(URL_PREFIX):])
        except ValueError:
            pass
    return -1


def tokenize_pages_batch(batch: pa.Table) -> pa.Table:
    urls: list[str] = []
    doc_ids: list[int] = []
    sent_ids: list[int] = []
    token_lists: list[list[str]] = []
    for url, text in zip(batch["url"].to_pylist(), batch["text"].to_pylist()):
        did = _doc_id_from_url(url)
        for sid, sent in enumerate(split_sentences(text or "")):
            toks = sentence_token_stream(sent)
            if not toks:
                continue
            urls.append(url)
            doc_ids.append(did)
            sent_ids.append(sid)
            token_lists.append(toks)
    from autoner_ray.schemas import check

    return check(
        pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sent_id": pa.array(sent_ids, type=pa.int32()),
                "n_tokens": pa.array(
                    [len(t) for t in token_lists], type=pa.int32()
                ),
                "tokens": pa.array(token_lists, type=pa.list_(pa.string())),
            }
        ),
        "sentences",
    )
