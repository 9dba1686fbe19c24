"""Degenerate-input robustness: empty batches, empty texts, null rows."""

from __future__ import annotations

import pyarrow as pa


def _empty_sentences_table():
    return pa.table(
        {
            "url": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "sent_id": pa.array([], pa.int32()),
            "tokens": pa.array([], pa.list_(pa.string())),
        }
    )


def test_dict_matcher_empty_batch_all_outputs():
    from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS
    from autoner_ray.stages.dict_match import DictMatcher

    for output in ("sentences", "mentions", "annotations", "pairs",
                   "typed_pairs", "pairs_ev"):
        dm = DictMatcher(CORE_DICT, FULL_DICT, STOPWORDS, output=output)
        out = dm(_empty_sentences_table())
        assert out.num_rows == 0


def test_tokenize_empty_and_null_text():
    from autoner_ray.stages.extract import extract_text_batch
    from autoner_ray.stages.tokenize import tokenize_pages_batch

    pages = pa.table(
        {
            "url": ["https://example.org/doc/1", "https://example.org/doc/2"],
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": pa.array([b"<html></html>", b"<p>hi</p>"], pa.binary()),
            "text": pa.array([None, None], pa.string()),
            "lang": ["en", "en"],
        }
    )
    ex = extract_text_batch(pages)
    assert ex["text"].to_pylist() == ["", "hi"]
    sents = tokenize_pages_batch(ex)
    # empty text yields no sentence rows; "hi" yields one
    assert sents.num_rows == 1


def test_pair_counts_empty_entities():
    from autoner_ray.stages.triples import pair_counts_batch

    batch = pa.table(
        {"entities": pa.array([[], ["solo"]], pa.list_(pa.string()))}
    )
    out = pair_counts_batch(batch)
    assert out.num_rows == 0  # no pair from empty or singleton sets


def test_tagger_empty_sentence_list():
    from autoner_ray.state.tagger import Tagger

    with open("/root/repo/autoner_ray/artifacts/tagger_demo.npz", "rb") as f:
        tg = Tagger.from_bytes(f.read())
    assert tg.predict_batch([]) == []
    # single one-word sentence decodes without error
    preds = tg.predict_batch([["filter"]])
    assert isinstance(preds[0], list)


def test_segment_dp_empty_tokens():
    from autoner_ray.dicts import CORE_DICT, FULL_DICT, STOPWORDS
    from autoner_ray.state.trie import build_trie, segment_dp

    trie = build_trie(list(CORE_DICT), list(FULL_DICT), list(STOPWORDS))
    assert segment_dp(trie, []) == []
