"""Web-corpus curation operators: Gopher repetition signals, hot-n-gram
boilerplate profile, RE2 pattern counts and PII scrubbing."""

import duckdb
import pyarrow as pa
import pytest

from autoner_ray.stages import webtext


def _docs_table(texts):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_repetition_hand_computed():
    # "a a a b": top word 3/4, dup 1 - 2/4; no 5-grams -> 0.0
    # "x y z w v x y z w v": 10 words, all 5-grams; grams:
    #   6 grams total, "x y z w v" appears twice -> dist 5 -> 1-5/6
    t = webtext.repetition_batch(
        _docs_table(["a a a b", "x y z w v x y z w v"])
    ).to_pandas()
    assert t.loc[0, "n_words"] == 4
    assert t.loc[0, "top_word_frac"] == 0.75
    assert t.loc[0, "dup_word_frac"] == 0.5
    assert t.loc[0, "dup_ngram_frac"] == 0.0
    assert t.loc[1, "n_words"] == 10
    assert t.loc[1, "dup_word_frac"] == 0.5
    assert t.loc[1, "dup_ngram_frac"] == round(1 - 5 / 6, 6)


def test_repetition_batch_split_invariant():
    """Per-doc signals can't depend on how docs are batched."""
    texts = [
        "the cat sat on the mat the cat sat on",
        "q w e r t y",
        "z z z z z z z z",
        "",
        "one",
    ]
    t = _docs_table(texts)
    whole = webtext.repetition_batch(t).to_pandas()
    split = (
        pa.concat_tables(
            [
                webtext.repetition_batch(t.slice(0, 2)),
                webtext.repetition_batch(t.slice(2)),
            ]
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert whole.equals(split)


def test_repetition_matches_duckdb_oracle():
    texts = [
        "spam spam spam spam spam spam",
        "a b c d e f g a b c d e f g",
        "lone",
    ]
    t = _docs_table(texts)
    eng = (
        webtext.repetition_batch(t)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    ora = (
        con.execute(webtext.repetition_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)[eng.columns]
    )
    assert eng.equals(ora)


def test_hot_ngrams_dataset(ray_session):
    import ray.data as rd

    texts = [
        "click here to subscribe now please",
        "intro text click here to subscribe now",
        "click here to subscribe now again and again",
        "unrelated words entirely here",
    ]
    t = _docs_table(texts)
    got = (
        webtext.hot_ngrams(rd.from_arrow(t), n=5, min_df=2, k=3)
        .to_pandas()
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(
        webtext.hot_ngrams_oracle_sql(n=5, min_df=2, k=3)
    ).df()
    assert got["gram"].tolist() == want["gram"].tolist()
    assert got["gram"][0] == "click here to subscribe now"
    assert got["n_occurrences"][0] == 3
    assert got["n_docs"][0] == 3


def test_pattern_counts_synthetic_pii():
    texts = [
        "contact bob@example.com or alice@test.org today",
        "server at 10.0.0.1 and 192.168.1.255 fell over",
        "call 555-867-5309 now",
        "nothing sensitive here",
        None,
    ]
    t = _docs_table(texts)
    got = webtext.pattern_counts_batch(t).to_pandas()
    assert got["n_email"].tolist() == [2, 0, 0, 0, 0]
    assert got["n_ipv4"].tolist() == [0, 2, 0, 0, 0]
    assert got["n_phone"].tolist() == [0, 0, 1, 0, 0]
    # DuckDB twin agrees (RE2 on both sides)
    con = duckdb.connect()
    con.register("documents", t)
    ora = con.execute(webtext.pattern_counts_oracle_sql()).df()
    assert got.equals(ora[got.columns])


def test_pii_scrub_redacts_in_place():
    t = _docs_table(
        ["mail bob@example.com from 10.0.0.1 phone 555-867-5309", "clean"]
    )
    out = webtext.pii_scrub_batch(t).to_pandas()
    assert out["text"][0] == "mail [EMAIL] from [IP] phone [PHONE]".replace(
        "[IP]", "[IPV4]"
    )
    assert out["text"][1] == "clean"
    assert out["doc_id"].tolist() == [0, 1]


def test_temperature_sample_rebalances_and_matches_oracle(ray_session):
    """τ<1 downsamples the head language toward the tail; the keep-set
    is deterministic and equal to the DuckDB twin."""
    import duckdb
    import pyarrow.parquet as pq
    import ray.data as rd

    from autoner_ray.stages.analysis import (
        temperature_sample,
        temperature_sample_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    ds = rd.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "text"]
    )
    got = (
        temperature_sample(ds, tau=0.7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{sf}/documents.parquet"))
    want = (
        con.execute(temperature_sample_oracle_sql(tau=0.7))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want[got.columns])
    mix = got["lang"].value_counts()
    full = con.execute(
        "SELECT lang, COUNT(*) n FROM documents GROUP BY lang"
    ).df().set_index("lang")["n"]
    # the head (en) loses a larger fraction than the rarest language
    assert mix["en"] / full["en"] < mix[full.idxmin()] / full.min()


def test_gopher_quality_hand_computed(ray_session):
    import ray.data as rd

    # doc 0: wc=3 -> fails r_wc; "the a the": stop_n=3, top=2
    # doc 1: 25 words "w01..w20 the a the a x" all distinct-ish
    words = [f"wrd{i:02d}" for i in range(20)] + ["the", "a", "the", "a", "x"]
    texts = ["the a the", " ".join(words)]
    ds = rd.from_arrow(_docs_table(texts))
    out = (
        webtext.gopher_quality(ds)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert out.loc[0, "wc"] == 3 and out.loc[0, "r_wc"] == 0
    assert out.loc[0, "keep"] == 0
    assert out.loc[1, "wc"] == 25 and out.loc[1, "r_wc"] == 1
    # doc 1: top word "the"=2, 2*10 <= 25 -> r_rep=1;
    # distinct 22, 22*5 >= 2*25 -> r_distinct=1; stop_n=4 -> r_stop=1
    assert out.loc[1, "r_rep"] == 1
    assert out.loc[1, "r_distinct"] == 1
    assert out.loc[1, "r_stop"] == 1
    # mean word length: 20*5 + 3+1+3+1+1 = 109 chars over 25 words
    # -> 10*109=1090 vs [43*25, 47*25]=[1075,1175] -> r_mwl=1, keep=1
    assert out.loc[1, "r_mwl"] == 1 and out.loc[1, "keep"] == 1


def test_gopher_quality_matches_duckdb_on_corpus(ray_session, sf_dir):
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    eng = (
        webtext.gopher_quality(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    ora = (
        con.execute(webtext.gopher_quality_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (eng[eng.columns] == ora[eng.columns]).all().all()
