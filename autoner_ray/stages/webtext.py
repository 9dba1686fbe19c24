"""Web-corpus curation operators (engine extensions, no reference
counterpart — the reference is a corpus-NER system; these are the
standard web-text quality/boilerplate passes a 100-TB training-data
pipeline runs BEFORE distant supervision: Gopher-style repetition
signals (Rae et al. 2021, §A1.1), C4/CCNet-style boilerplate n-gram
profiling, and RE2 pattern counting / PII scrubbing).

All kernels are stateless ``map_batches`` transforms; the only shuffle
(hot_ngrams) moves per-batch pre-combined gram partials, never the
exploded corpus. Floats are rounded to 6 dp on BOTH sides (engine +
DuckDB oracle) so the driver value-hash is stable.

Tokenization here is plain ``text.split(' ')`` — deliberately identical
to DuckDB ``string_split(text, ' ')`` (NOT ``sentence_token_stream``)
so every kernel stays SQL-twinnable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _exploded(texts: list[str | None]) -> pd.DataFrame:
    """(i, w) rows: doc index -> word, in document order."""
    s = pd.Series([(t or "").split(" ") for t in texts])
    return (
        pd.DataFrame({"i": np.arange(len(texts)), "w": s})
        .explode("w", ignore_index=True)
    )


def _gram_frame(df: pd.DataFrame, n: int) -> pd.DataFrame:
    """(i, g) rows: doc index -> space-joined word n-gram.

    Vectorized: n-1 shifts of the exploded word column, row j is a
    valid gram iff rows j..j+n-1 belong to the same doc.
    """
    w = df["w"].astype(str)
    i = df["i"].to_numpy()
    parts = [w]
    for s in range(1, n):
        parts.append(w.shift(-s))
    valid = np.zeros(len(df), dtype=bool)
    if len(df) >= n:
        valid[: len(df) - (n - 1)] = i[: len(df) - (n - 1)] == i[n - 1 :]
    gram = parts[0].str.cat(parts[1:], sep=" ")
    return pd.DataFrame({"i": i[valid], "g": gram.to_numpy()[valid]})


def repetition_batch(batch: pa.Table, n: int = 5) -> pa.Table:
    """Per-doc Gopher repetition signals (Rae et al. 2021, table A1):

    - ``top_word_frac``  — most-frequent-word count / n_words
    - ``dup_word_frac``  — 1 - distinct_words / n_words
    - ``dup_ngram_frac`` — 1 - distinct n-grams / total n-grams
      (0.0 when the doc has fewer than ``n`` words)

    High values flag machine-generated / boilerplate pages for the
    quality cut. Stateless and vectorized (pandas explode + shifted
    gram join) — scales as a pure map stage.
    """
    texts = batch["text"].to_pylist()
    df = _exploded(texts)
    n_rows = len(texts)

    counts = df.groupby(["i", "w"], sort=False).size()
    per_doc = counts.groupby(level=0)
    total = np.zeros(n_rows, dtype=np.float64)
    mx = np.zeros(n_rows, dtype=np.float64)
    dist = np.zeros(n_rows, dtype=np.float64)
    idx = per_doc.sum().index.to_numpy()
    total[idx] = per_doc.sum().to_numpy()
    mx[idx] = per_doc.max().to_numpy()
    dist[idx] = per_doc.size().to_numpy()

    grams = _gram_frame(df, n)
    g_counts = grams.groupby(["i", "g"], sort=False).size()
    g_per_doc = g_counts.groupby(level=0)
    g_total = np.zeros(n_rows, dtype=np.float64)
    g_dist = np.zeros(n_rows, dtype=np.float64)
    gidx = g_per_doc.sum().index.to_numpy()
    g_total[gidx] = g_per_doc.sum().to_numpy()
    g_dist[gidx] = g_per_doc.size().to_numpy()

    safe_total = np.maximum(total, 1.0)
    safe_g = np.maximum(g_total, 1.0)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_words": pa.array(total.astype(np.int64), pa.int64()),
            "top_word_frac": pa.array(
                np.round(mx / safe_total, 6), pa.float64()
            ),
            "dup_word_frac": pa.array(
                np.round(1.0 - dist / safe_total, 6), pa.float64()
            ),
            "dup_ngram_frac": pa.array(
                np.round(
                    np.where(g_total > 0, 1.0 - g_dist / safe_g, 0.0), 6
                ),
                pa.float64(),
            ),
        }
    )


def repetition_oracle_sql(n: int = 5) -> str:
    return f"""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        w AS (SELECT doc_id, unnest(ws) AS w FROM ws),
        c AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY doc_id, w),
        s AS (
            SELECT doc_id, SUM(c) AS total, MAX(c) AS mx,
                   COUNT(*) AS dist
            FROM c GROUP BY doc_id
        ),
        g AS (
            SELECT doc_id,
                   array_to_string(ws[CAST(i AS BIGINT):CAST(i AS BIGINT)+{n - 1}], ' ') AS g
            FROM ws, unnest(range(1, len(ws) - {n - 2})) AS t(i)
        ),
        gc AS (SELECT doc_id, g, COUNT(*) AS c FROM g GROUP BY doc_id, g),
        gs AS (
            SELECT doc_id, SUM(c) AS g_total, COUNT(*) AS g_dist
            FROM gc GROUP BY doc_id
        )
        SELECT s.doc_id,
               CAST(s.total AS BIGINT) AS n_words,
               round(s.mx / CAST(s.total AS DOUBLE), 6) AS top_word_frac,
               round(1.0 - s.dist / CAST(s.total AS DOUBLE), 6)
                   AS dup_word_frac,
               COALESCE(
                   round(1.0 - gs.g_dist / CAST(gs.g_total AS DOUBLE), 6),
                   0.0) AS dup_ngram_frac
        FROM s LEFT JOIN gs USING (doc_id)
    """


def hot_ngrams(docs_ds, n: int = 5, min_df: int = 2, k: int = 20):
    """Corpus-level boilerplate profile: the top-``k`` word ``n``-grams
    by total occurrences among grams appearing in ≥ ``min_df`` docs
    (ties broken lexicographically) — the C4/CCNet "find the repeated
    boilerplate phrases" pass that feeds span-level dedup.

    Scale shape: each batch pre-combines to (gram, n_occurrences,
    n_docs) partials — a doc is a single row, so batches partition docs
    and per-batch distinct-doc counts SUM exactly. One gram-vocab-sized
    hash shuffle, then partition-local top-k and a single tiny merge
    block; the exploded gram stream never shuffles and the driver never
    sees the vocab.
    """
    from ray.data.aggregate import Sum

    def gram_partial(batch: pa.Table) -> pa.Table:
        grams = _gram_frame(_exploded(batch["text"].to_pylist()), n)
        if grams.empty:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "occ": pa.array([], pa.int64()),
                    "docs": pa.array([], pa.int64()),
                }
            )
        agg = grams.groupby("g", sort=False)["i"].agg(["size", "nunique"])
        return pa.table(
            {
                "gram": pa.array(agg.index.to_numpy(), pa.string()),
                "occ": pa.array(agg["size"].to_numpy(), pa.int64()),
                "docs": pa.array(agg["nunique"].to_numpy(), pa.int64()),
            }
        )

    agg = (
        docs_ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(
            Sum("occ", alias_name="n_occurrences"),
            Sum("docs", alias_name="n_docs"),
        )
    )

    def topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[df["n_docs"] >= min_df]
        df = df.sort_values(
            ["n_occurrences", "gram"],
            ascending=[False, True],
            kind="mergesort",
        ).head(k)
        return pa.Table.from_pandas(
            df[["gram", "n_occurrences", "n_docs"]], preserve_index=False
        )

    # per-block partial top-k (vocab-bounded blocks -> <=k rows each),
    # then one tiny single-block merge
    return (
        agg.map_batches(topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def hot_ngrams_oracle_sql(n: int = 5, min_df: int = 2, k: int = 20) -> str:
    return f"""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        g AS (
            SELECT doc_id,
                   array_to_string(ws[CAST(i AS BIGINT):CAST(i AS BIGINT)+{n - 1}], ' ') AS gram
            FROM ws, unnest(range(1, len(ws) - {n - 2})) AS t(i)
        ),
        agg AS (
            SELECT gram, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM g GROUP BY gram
        )
        SELECT gram, n_occurrences, n_docs FROM agg
        WHERE n_docs >= {min_df}
        ORDER BY n_occurrences DESC, gram
        LIMIT {k}
    """


# RE2-syntax patterns, identical semantics in pyarrow (count_substring_regex)
# and DuckDB (regexp_extract_all) — both are RE2, leftmost non-overlapping.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}


def pattern_counts_batch(
    batch: pa.Table, patterns: dict[str, str] | None = None
) -> pa.Table:
    """doc_id + one ``n_<name>`` int64 column per named RE2 pattern
    (defaults: the PII set). Fully vectorized via Arrow's
    ``count_substring_regex`` — the scan-side PII / policy audit pass.
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    text = pc.fill_null(batch["text"], "")
    cols: dict[str, pa.Array | pa.ChunkedArray] = {"doc_id": batch["doc_id"]}
    for name, pat in pats.items():
        cols[f"n_{name}"] = pc.cast(
            pc.count_substring_regex(text, pat), pa.int64()
        )
    return pa.table(cols)


def pattern_counts_oracle_sql(patterns: dict[str, str] | None = None) -> str:
    pats = patterns if patterns is not None else PII_PATTERNS
    exprs = ",\n               ".join(
        "CAST(len(regexp_extract_all(COALESCE(text, ''), '{}')) AS BIGINT)"
        " AS n_{}".format(p.replace("'", "''"), name)
        for name, p in pats.items()
    )
    return f"SELECT doc_id,\n               {exprs}\n        FROM documents"


def pii_scrub_batch(
    batch: pa.Table, patterns: dict[str, str] | None = None
) -> pa.Table:
    """Redact PII matches in place: each named pattern's matches become
    ``[NAME]``. Vectorized ``replace_substring_regex`` chain; patterns
    applied in dict order (email before ipv4 before phone by default).
    """
    pats = patterns if patterns is not None else PII_PATTERNS
    text = pc.fill_null(batch["text"], "")
    for name, pat in pats.items():
        text = pc.replace_substring_regex(
            text, pat, f"[{name.upper()}]"
        )
    cols = {c: batch[c] for c in batch.column_names}
    cols["text"] = text
    return pa.table(cols)


def lang_hot_ngrams(docs_ds, n: int = 3, min_df: int = 2, k: int = 10):
    """Per-LANGUAGE boilerplate profile: for each language, the top-``k``
    word ``n``-grams by total occurrences among grams in ≥ ``min_df``
    docs of that language (ties lexicographic) — the grouped variant of
    :func:`hot_ngrams`, i.e. grouped top-k over an unbounded key space
    (the CCNet per-language boilerplate pass).

    Scale shape: per-batch (lang, gram) partials -> GRAM-partitioned
    combine (partitioning on the gram subset co-locates the full key
    while spreading each language's vocab across all partitions — a
    dominant language can't hot-spot) -> per-block per-language top-k
    (≤ |langs|·k rows per block) -> one tiny merge block.
    """
    from autoner_ray.stages.combine import partitioned_key_sum

    def gram_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "gram": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
                "docs": pa.array([], pa.int64()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        grams = _gram_frame(_exploded(batch["text"].to_pylist()), n)
        if grams.empty:
            return empty
        langs = batch["lang"].to_numpy(zero_copy_only=False)
        grams["lang"] = langs[grams["i"].to_numpy()]
        agg = grams.groupby(["lang", "g"], sort=False)["i"].agg(
            ["size", "nunique"]
        )
        ix = agg.index
        return pa.table(
            {
                "lang": pa.array(ix.get_level_values(0), pa.string()),
                "gram": pa.array(ix.get_level_values(1), pa.string()),
                "occ": pa.array(agg["size"].to_numpy(), pa.int64()),
                "docs": pa.array(agg["nunique"].to_numpy(), pa.int64()),
            }
        )

    agg = partitioned_key_sum(
        docs_ds.map_batches(gram_partial, batch_format="pyarrow"),
        ["lang", "gram"], ["occ", "docs"], part_on=("gram",),
    )

    def topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "gram": pa.array([], pa.string()),
                    "n_occurrences": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        df = t.to_pandas()
        df.columns = ["lang", "gram", "n_occurrences", "n_docs"]
        df = df[df["n_docs"] >= min_df]
        df = df.sort_values(
            ["lang", "n_occurrences", "gram"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        df = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        agg.map_batches(topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def lang_hot_ngrams_oracle_sql(n: int = 3, min_df: int = 2,
                               k: int = 10) -> str:
    return f"""
        WITH ws AS (
            SELECT doc_id, lang, string_split(text, ' ') AS ws
            FROM documents
        ),
        g AS (
            SELECT doc_id, lang,
                   array_to_string(ws[CAST(i AS BIGINT):CAST(i AS BIGINT)+{n - 1}], ' ') AS gram
            FROM ws, unnest(range(1, len(ws) - {n - 2})) AS t(i)
        ),
        agg AS (
            SELECT lang, gram, COUNT(*) AS n_occurrences,
                   COUNT(DISTINCT doc_id) AS n_docs
            FROM g GROUP BY 1, 2
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY lang
                ORDER BY n_occurrences DESC, gram
            ) AS rn
            FROM agg WHERE n_docs >= {min_df}
        )
        SELECT lang, gram, n_occurrences, n_docs FROM r WHERE rn <= {k}
    """


def bigram_collocations(docs_ds, min_count: int = 5, k: int = 20,
                        broadcast_max_vocab: int = 2_000_000):
    """Collocation mining (the AutoPhrase-lineage phrase-quality
    signal, cf. reference README.md's AutoPhrase dictionary input):
    top-``k`` word bigrams by pointwise mutual information among
    bigrams occurring ≥ ``min_count`` times. PMI is quantized to
    integer micro-nats with the SAME double expression on both sides
    (``ln((c_xy/N_b) / ((c_x/N_w)·(c_y/N_w)))``, each op IEEE-ordered),
    so the value-hash is exact.

    Scale shape: word counts and bigram counts are both key-partitioned
    combines (nothing vocab-sized in one block). Under
    ``broadcast_max_vocab`` distinct words the unigram table broadcasts
    once via ``ray.put`` and PMI is a vectorized map over the
    gram-partitioned bigram blocks; above it, two string-key cogroup
    joins (left word, then right word) attach the unigram counts —
    identical output, pytest-pinned tier equality. The bigram table
    materializes once (vocab²-bounded, NOT corpus-sized) because its
    total count N_b must be known before the per-row PMI pass.
    """
    import ray

    from autoner_ray.stages.combine import partitioned_key_sum

    def word_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"word": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        ex = _exploded(batch["text"].to_pylist())
        vc = ex["w"].value_counts()
        return pa.table(
            {
                "word": pa.array(vc.index.astype(str), pa.string()),
                "c": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    wc = partitioned_key_sum(
        docs_ds.map_batches(word_partial, batch_format="pyarrow"),
        ["word"], ["c"], part_on=("word",),
    )

    def bigram_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "lw": pa.array([], pa.string()),
                "rw": pa.array([], pa.string()),
                "c_xy": pa.array([], pa.int64()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        grams = _gram_frame(_exploded(batch["text"].to_pylist()), 2)
        if grams.empty:
            return empty
        agg = grams.groupby("g", sort=False).size()
        lr = agg.index.to_series().str.split(" ", n=1, expand=True)
        return pa.table(
            {
                "gram": pa.array(agg.index, pa.string()),
                "lw": pa.array(lr[0].to_numpy(), pa.string()),
                "rw": pa.array(lr[1].to_numpy(), pa.string()),
                "c_xy": pa.array(agg.to_numpy(), pa.int64()),
            }
        )

    bc = partitioned_key_sum(
        docs_ds.map_batches(bigram_partial, batch_format="pyarrow"),
        ["gram", "lw", "rw"], ["c_xy"], part_on=("gram",),
    ).materialize()  # vocab²-bounded; N_b needed before the PMI pass

    n_b = int(bc.sum("c_xy") or 0)
    n_words = wc.count()

    _out_schema = pa.schema(
        [("gram", pa.string()), ("c_xy", pa.int64()),
         ("c_left", pa.int64()), ("c_right", pa.int64()),
         ("pmi_micro", pa.int64())]
    )

    def _pmi_micro(cxy, cl, cr, NB, NW):
        r = (cxy / NB) / ((cl / NW) * (cr / NW))
        return np.floor(np.log(r) * 1e6 + 0.5).astype(np.int64)

    if n_words <= broadcast_max_vocab:
        wc_df = wc.to_pandas()
        NW = float(wc_df["c"].sum())
        lut_ref = ray.put(dict(zip(wc_df["word"], wc_df["c"])))

        def pmi_batch(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _out_schema.empty_table()
            lut = ray.get(lut_ref)
            df = t.to_pandas()
            df = df[df["c_xy"] >= min_count]
            if df.empty:
                return _out_schema.empty_table()
            cl = df["lw"].map(lut).to_numpy(np.int64)
            cr = df["rw"].map(lut).to_numpy(np.int64)
            cxy = df["c_xy"].to_numpy(np.int64)
            return pa.table(
                {
                    "gram": pa.array(df["gram"], pa.string()),
                    "c_xy": pa.array(cxy, pa.int64()),
                    "c_left": pa.array(cl, pa.int64()),
                    "c_right": pa.array(cr, pa.int64()),
                    "pmi_micro": pa.array(
                        _pmi_micro(
                            cxy.astype(np.float64), cl.astype(np.float64),
                            cr.astype(np.float64), float(n_b), NW,
                        ),
                        pa.int64(),
                    ),
                }
            )

        scored = bc.map_batches(pmi_batch, batch_format="pyarrow")
    else:
        from autoner_ray.stages.joins import cogroup_join

        NW_ref = [None]  # resolved below without a driver-side vocab

        def _rename(ds, key, cname):
            return ds.map_batches(
                lambda t, key=key, cname=cname: pa.table(
                    {key: t["word"], cname: t["c"]}
                )
                if t.num_columns else pa.table(
                    {key: pa.array([], pa.string()),
                     cname: pa.array([], pa.int64())}
                ),
                batch_format="pyarrow",
            )

        wc_mat = wc.materialize()
        NW = float(wc_mat.sum("c") or 0)
        j1 = cogroup_join(bc, _rename(wc_mat, "lw", "c_left"),
                          on=("lw",))
        j2 = cogroup_join(j1, _rename(wc_mat, "rw", "c_right"),
                          on=("rw",))

        def pmi_batch(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or len(t) == 0:
                return _out_schema.empty_table()
            df = t.to_pandas()
            df = df[df["c_xy"] >= min_count]
            if df.empty:
                return _out_schema.empty_table()
            cl = df["c_left"].to_numpy(np.int64)
            cr = df["c_right"].to_numpy(np.int64)
            cxy = df["c_xy"].to_numpy(np.int64)
            return pa.table(
                {
                    "gram": pa.array(df["gram"], pa.string()),
                    "c_xy": pa.array(cxy, pa.int64()),
                    "c_left": pa.array(cl, pa.int64()),
                    "c_right": pa.array(cr, pa.int64()),
                    "pmi_micro": pa.array(
                        _pmi_micro(
                            cxy.astype(np.float64), cl.astype(np.float64),
                            cr.astype(np.float64), float(n_b), NW,
                        ),
                        pa.int64(),
                    ),
                }
            )

        scored = j2.map_batches(pmi_batch, batch_format="pyarrow")

    def topk(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _out_schema.empty_table()
        df = t.to_pandas().sort_values(
            ["pmi_micro", "gram"], ascending=[False, True],
            kind="mergesort",
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        scored.map_batches(topk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(topk, batch_format="pyarrow", batch_size=None)
    )


def bigram_collocations_oracle_sql(min_count: int = 5, k: int = 20) -> str:
    return f"""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        w AS (SELECT unnest(ws) AS word FROM ws),
        wc AS (SELECT word, COUNT(*) AS c FROM w GROUP BY 1),
        nw AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM wc),
        g AS (
            SELECT ws[CAST(i AS BIGINT)] AS lw,
                   ws[CAST(i AS BIGINT) + 1] AS rw
            FROM ws, unnest(range(1, len(ws))) AS t(i)
        ),
        bc AS (
            SELECT lw, rw, COUNT(*) AS c_xy FROM g GROUP BY 1, 2
        ),
        nb AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n FROM bc)
        SELECT bc.lw || ' ' || bc.rw AS gram, bc.c_xy,
               l.c AS c_left, r.c AS c_right,
               CAST(floor(ln(
                   (CAST(bc.c_xy AS DOUBLE) / nb.n)
                   / ((CAST(l.c AS DOUBLE) / nw.n)
                      * (CAST(r.c AS DOUBLE) / nw.n))
               ) * 1000000 + 0.5) AS BIGINT) AS pmi_micro
        FROM bc
        JOIN wc l ON bc.lw = l.word
        JOIN wc r ON bc.rw = r.word
        CROSS JOIN nb CROSS JOIN nw
        WHERE bc.c_xy >= {min_count}
        ORDER BY pmi_micro DESC, gram
        LIMIT {k}
    """


def heaps_vocab_growth(docs_ds, bucket_docs: int = 100):
    """Heaps-law vocabulary-growth curve: for each bucket of
    ``bucket_docs`` consecutive ``doc_id``s, how many NEW word types
    first appear there, plus the running vocabulary size — the
    diagnostic a corpus builder reads to decide whether more crawl
    keeps buying vocabulary (sub-linear growth ⇒ Heaps exponent < 1).

    Semantics: a word's first appearance is the MINIMUM doc_id that
    contains it (ingestion order = doc_id order), so the curve is
    exact and deterministic, not a streaming approximation.

    Scale shape: per-batch (word -> min doc_id) partials (pandas hash
    combine over the exploded words; the exploded stream never
    shuffles) -> one word-partitioned min-combine
    (``partitioned_key_agg``, vocab never on the driver) -> per-batch
    bucket counts -> shuffle-free bounded combine over buckets -> one
    tiny sorted cumsum block. Bucket count is corpus_docs /
    ``bucket_docs``; at 10^12 docs raise ``bucket_docs`` so the final
    block stays bounded (or swap the cumsum for the exact distributed
    ranking pass used by ``docs_length_gini``).
    """
    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_agg,
    )

    def first_seen_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "word": pa.array([], pa.string()),
                "first_doc": pa.array([], pa.int64()),
            }
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        df = _exploded(t["text"].to_pylist())
        if df.empty:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        df["doc"] = ids[df["i"].to_numpy()]
        agg = df.groupby("w", sort=False)["doc"].min()
        return pa.table(
            {
                "word": pa.array(agg.index.to_numpy(), pa.string()),
                "first_doc": pa.array(agg.to_numpy(), pa.int64()),
            }
        )

    first = partitioned_key_agg(
        docs_ds.map_batches(first_seen_partial, batch_format="pyarrow"),
        ["word"], [("first_doc", "min")], part_on=("word",),
    )

    def bucket_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "first_doc" not in (
            t.column_names
        ):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "new_words": pa.array([], pa.int64()),
                }
            )
        b = t["first_doc"].to_numpy(zero_copy_only=False) // bucket_docs
        vals, counts = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(vals, pa.int64()),
                "new_words": pa.array(counts, pa.int64()),
            }
        )

    agg = bounded_key_sum(
        first.map_batches(bucket_partial, batch_format="pyarrow",
                          batch_size=None),
        ["bucket"], ["new_words"],
    )

    def cumsum(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values("bucket", kind="mergesort")
        df["vocab_size"] = df["new_words"].cumsum().astype(np.int64)
        return pa.Table.from_pandas(df, preserve_index=False)

    return agg.repartition(1).map_batches(
        cumsum, batch_format="pyarrow", batch_size=None
    )


def heaps_vocab_growth_oracle_sql(bucket_docs: int = 100) -> str:
    return f"""
        WITH w AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        f AS (
            SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY word
        ),
        b AS (
            SELECT first_doc // {bucket_docs} AS bucket,
                   COUNT(*) AS new_words
            FROM f GROUP BY 1
        )
        SELECT bucket, CAST(new_words AS BIGINT) AS new_words,
               CAST(SUM(new_words) OVER (
                   ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS vocab_size
        FROM b ORDER BY bucket
    """


def bigram_graph(docs_ds, min_count: int = 75):
    """Undirected adjacent-word co-occurrence graph: edge (subj, obj)
    for each unordered pair of DISTINCT adjacent words occurring at
    least ``min_count`` times corpus-wide (subj < obj lexicographic) —
    the thresholded collocation graph that feeds cohesion passes.

    Scale shape: vectorized shift-based bigram explode per batch ->
    per-batch pair-count partials -> ONE pair-partitioned sum combine
    (vocab² never on the driver) -> stateless threshold filter.
    """
    from autoner_ray.stages.combine import partitioned_key_sum

    def pair_partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "subj": pa.array([], pa.string()),
                "obj": pa.array([], pa.string()),
                "weight": pa.array([], pa.int64()),
            }
        )
        if t.num_columns == 0 or len(t) == 0:
            return empty
        df = _exploded(t["text"].to_pylist())
        if df.empty:
            return empty
        w = df["w"].astype(str)
        nxt = w.shift(-1)
        same_doc = df["i"].to_numpy() == np.roll(df["i"].to_numpy(), -1)
        same_doc[-1] = False
        valid = same_doc & (w.to_numpy() != nxt.to_numpy())
        a = np.minimum(w.to_numpy()[valid], nxt.to_numpy()[valid])
        b = np.maximum(w.to_numpy()[valid], nxt.to_numpy()[valid])
        pairs = pd.DataFrame({"subj": a, "obj": b})
        agg = pairs.groupby(["subj", "obj"], sort=False).size()
        idx = agg.index
        return pa.table(
            {
                "subj": pa.array(idx.get_level_values(0), pa.string()),
                "obj": pa.array(idx.get_level_values(1), pa.string()),
                "weight": pa.array(agg.to_numpy(), pa.int64()),
            }
        )

    summed = partitioned_key_sum(
        docs_ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["subj", "obj"], ["weight"], part_on=("subj",),
    )

    def threshold(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "subj": pa.array([], pa.string()),
                    "obj": pa.array([], pa.string()),
                    "weight": pa.array([], pa.int64()),
                }
            )
        return t.filter(
            pc.greater_equal(t["weight"], pa.scalar(min_count))
        ).select(["subj", "obj", "weight"])

    return summed.map_batches(threshold, batch_format="pyarrow")


def bigram_kcore(docs_ds, min_count: int = 75, k: int = 2):
    """Exact k-core of the thresholded bigram collocation graph —
    (entity, degree) for the cohesive collocation backbone. Oracle:
    unrolled peel rounds in SQL (:func:`bigram_kcore_oracle_sql`)."""
    from autoner_ray.stages.graph import kcore

    return kcore(bigram_graph(docs_ds, min_count), k=k)


def bigram_kcore_oracle_sql(min_count: int = 75, k: int = 2,
                            rounds: int = 8) -> str:
    """Peel unrolled ``rounds`` times (the engine iterates to fixpoint;
    the corpus peels in <= 3 rounds, so 8 is a 2.5x safety margin —
    if a future corpus needs more the row-count check fails loudly
    rather than silently)."""
    steps = []
    prev = "e0"
    for r in range(1, rounds + 1):
        # MATERIALIZED is load-bearing: an inlined 8-round CTE chain
        # explodes the DuckDB planner (same note as _unigram_graph_ctes)
        steps.append(f"""
        d{r} AS MATERIALIZED (
            SELECT src, COUNT(*) AS deg FROM (
                SELECT subj AS src FROM {prev}
                UNION ALL SELECT obj FROM {prev}
            ) GROUP BY src HAVING COUNT(*) >= {k}
        ),
        e{r} AS MATERIALIZED (
            SELECT e.subj, e.obj FROM {prev} e
            JOIN d{r} a ON e.subj = a.src
            JOIN d{r} b ON e.obj = b.src
        )""")
        prev = f"e{r}"
    chain = ",".join(steps)
    return f"""
        WITH ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        bg AS (
            SELECT least(ws[i], ws[i + 1]) AS a,
                   greatest(ws[i], ws[i + 1]) AS b
            FROM ws, unnest(range(1, len(ws))) AS t(i)
            WHERE ws[i] <> ws[i + 1]
        ),
        e0 AS MATERIALIZED (
            SELECT a AS subj, b AS obj FROM bg
            GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
        ),
        {chain}
        SELECT src AS entity, CAST(COUNT(*) AS BIGINT) AS degree FROM (
            SELECT subj AS src FROM {prev}
            UNION ALL SELECT obj FROM {prev}
        ) GROUP BY src
    """


def crawl_rate(sf_dir: str):
    """Crawl-throughput monitor over the Common-Crawl-style ``pages``
    table: (hour of ``warc_ts``, lang) -> pages fetched and bytes of
    raw html — the per-ingest-hour observability rollup a trillion-page
    crawl pipeline tails during a run. Goes THROUGH the pages
    derivation (url/warc_ts/html columns), so the oracle — written
    against the documents table plus the deterministic ts/html rules —
    re-proves the source's timestamp and payload synthesis.

    Scale shape: stateless map over the streamed pages source
    (html length via zero-copy arrow ``binary_length``) -> per-batch
    (hour, lang) partials -> shuffle-free bounded combine (hour x lang
    is corpus-span-bounded)."""
    from autoner_ray.sources.pages import read_pages
    from autoner_ray.stages.combine import bounded_key_sum

    def partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "hour": pa.array([], pa.timestamp("us")),
                    "lang": pa.array([], pa.string()),
                    "n_pages": pa.array([], pa.int64()),
                    "html_bytes": pa.array([], pa.int64()),
                }
            )
        agg = (
            pa.table(
                {
                    "hour": pc.floor_temporal(t["warc_ts"], unit="hour"),
                    "lang": t["lang"],
                    "html_bytes": pc.cast(
                        pc.binary_length(t["html"]), pa.int64()
                    ),
                }
            )
            .group_by(["hour", "lang"])
            .aggregate([("html_bytes", "count"), ("html_bytes", "sum")])
        )
        return agg.rename_columns(["hour", "lang", "n_pages", "html_bytes"])

    return bounded_key_sum(
        read_pages(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["hour", "lang"], ["n_pages", "html_bytes"],
    )


def crawl_rate_oracle_sql() -> str:
    # mirrors sources/pages.py: warc_ts = 2020-01-01T00:00Z + doc_id s;
    # html = fixed wrapper (117 chars) + title doc_id + entity-escaped
    # text (the escape only rewrites & < > — the corpus contains none,
    # enforced by the length identity hashing here) + footer outlink
    # anchors per ``link_targets``: each anchor is 43 fixed chars plus
    # the target id TWICE (href + anchor text); doc 0 emits a single
    # anchor (its other two targets collapse as dup/self-loop), every
    # other doc emits all three distinct targets.
    return """
        WITH p AS (
            SELECT TIMESTAMP '2020-01-01 00:00:00'
                       + to_seconds(doc_id) AS warc_ts,
                   lang,
                   117 + length(CAST(doc_id AS VARCHAR)) + length(text)
                   + CASE WHEN doc_id = 0 THEN 43 + 2 * 1
                     ELSE 129 + 2 * (
                         length(CAST(doc_id + 1 AS VARCHAR))
                         + length(CAST(2 * doc_id + 1 AS VARCHAR))
                         + length(CAST(doc_id // 3 AS VARCHAR)))
                     END AS html_len
            FROM documents
        )
        SELECT date_trunc('hour', warc_ts) AS hour, lang,
               COUNT(*) AS n_pages,
               CAST(SUM(html_len) AS BIGINT) AS html_bytes
        FROM p GROUP BY 1, 2
    """


def bigram_bfs_multi(docs_ds, min_count: int = 75, n_seeds: int = 3,
                     max_depth: int = 32,
                     driver_max_edges: int = 2_000_000):
    """Multi-source hop distances over the thresholded bigram
    collocation graph: distance to the NEAREST of the ``n_seeds``
    lexicographically smallest nodes — the seeded-reachability pass
    (e.g. propagating curated "anchor" vocabulary labels outward).

    Seeds come from a sort+limit over the DISTINCT node table — the
    thresholded graph is vocab-bounded, so this is a tiny shuffle;
    distances run in :func:`~autoner_ray.stages.graph.bfs_distances`'
    Dataset-resident fixpoint loop (multi-seed frontier)."""
    from autoner_ray.stages.graph import bfs_distances

    edges = bigram_graph(docs_ds, min_count).materialize()
    if edges.count() <= driver_max_edges:
        # vocab-bounded tier: one-process BFS over the tiny thresholded
        # graph (tier equality vs the Dataset loop pinned by
        # tests/test_r4_late_ops.py)
        import collections

        df = edges.to_pandas()
        adj: dict[str, set[str]] = collections.defaultdict(set)
        for a, b in zip(df["subj"], df["obj"]):
            adj[a].add(b)
            adj[b].add(a)
        seeds = sorted(adj)[:n_seeds]
        dist = {s: 0 for s in seeds}
        frontier = list(seeds)
        d = 0
        while frontier and d < max_depth:
            d += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        items = sorted(dist.items())
        return pa.table(
            {
                "entity": pa.array([k for k, _ in items], pa.string()),
                "dist": pa.array([v for _, v in items], pa.int64()),
            }
        )

    def nodes(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table({"node": pa.array([], pa.string())})
        return (
            pa.table(
                {
                    "node": pa.chunked_array(
                        t["subj"].chunks + t["obj"].chunks
                    )
                }
            )
            .group_by("node")
            .aggregate([])
        )

    seeds = (
        edges.map_batches(nodes, batch_format="pyarrow")
        .groupby("node")
        .count()
        .sort("node")
        .limit(n_seeds)
        .to_pandas()["node"]
        .tolist()
    )
    return bfs_distances(edges, sources=seeds, max_depth=max_depth)


def bigram_bfs_multi_oracle_sql(min_count: int = 75, n_seeds: int = 3,
                                max_depth: int = 32) -> str:
    return f"""
        WITH RECURSIVE ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        bg AS (
            SELECT least(ws[i], ws[i + 1]) AS a,
                   greatest(ws[i], ws[i + 1]) AS b
            FROM ws, unnest(range(1, len(ws))) AS t(i)
            WHERE ws[i] <> ws[i + 1]
        ),
        e0 AS MATERIALIZED (
            SELECT a AS subj, b AS obj FROM bg
            GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
        ),
        bidir AS MATERIALIZED (
            SELECT subj AS src, obj AS dst FROM e0
            UNION ALL SELECT obj, subj FROM e0
        ),
        seeds AS (
            SELECT src FROM (SELECT DISTINCT src FROM bidir)
            ORDER BY src LIMIT {n_seeds}
        ),
        bfs(node, d) AS (
            SELECT src, 0 FROM seeds
            UNION
            SELECT e.dst, bfs.d + 1
            FROM bfs JOIN bidir e ON e.src = bfs.node
            WHERE bfs.d + 1 <= {max_depth}
        )
        SELECT node AS entity, CAST(MIN(d) AS BIGINT) AS dist
        FROM bfs GROUP BY node
    """


def next_word_topk(docs_ds, k: int = 3, min_count: int = 2):
    """Bigram continuation table — the backbone of an n-gram LM / text
    autocompletion index: for every head word, its top-``k`` next
    words by bigram count (ties broken alphabetically), keeping rows
    with count ≥ ``min_count``. ``rnk`` is computed over ALL
    continuations of the head (so a rank-1 row below ``min_count`` is
    dropped, not re-ranked) — matching the SQL window exactly.

    Scale shape: per-batch bigram partials (pandas hash combine over
    the exploded stream — the corpus never shuffles exploded) -> ONE
    hash shuffle partitioned on the HEAD word -> per-partition final
    sum + vectorized rank + filter in the SAME grouped pass (ranking
    inside map_groups, so a head's rows can never split across block
    boundaries). Output is vocab-bounded."""
    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.joins import _stable_part_col

    P = default_num_partitions()

    def bigram_partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "head": pa.array([], pa.string()),
                "next_word": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "part": pa.array([], pa.int32()),
            }
        )
        if batch.num_columns == 0 or len(batch) == 0:
            return empty
        grams = _gram_frame(_exploded(batch["text"].to_pylist()), 2)
        if grams.empty:
            return empty
        agg = grams.groupby("g", sort=False).size()
        lr = agg.index.to_series().str.split(" ", n=1, expand=True)
        t = pa.table(
            {
                "head": pa.array(lr[0].to_numpy(), pa.string()),
                "next_word": pa.array(lr[1].to_numpy(), pa.string()),
                "cnt": pa.array(agg.to_numpy(), pa.int64()),
            }
        )
        return t.append_column(
            "part", _stable_part_col(t, ("head",), P)
        )

    def sum_rank(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "head": pd.Series(dtype="object"),
                "next_word": pd.Series(dtype="object"),
                "cnt": pd.Series(dtype="int64"),
                "rnk": pd.Series(dtype="int64"),
            }
        )
        if len(df) == 0 or "head" not in df.columns:
            return empty
        df = (
            df.groupby(["head", "next_word"], sort=False)["cnt"]
            .sum()
            .reset_index()
        )
        df = df.sort_values(
            ["head", "cnt", "next_word"],
            ascending=[True, False, True], kind="mergesort",
        )
        df["rnk"] = df.groupby("head", sort=False).cumcount() + 1
        df = df[(df["rnk"] <= k) & (df["cnt"] >= min_count)]
        return df[["head", "next_word", "cnt", "rnk"]].reset_index(
            drop=True
        )

    return (
        docs_ds.map_batches(bigram_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sum_rank, batch_format="pandas")
    )


def next_word_topk_oracle_sql(k: int = 3, min_count: int = 2) -> str:
    return f"""
        WITH ws AS (
            SELECT string_split(text, ' ') AS ws FROM documents
        ),
        g AS (
            SELECT ws[CAST(i AS BIGINT)] AS head,
                   ws[CAST(i AS BIGINT) + 1] AS next_word
            FROM ws, unnest(range(1, len(ws))) AS t(i)
        ),
        c AS (
            SELECT head, next_word, COUNT(*) AS cnt
            FROM g GROUP BY 1, 2
        ),
        r AS (
            SELECT *, row_number() OVER (
                PARTITION BY head ORDER BY cnt DESC, next_word
            ) AS rnk
            FROM c
        )
        SELECT head, next_word, cnt, rnk
        FROM r WHERE rnk <= {k} AND cnt >= {min_count}
    """


def bigram_ktruss(docs_ds, min_count: int = 50, k: int = 20,
                  rounds: int = 3):
    """Bounded k-truss peel of the thresholded bigram collocation
    graph: ``rounds`` iterations of (count triangles supporting each
    edge -> drop edges with support < k-2), then a support recount on
    the survivors — the dense-neighborhood edge filter (strictly
    stronger than k-core: an edge needs >= k-2 surviving common
    neighbors). Fixed ``rounds`` is the determinism contract the
    pagerank/LPA unrolls use; at fixpoint extra rounds are idempotent.
    Kernel: tiered :func:`autoner_ray.stages.graph.ktruss` (driver peel
    under the edge cap, Dataset-resident wedge-closure beyond)."""
    from autoner_ray.stages.graph import ktruss

    return ktruss(bigram_graph(docs_ds, min_count), k=k, rounds=rounds)


def bigram_ktruss_oracle_sql(min_count: int = 50, k: int = 20,
                             rounds: int = 3) -> str:
    """Unrolled truss peel: support of edge (a,b) = common neighbors
    via the bidirectional self-join; ``rounds`` filter iterations, then
    the final support recount the engine also performs. MATERIALIZED is
    load-bearing (same planner note as bigram_kcore_oracle_sql)."""
    parts = []
    for i in range(rounds + 1):
        parts.append(f"""
        b{i} AS MATERIALIZED (
            SELECT subj AS a, obj AS b FROM e{i}
            UNION ALL SELECT obj, subj FROM e{i}
        ),
        s{i} AS MATERIALIZED (
            SELECT e.subj, e.obj, COUNT(*) AS sup
            FROM e{i} e
            JOIN b{i} x ON x.a = e.subj
            JOIN b{i} y ON y.a = e.obj AND y.b = x.b
            GROUP BY 1, 2
        )""")
        if i < rounds:
            parts.append(f"""
        e{i + 1} AS MATERIALIZED (
            SELECT subj, obj FROM s{i} WHERE sup >= {k - 2}
        )""")
    chain = ",".join(parts)
    return f"""
        WITH ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        bg AS (
            SELECT least(ws[i], ws[i + 1]) AS a,
                   greatest(ws[i], ws[i + 1]) AS b
            FROM ws, unnest(range(1, len(ws))) AS t(i)
            WHERE ws[i] <> ws[i + 1]
        ),
        e0 AS MATERIALIZED (
            SELECT a AS subj, b AS obj FROM bg
            GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
        ),
        {chain}
        SELECT subj, obj, CAST(sup AS BIGINT) AS support FROM s{rounds}
    """


def bigram_assortativity(docs_ds, min_count: int = 50):
    """Degree assortativity of the thresholded bigram collocation
    graph (kernel: stages/graph.py:degree_assortativity — exact int64
    moment sums, one float division at the end)."""
    from autoner_ray.stages.graph import degree_assortativity

    return degree_assortativity(bigram_graph(docs_ds, min_count))


def bigram_assortativity_oracle_sql(min_count: int = 50) -> str:
    return f"""
        WITH ws AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS ws FROM documents
        ),
        bg AS (
            SELECT least(ws[i], ws[i + 1]) AS a,
                   greatest(ws[i], ws[i + 1]) AS b
            FROM ws, unnest(range(1, len(ws))) AS t(i)
            WHERE ws[i] <> ws[i + 1]
        ),
        e0 AS MATERIALIZED (
            SELECT a AS subj, b AS obj FROM bg
            GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
        ),
        bidir AS (
            SELECT subj AS src, obj AS dst FROM e0
            UNION ALL SELECT obj, subj FROM e0
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM bidir GROUP BY 1),
        mom AS (
            SELECT COUNT(*) AS m,
                   SUM(dx.deg) AS sx, SUM(dy.deg) AS sy,
                   SUM(dx.deg * dx.deg) AS sxx,
                   SUM(dy.deg * dy.deg) AS syy,
                   SUM(dx.deg * dy.deg) AS sxy
            FROM bidir e
            JOIN deg dx ON dx.src = e.src
            JOIN deg dy ON dy.src = e.dst
        )
        SELECT CAST(m // 2 AS BIGINT) AS n_edges,
               CASE WHEN m * sxx - sx * sx <= 0
                      OR m * syy - sy * sy <= 0 THEN 0.0
                    ELSE round(
                        (m * sxy - sx * sy) /
                        (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                         * sqrt(CAST(m * syy - sy * sy AS DOUBLE))), 6)
               END AS assortativity
        FROM mom
    """


# Gopher-style document-quality rules (Rae et al. 2021, table A1 shape),
# re-parameterized for a space-tokenized corpus and made INTEGER-EXACT:
# every ratio threshold is a cross-multiplied integer comparison, so the
# engine and the DuckDB twin agree bit-for-bit with no float rounding.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "a")


def gopher_quality(
    docs_ds,
    min_words: int = 20,
    max_words: int = 90,
    mwl_lo_x10: int = 43,
    mwl_hi_x10: int = 47,
    min_stopwords: int = 2,
    max_top_frac_den: int = 10,
    min_distinct_num: int = 2,
    min_distinct_den: int = 5,
):
    """Per-document Gopher-rule audit: one row per doc with the five
    rule flags (0/1) and the conjunction ``keep``.

    Rules (all integer-exact):
      r_wc        min_words <= wc <= max_words
      r_mwl       mwl_lo_x10*wc <= 10*total_word_chars <= mwl_hi_x10*wc
                  (mean word length in [4.3, 4.7] at the defaults)
      r_stop      count of GOPHER_STOPWORDS occurrences >= min_stopwords
      r_rep       max single-word count * max_top_frac_den <= wc
                  (top word <= 10% of tokens at the default)
      r_distinct  distinct_words * min_distinct_den >=
                  min_distinct_num * wc  (>= 40% distinct at defaults)

    Scale shape: each document is judged from its own row alone, so this
    is ONE stateless vectorized ``map_batches`` — no shuffle, no state,
    embarrassingly parallel at any corpus size. Per-batch work is a
    pandas explode -> (doc, word) count -> per-doc integer aggregate.
    """
    import numpy as np
    import pandas as pd

    stopset = set(GOPHER_STOPWORDS)

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = [
            "doc_id", "wc", "r_wc", "r_mwl", "r_stop", "r_rep",
            "r_distinct", "keep",
        ]
        if df.empty:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64") for c in out_cols}
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
        wt = (
            ex.groupby(["doc_id", "word"], sort=False)
            .size()
            .reset_index(name="c")
        )
        wt["wchars"] = wt["word"].str.len() * wt["c"]
        wt["stop_c"] = np.where(wt["word"].isin(stopset), wt["c"], 0)
        g = wt.groupby("doc_id", sort=False)
        agg = g.agg(
            wc=("c", "sum"),
            tc=("wchars", "sum"),
            stop_n=("stop_c", "sum"),
            top_c=("c", "max"),
            distinct_n=("c", "size"),
        ).reset_index()
        wc = agg["wc"].to_numpy()
        tc = agg["tc"].to_numpy()
        out = pd.DataFrame({"doc_id": agg["doc_id"], "wc": wc})
        out["r_wc"] = (
            (wc >= min_words) & (wc <= max_words)
        ).astype("int64")
        out["r_mwl"] = (
            (mwl_lo_x10 * wc <= 10 * tc) & (10 * tc <= mwl_hi_x10 * wc)
        ).astype("int64")
        out["r_stop"] = (
            agg["stop_n"].to_numpy() >= min_stopwords
        ).astype("int64")
        out["r_rep"] = (
            agg["top_c"].to_numpy() * max_top_frac_den <= wc
        ).astype("int64")
        out["r_distinct"] = (
            agg["distinct_n"].to_numpy() * min_distinct_den
            >= min_distinct_num * wc
        ).astype("int64")
        out["keep"] = (
            out[["r_wc", "r_mwl", "r_stop", "r_rep", "r_distinct"]]
            .min(axis=1)
            .astype("int64")
        )
        out["wc"] = out["wc"].astype("int64")
        return out[out_cols]

    return docs_ds.map_batches(rules, batch_format="pandas")


def gopher_quality_oracle_sql(
    min_words: int = 20,
    max_words: int = 90,
    mwl_lo_x10: int = 43,
    mwl_hi_x10: int = 47,
    min_stopwords: int = 2,
    max_top_frac_den: int = 10,
    min_distinct_num: int = 2,
    min_distinct_den: int = 5,
) -> str:
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
        WITH w AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS word
            FROM documents
        ),
        wt AS (
            SELECT doc_id, word, COUNT(*) AS c
            FROM w GROUP BY 1, 2
        ),
        per AS (
            SELECT doc_id,
                   SUM(c) AS wc,
                   SUM(length(word) * c) AS tc,
                   SUM(CASE WHEN word IN ({stops}) THEN c ELSE 0 END)
                       AS stop_n,
                   MAX(c) AS top_c,
                   COUNT(*) AS distinct_n
            FROM wt GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(wc AS BIGINT) AS wc,
               CAST(CASE WHEN wc >= {min_words} AND wc <= {max_words}
                    THEN 1 ELSE 0 END AS BIGINT) AS r_wc,
               CAST(CASE WHEN {mwl_lo_x10} * wc <= 10 * tc
                          AND 10 * tc <= {mwl_hi_x10} * wc
                    THEN 1 ELSE 0 END AS BIGINT) AS r_mwl,
               CAST(CASE WHEN stop_n >= {min_stopwords}
                    THEN 1 ELSE 0 END AS BIGINT) AS r_stop,
               CAST(CASE WHEN top_c * {max_top_frac_den} <= wc
                    THEN 1 ELSE 0 END AS BIGINT) AS r_rep,
               CAST(CASE WHEN distinct_n * {min_distinct_den}
                          >= {min_distinct_num} * wc
                    THEN 1 ELSE 0 END AS BIGINT) AS r_distinct,
               CAST(CASE WHEN wc >= {min_words} AND wc <= {max_words}
                          AND {mwl_lo_x10} * wc <= 10 * tc
                          AND 10 * tc <= {mwl_hi_x10} * wc
                          AND stop_n >= {min_stopwords}
                          AND top_c * {max_top_frac_den} <= wc
                          AND distinct_n * {min_distinct_den}
                              >= {min_distinct_num} * wc
                    THEN 1 ELSE 0 END AS BIGINT) AS keep
        FROM per
    """


def pii_scrub_oracle_sql(patterns: dict[str, str] | None = None) -> str:
    """DuckDB twin of :func:`pii_scrub_batch`: the same RE2 patterns
    applied as a nested global ``regexp_replace`` chain in dict order
    (both engines are RE2 with leftmost non-overlapping semantics, so
    the chained rewrites agree byte-for-byte)."""
    pats = patterns if patterns is not None else PII_PATTERNS
    expr = "COALESCE(text, '')"
    for name, pat in pats.items():
        expr = (
            "regexp_replace({}, '{}', '[{}]', 'g')".format(
                expr, pat.replace("'", "''"), name.upper()
            )
        )
    return f"SELECT doc_id, {expr} AS text FROM documents"


def window_cooccurrence(docs_ds, window: int = 4):
    """Sliding-WINDOW word co-occurrence counts — the word2vec/GloVe
    co-occurrence builder: for every token position pair (i, j) with
    ``0 < j - i <= window`` inside one document, count the unordered
    word pair (equal-word pairs and empty tokens dropped). Distinct
    from the doc-level entity pair graph (``kg.unigram_triples``):
    the weight here is POSITIONAL — distance-bounded index pairs, all
    words, repeats included.

    Scale shape: per-batch shifted-array pair extraction (one numpy
    shift per distance d, doc boundaries masked — no per-token python)
    -> per-batch (pair -> n) partial -> WORD_A-partitioned combine.
    Pair stream is O(tokens x window) pre-combined per batch; nothing
    corpus-sized on the driver.
    """
    from autoner_ray.stages.combine import partitioned_key_sum

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "word_a": pd.Series([], dtype="object"),
                "word_b": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if df.empty:
            return empty
        words = df["text"].fillna("").str.split(" ")
        lens = words.str.len().to_numpy()
        flat = np.concatenate(words.to_numpy())
        doc_ix = np.repeat(np.arange(len(df)), lens)
        parts = []
        for d in range(1, window + 1):
            if len(flat) <= d:
                break
            a, b = flat[:-d], flat[d:]
            m = (
                (doc_ix[:-d] == doc_ix[d:])
                & (a != b) & (a != "") & (b != "")
            )
            if not m.any():
                continue
            am, bm = a[m], b[m]
            lo = np.where(am < bm, am, bm)
            hi = np.where(am < bm, bm, am)
            parts.append(pd.DataFrame({"word_a": lo, "word_b": hi}))
        if not parts:
            return empty
        agg = (
            pd.concat(parts, ignore_index=True)
            .groupby(["word_a", "word_b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        agg["n"] = agg["n"].astype("int64")
        return agg

    return partitioned_key_sum(
        docs_ds.map_batches(pair_partial, batch_format="pandas"),
        ["word_a", "word_b"], ["n"], part_on=("word_a",),
    )


def window_pairs_ctes(window: int = 4) -> str:
    """Shared CTE prefix ending in ``wp(word_a, word_b, n)`` — the
    sliding-window pair counts (twin of :func:`window_cooccurrence`)."""
    return f"""
        toks AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS l FROM documents
        ),
        idx AS MATERIALIZED (
            SELECT doc_id, i.i AS pos, l[i.i + 1] AS word
            FROM toks t, UNNEST(range(len(t.l))) AS i(i)
        ),
        wp AS MATERIALIZED (
            SELECT least(a.word, b.word) AS word_a,
                   greatest(a.word, b.word) AS word_b,
                   COUNT(*) AS n
            FROM idx a JOIN idx b
              ON a.doc_id = b.doc_id
             AND b.pos > a.pos AND b.pos - a.pos <= {window}
            WHERE a.word <> b.word AND a.word <> '' AND b.word <> ''
            GROUP BY 1, 2
        )
    """


def window_cooccurrence_oracle_sql(window: int = 4) -> str:
    return f"""
        WITH {window_pairs_ctes(window)}
        SELECT word_a, word_b, CAST(n AS BIGINT) AS n FROM wp
    """


def prefix_dup_groups(docs_ds, k: int = 2):
    """Prefix-key duplicate grouping: documents sharing the same first
    ``k`` tokens (the cheap truncation/boilerplate-dup blocking key —
    crawl snapshots of the same page usually share a long prefix even
    when tails diverge). Emits ``(prefix, n_docs, min_doc)`` for groups
    with >= 2 docs; pairs for expensive verification form only within a
    group.

    Scale shape: stateless prefix map -> per-batch (prefix -> count,
    min-doc) partials -> PREFIX-partitioned re-associative combine
    (``partitioned_key_agg``) -> vectorized >= 2 filter. Never
    corpus-sized anywhere.
    """
    from autoner_ray.stages.combine import partitioned_key_agg

    def prefix_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "prefix": pd.Series([], dtype="object"),
                    "n_docs": pd.Series([], dtype="int64"),
                    "min_doc": pd.Series([], dtype="int64"),
                }
            )
        pref = (
            df["text"].fillna("").str.split(" ").str[:k].str.join(" ")
        )
        agg = (
            pd.DataFrame({"prefix": pref, "min_doc": df["doc_id"]})
            .assign(n_docs=1)
            .groupby("prefix", as_index=False)
            .agg(n_docs=("n_docs", "sum"), min_doc=("min_doc", "min"))
        )
        agg["n_docs"] = agg["n_docs"].astype("int64")
        agg["min_doc"] = agg["min_doc"].astype("int64")
        return agg[["prefix", "n_docs", "min_doc"]]

    grouped = partitioned_key_agg(
        docs_ds.map_batches(prefix_partial, batch_format="pandas"),
        ["prefix"], [("n_docs", "sum"), ("min_doc", "min")],
    )

    def keep_dups(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "prefix": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "min_doc": pa.array([], pa.int64()),
                }
            )
        return t.filter(pc.greater_equal(t["n_docs"], 2))

    return grouped.map_batches(keep_dups, batch_format="pyarrow")


def prefix_dup_groups_oracle_sql(k: int = 2) -> str:
    return f"""
        WITH p AS (
            SELECT doc_id,
                   array_to_string(string_split(text, ' ')[1:{k}], ' ')
                       AS prefix
            FROM documents
        )
        SELECT prefix,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS min_doc
        FROM p GROUP BY prefix
        HAVING COUNT(*) >= 2
    """


def snapshot_diff(docs_ds):
    """Incremental-crawl snapshot delta — the change feed a recrawl
    pipeline computes before reprocessing anything: two deterministic
    snapshot views of the corpus (A = doc_id % 3 != 0; B = doc_id % 3
    != 1, with every doc_id % 5 == 0 page's text mutated — the
    recrawled-and-changed case) diff by page into
    (doc_id, status in {added, removed, changed, unchanged}). Content
    equality is by md5 of the text, never the text itself.

    Scale shape: the two snapshot streams union with a side tag and
    ONE hash shuffle on doc_id co-locates each page's <=2 rows; the
    per-group classify is a vectorized pandas pass (the
    schema-evolution / wide-diff family pattern). Rows shuffled carry
    (doc_id, side, md5) only — text is dropped at the map."""
    import hashlib

    _r_schema = pa.schema(
        [("doc_id", pa.int64()), ("side", pa.int8()),
         ("h", pa.string())]
    )

    def snapshot_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return _r_schema.empty_table()
        ids, sides, hs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(),
                             t["text"].to_pylist()):
            did = int(did)
            text = text or ""
            if did % 3 != 0:  # snapshot A
                ids.append(did)
                sides.append(0)
                hs.append(hashlib.md5(text.encode()).hexdigest())
            if did % 3 != 1:  # snapshot B, possibly recrawl-changed
                b_text = text + " updated" if did % 5 == 0 else text
                ids.append(did)
                sides.append(1)
                hs.append(hashlib.md5(b_text.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "side": pa.array(sides, pa.int8()),
                "h": pa.array(hs, pa.string()),
            },
            schema=_r_schema,
        )

    _o_cols = ["doc_id", "status"]

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        did = int(df["doc_id"].iloc[0])
        if len(a) == 0:
            status = "added"
        elif len(b) == 0:
            status = "removed"
        elif a["h"].iloc[0] != b["h"].iloc[0]:
            status = "changed"
        else:
            status = "unchanged"
        return pd.DataFrame({"doc_id": [did], "status": [status]})

    return (
        docs_ds.map_batches(snapshot_rows, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(classify, batch_format="pandas")
    )
