"""End-to-end corpus curation composition — the pipeline an LLM
training-data run actually executes, as ONE driver-checkable query:

    quality filter → exact dedup (keep first) → near-dup keep-one
    → benchmark decontamination → per-source survivor report

Every stage is an already-oracle-backed operator (docs_quality_filter,
docs_exact_dedup, docs_neardup_keep_one, docs_decontaminate); this
module chains them id-centrically — each stage narrows a (doc_id, text)
STREAM, never materializing the corpus — and the SQL twin chains the
same five CTE blocks, so the composition itself (ordering, join
semantics, survivor bookkeeping) is what the value-hash certifies.

Scale shape: three cogroup joins on doc_id (winner/survivor semi-joins
— the id tables hold only survivors of each narrowing), the stages'
own partitioned shuffles, and one bounded per-source combine at the
tail. Benchmark side of decontamination is doc_id % 10 == 0 of the
ORIGINAL corpus (the driver's standing synthetic test set).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def curation_pipeline(sf_dir: str, neardup_threshold: float = 0.6,
                      decontam_n: int = 8,
                      pair_source: str = "exact"):
    import ray.data as rd

    from autoner_ray.cluster import default_num_partitions
    from autoner_ray.stages.analysis import quality_batch
    from autoner_ray.stages.combine import (
        bounded_key_sum,
        partitioned_key_agg,
    )
    from autoner_ray.stages.decontam import decontaminate
    from autoner_ray.stages.dedup import neardup_keep_one
    from autoner_ray.stages.joins import cogroup_join

    P = default_num_partitions()
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # -- stage 1: quality filter (docs_quality_filter thresholds) -----
    def q_keep(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or len(batch) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        q = quality_batch(batch)
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(q["n_words"], 20),
                pc.greater_equal(q["stop_ratio"], 0.02),
            ),
            pc.less_equal(q["mean_word_len"], 5.0),
        )
        return batch.select(["doc_id", "text"]).filter(mask)

    filtered = docs.map_batches(
        q_keep, batch_format="pyarrow"
    ).materialize()  # feeds md5-winner pass AND the winner semi-join

    # -- stage 2: exact dedup, keep smallest doc_id per text md5 ------
    import hashlib

    def md5_rows(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "m": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                }
            )
        hs = [
            hashlib.md5((x or "").encode()).hexdigest()
            for x in t["text"].to_pylist()
        ]
        return pa.table({"m": pa.array(hs, pa.string()),
                         "doc_id": t["doc_id"]})

    winners = partitioned_key_agg(
        filtered.map_batches(md5_rows, batch_format="pyarrow"),
        ["m"], [("doc_id", "min")], part_on=("m",),
    ).select_columns(["doc_id"])

    def strip_extra(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        return t.select(["doc_id", "text"])

    deduped = cogroup_join(
        filtered, winners, on=("doc_id",), num_partitions=P
    ).map_batches(strip_extra, batch_format="pyarrow").materialize()

    # -- stage 3: near-dup keep-one over the deduped stream -----------
    # pair_source="exact" keeps the oracle-checkable shared-shingle
    # join (the driver row); "lsh" is the sub-quadratic at-scale tier
    # the stress bench exercises (bench.py --stress)
    survivors = neardup_keep_one(
        deduped, threshold=neardup_threshold, pair_source=pair_source
    ).materialize()
    surv_docs = cogroup_join(
        deduped, survivors, on=("doc_id",), num_partitions=P
    ).map_batches(strip_extra, batch_format="pyarrow")

    # -- stage 4: decontamination vs the id%10==0 benchmark split -----
    def corpus_side(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                }
            )
        # doc_id % 10 != 0 via trunc-div (doc_ids are non-negative)
        mask = pc.not_equal(
            pc.subtract(
                t["doc_id"],
                pc.multiply(pc.divide(t["doc_id"], 10), 10),
            ),
            0,
        )
        return t.filter(mask)

    bench = docs.map_batches(
        lambda t: t.filter(
            pc.equal(
                pc.subtract(
                    t["doc_id"],
                    pc.multiply(pc.divide(t["doc_id"], 10), 10),
                ),
                0,
            )
        )
        if len(t) else t,
        batch_format="pyarrow",
    )
    corpus = surv_docs.map_batches(corpus_side, batch_format="pyarrow")
    final_docs = decontaminate(corpus, bench, n=decontam_n)

    # -- stage 5: per-source survivor report --------------------------
    meta = rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "n_chars"],
    )
    final_ids = final_docs.select_columns(["doc_id"])
    joined = cogroup_join(
        meta, final_ids, on=("doc_id",), num_partitions=P
    )

    def report_partial(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or len(t) == 0 or "source" not in (
            t.column_names
        ):
            return pa.table(
                {
                    "source": pa.array([], pa.string()),
                    "n_docs": pa.array([], pa.int64()),
                    "sum_chars": pa.array([], pa.int64()),
                }
            )
        agg = (
            t.select(["source", "n_chars"])
            .group_by("source")
            .aggregate([("n_chars", "count"), ("n_chars", "sum")])
        )
        return agg.rename_columns(["source", "n_docs", "sum_chars"])

    return bounded_key_sum(
        joined.map_batches(report_partial, batch_format="pyarrow"),
        ["source"], ["n_docs", "sum_chars"],
    )


def curation_pipeline_oracle_sql(neardup_threshold: float = 0.6,
                                 decontam_n: int = 8) -> str:
    g = decontam_n - 1
    return f"""
        WITH RECURSIVE q AS MATERIALIZED (
            SELECT doc_id, text FROM (
                SELECT doc_id, text,
                       CAST(len(string_split(text, ' ')) AS BIGINT)
                           AS n_words,
                       round(len(list_filter(string_split(text, ' '),
                                 w -> w IN ('a', 'the')))
                             / CAST(len(string_split(text, ' '))
                                    AS DOUBLE), 6) AS stop_ratio,
                       round(list_aggregate(
                                 list_transform(string_split(text, ' '),
                                                w -> length(w)), 'sum')
                             / CAST(len(string_split(text, ' '))
                                    AS DOUBLE), 6) AS mean_word_len
                FROM documents
            )
            WHERE n_words >= 20 AND stop_ratio >= 0.02
              AND mean_word_len <= 5.0
        ),
        dd AS MATERIALIZED (
            SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
        ),
        d AS MATERIALIZED (
            SELECT q.doc_id, q.text FROM q JOIN dd USING (doc_id)
        ),
        toks AS MATERIALIZED (
            SELECT doc_id, string_split(text, ' ') AS w FROM d
        ),
        sh AS (
            SELECT doc_id,
                   CASE WHEN len(w) = 0 THEN []
                        WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
                        ELSE list_transform(range(1, len(w) - 1),
                             i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   END AS shingles
            FROM toks
        ),
        ds AS MATERIALIZED (
            SELECT DISTINCT doc_id, t.s FROM sh, UNNEST(shingles) AS t(s)
        ),
        sizes AS (
            SELECT doc_id, COUNT(*) AS sz FROM ds GROUP BY doc_id
        ),
        common AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM ds a JOIN ds b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        nd_pairs AS MATERIALIZED (
            SELECT doc_a, doc_b FROM common
            JOIN sizes sa ON sa.doc_id = doc_a
            JOIN sizes sb ON sb.doc_id = doc_b
            WHERE CAST(c AS DOUBLE) / CAST(sa.sz + sb.sz - c AS DOUBLE)
                  >= {neardup_threshold}
        ),
        bidir AS (
            SELECT doc_a AS u, doc_b AS v FROM nd_pairs
            UNION ALL SELECT doc_b, doc_a FROM nd_pairs
        ),
        reach(a, b) AS (
            SELECT u, u FROM bidir
            UNION
            SELECT r.a, e.v FROM reach r JOIN bidir e ON e.u = r.b
        ),
        nd_losers AS (
            SELECT a AS doc_id FROM reach GROUP BY a HAVING MIN(b) < a
        ),
        s3 AS MATERIALIZED (
            SELECT d.doc_id, d.text FROM d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM nd_losers)
        ),
        corpus AS MATERIALIZED (
            SELECT doc_id, text FROM s3 WHERE doc_id % 10 <> 0
        ),
        bench_grams AS MATERIALIZED (
            SELECT DISTINCT array_to_string(w[i:i+{g}], ' ') AS gr
            FROM (SELECT string_split(text, ' ') AS w FROM documents
                  WHERE doc_id % 10 = 0),
                 unnest(generate_series(
                     1, greatest(len(w) - {g}, 0))) AS t(i)
        ),
        corpus_grams AS (
            SELECT DISTINCT doc_id, array_to_string(w[i:i+{g}], ' ') AS gr
            FROM (SELECT doc_id, string_split(text, ' ') AS w
                  FROM corpus),
                 unnest(generate_series(
                     1, greatest(len(w) - {g}, 0))) AS t(i)
        ),
        contaminated AS (
            SELECT DISTINCT cg.doc_id
            FROM corpus_grams cg JOIN bench_grams b ON cg.gr = b.gr
        ),
        final AS (
            SELECT c.doc_id FROM corpus c
            WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)
        )
        SELECT doc.source, COUNT(*) AS n_docs,
               CAST(SUM(doc.n_chars) AS BIGINT) AS sum_chars
        FROM final f JOIN documents doc ON f.doc_id = doc.doc_id
        GROUP BY doc.source
    """
