"""LLM-pipeline operators, part 5: corpus-level boilerplate detection,
Gopher-style rule-based quality filtering, and per-source document caps.

These extend the north-star training-data surface (SURVEY.md §2.4
"North-star LLM ops"): d33 is the corpus-wide face of dedup (d22 scores
repetition WITHIN a doc; d33 scores how much of a doc is shared ACROSS
docs — the C4/RefinedWeb "remove boilerplate spans" precursor), d34 is
the multi-rule quality gate from the Gopher paper's heuristics, d35 is
the per-domain cap used to stop any one source dominating a training
mix (the document-count face of d32's token-budget mixing weights).

All built-in expressions — no Python UDFs in any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kpipe_spark.catalog import load_tables
from kpipe_spark.queries import register

# Inlined tiny stopword list — identical literal on both engine sides.
_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


@register(
    "d33_boilerplate_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
      FROM toks,
           LATERAL (SELECT unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i) s
    ),
    dg AS (SELECT DISTINCT doc_id, g FROM grams),
    dfq AS (SELECT g, count(*) AS docfreq FROM dg GROUP BY g),
    frac AS (
      SELECT doc_id,
             avg(CASE WHEN docfreq >= 3 THEN 1.0 ELSE 0.0 END) AS bf
      FROM dg JOIN dfq USING (g)
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(round(bf, 4) AS DOUBLE) AS boilerplate_frac
    FROM frac
    WHERE bf >= 0.4
    """,
    description="corpus-level boilerplate: fraction of a doc's distinct "
    "3-gram shingles that occur in >= 3 documents; docs above 0.4 are "
    "flagged. Scale: the exploded (doc, gram) relation is ~len(doc) "
    "rows/doc; doc-frequency is one map-side-combined shuffle on the "
    "gram; the dg⋈dfq self-join reuses that gram partitioning. Hot "
    "boilerplate grams ARE the skewed keys — AQE skew-join splits "
    "them; at 100 TB you'd additionally bloom-prune dfq to "
    "docfreq >= threshold before the join (the filter is applied "
    "post-avg here because the denominator needs every gram).",
    tags=("llm", "dedup", "ngram", "corpus"),
)
def d33_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    # split projected ONCE per row: the gram transform references ts
    # 3x PER ELEMENT, and inline each reference re-runs the split
    # (interpreted HOFs get no CSE — the d22 lesson)
    ts = F.col("_ts")
    n = F.size(ts)
    grams = F.when(
        n >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(ts, i),
                    F.element_at(ts, i + 1),
                    F.element_at(ts, i + 2),
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    # spread the interpreted-HOF gram explode (1-split scan ran it
    # single-task) and materialize once — dg feeds both the docfreq
    # model aggregate and the scoring join, which otherwise re-run
    # the explode each (7.4 s -> ~1.5 s at sf0.1)
    from kpipe_spark.util import ensure_parallelism, materialize

    dg = materialize(
        ensure_parallelism(docs)
        .select("doc_id", F.split("text", " ").alias("_ts"))
        .select("doc_id", F.explode(grams).alias("g")),
        scale="corpus",
    )
    dfq = dg.groupBy("g").agg(F.count(F.lit(1)).alias("docfreq"))
    return (
        dg.join(dfq, "g")
        .groupBy("doc_id")
        .agg(
            F.avg(
                F.when(F.col("docfreq") >= 3, F.lit(1.0)).otherwise(F.lit(0.0))
            ).alias("bf")
        )
        .filter(F.col("bf") >= 0.4)
        .select(
            "doc_id", F.round("bf", 4).cast("double").alias("boilerplate_frac")
        )
    )


@register(
    "d34_gopher_quality_rules",
    oracle=f"""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             (len(text) - (len(string_split(text, ' ')) - 1)) * 1.0
               / len(string_split(text, ' ')) AS mwl,
             len(list_filter(string_split(text, ' '),
                 x -> x IN {_STOPWORDS!r})) * 1.0
               / len(string_split(text, ' ')) AS swf,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS dr
      FROM documents
    )
    SELECT doc_id,
           n_words,
           CAST(round(mwl, 4) AS DOUBLE) AS mean_word_len,
           CAST(round(swf, 4) AS DOUBLE) AS stopword_frac,
           CAST(round(dr, 4) AS DOUBLE) AS distinct_ratio,
           CAST(n_words >= 30 AND mwl BETWEEN 3 AND 6
                AND swf >= 0.01 AND dr >= 0.35 AS INTEGER) AS keep
    FROM m
    """,
    description="Gopher-style rule gate: word-count floor, mean-word-"
    "length band, stopword-fraction floor, distinct-token-ratio floor; "
    "emits per-doc metrics + 0/1 keep. Mean word length uses the "
    "chars-minus-separators identity (single-space corpus) instead of "
    "a per-token HOF — pure scan-local arithmetic, no shuffle at all; "
    "the whole query is one narrow projection over the corpus "
    "(perfectly partition-parallel at 100 TB).",
    tags=("llm", "quality", "filter"),
)
def d34_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    ts = F.split("text", " ")
    n = F.size(ts)
    mwl = (F.length("text") - (n - 1)) / n
    swf = F.size(F.filter(ts, lambda x: x.isin(*_STOPWORDS))) / n
    dr = F.size(F.array_distinct(ts)) / n
    keep = (
        (n >= 30) & mwl.between(3, 6) & (swf >= 0.01) & (dr >= 0.35)
    ).cast("int")
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mwl, 4).cast("double").alias("mean_word_len"),
        F.round(swf, 4).cast("double").alias("stopword_frac"),
        F.round(dr, 4).cast("double").alias("distinct_ratio"),
        keep.alias("keep"),
    )


@register(
    "d35_source_document_cap",
    oracle="""
    WITH ranked AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN rk <= 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(sum(CASE WHEN rk <= 10 THEN n_chars ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM ranked
    GROUP BY source
    """,
    description="per-source cap: keep the top-10 docs per source by "
    "size (n_chars desc, doc_id tie-break) and report per-source "
    "kept/total counts — the anti-domination guard for training "
    "mixes. Scale: one shuffle on source for the window rank; a "
    "skewed mega-source makes that partition hot — at 100 TB swap "
    "row_number for a two-phase per-partition top-k "
    "(rank within mapper, re-rank survivors), which this registry "
    "exposes as the same query shape; the follow-up agg reuses the "
    "source partitioning (no second exchange).",
    tags=("llm", "sampling", "window"),
)
def d35_source_document_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir).documents
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    kept = F.col("rk") <= 10
    return (
        docs.select("source", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars")).otherwise(0)).alias("kept_chars"),
        )
    )
