"""Text analysis over the `documents` table (training-data pipeline ops).

These are first-class components of the engine (beyond the reference's T1-T20
kernel set): token counting, language ID, quality scoring, fingerprinting.
All pure Catalyst expressions — one codegen'd projection per query, no Python
in the hot path, embarrassingly parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minarrow_spark.functions.text import (
    BPE_PATTERN,
    LANG_PATTERNS,
    PUNCT_PATTERN,
    bpe_token_count,
    fingerprint,
    lang_predict,
    lang_scores,
    quality_score,
    token_count,
)
from minarrow_spark.queries._util import T, par
from minarrow_spark.registry import query

_SQL_TOKENS = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
)


def _sql_score(lang: str) -> str:
    return f"len(regexp_extract_all(lower(text), '{LANG_PATTERNS[lang]}'))"


_SQL_BPE = BPE_PATTERN.replace("'", "''")

@query(
    "q30_token_stats",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM({_SQL_TOKENS}) AS BIGINT) AS total_tokens,
           CAST(MAX({_SQL_TOKENS}) AS BIGINT) AS max_tokens,
           CAST(SUM(len(regexp_extract_all(lower(text), '{_SQL_BPE}')))
                AS BIGINT) AS total_bpe_tokens,
           CAST(MAX(len(regexp_extract_all(lower(text), '{_SQL_BPE}')))
                AS BIGINT) AS max_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("text", "tokenize"),
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token statistics per language, both counting tiers (integer sums →
    exact): whitespace tokens and BPE-ish subword-boundary tokens (the
    pre-merge count a byte-pair tokenizer starts from — see
    functions/text.py BPE_PATTERN for the cross-engine regex contract)."""
    d = par(T(spark, sf_dir, "documents"))
    nt = token_count(F.col("text"))
    nb = bpe_token_count(F.col("text"))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(nt).cast("bigint").alias("total_tokens"),
        F.max(nt).cast("bigint").alias("max_tokens"),
        F.sum(nb).cast("bigint").alias("total_bpe_tokens"),
        F.max(nb).cast("bigint").alias("max_bpe_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


@query(
    "q31_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT lang,
             {_sql_score('en')} AS s_en,
             {_sql_score('es')} AS s_es,
             {_sql_score('fr')} AS s_fr,
             {_sql_score('de')} AS s_de,
             {_sql_score('zh')} AS s_zh
      FROM documents
    )
    SELECT lang,
           CASE
             WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de AND s_en >= s_zh
               THEN 'en'
             WHEN s_es >= s_en AND s_es >= s_fr AND s_es >= s_de AND s_es >= s_zh
               THEN 'es'
             WHEN s_fr >= s_en AND s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh
               THEN 'fr'
             WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh
               THEN 'de'
             ELSE 'zh'
           END AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM scored
    GROUP BY 1, 2
    """,
    tags=("text", "lang-id"),
)
def q31_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword language-ID heuristic: confusion counts of labeled
    vs predicted language."""
    d = par(T(spark, sf_dir, "documents"))
    return (
        d.select("lang", lang_predict(F.col("text")).alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q32_quality_score",
    oracle=f"""
    WITH q AS (
      SELECT source,
             CAST({_SQL_TOKENS} AS DOUBLE) AS n_tok,
             CAST(length(text) AS DOUBLE) AS n_char,
             CAST({_sql_score('en')} AS DOUBLE) AS stop,
             CAST(len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS DOUBLE) AS punct
      FROM documents
    ), s AS (
      SELECT source,
             (3.0 * stop + n_tok)
             / (n_tok + 5.0 * punct
                + (CASE WHEN n_tok > 0 THEN n_char / n_tok ELSE 0.0 END)
                + 1.0) AS score
      FROM q
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) AS total_score,
           CAST(SUM(CASE WHEN score >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_good
    FROM s
    GROUP BY source
    """,
    tags=("text", "quality"),
)
def q32_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring (rational arithmetic only → deterministic);
    per-source keep/drop accounting as a filter pipeline would use it."""
    d = par(T(spark, sf_dir, "documents"))
    score = quality_score(F.col("text"))
    return (
        d.select("source", score.alias("score"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("score").cast("decimal(18,6)")).cast("double").alias("total_score"),
            F.sum(F.when(F.col("score") >= 0.5, 1).otherwise(0))
            .cast("bigint")
            .alias("n_good"),
        )
    )


@query(
    "q33_fingerprint",
    oracle="""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))
                AS BIGINT) AS n_unique,
           min(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))) AS min_fp
    FROM documents
    GROUP BY source
    """,
    tags=("text", "fingerprint"),
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text md5 fingerprinting; per-source uniqueness accounting
    (the scalable pre-pass for exact dedup)."""
    d = par(T(spark, sf_dir, "documents"))
    fp = fingerprint(F.col("text"))
    return d.select("source", fp.alias("fp")).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_unique"),
        F.min("fp").alias("min_fp"),
    )
