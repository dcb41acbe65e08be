"""Text-analysis column functions: language ID, quality scoring, token
counting, document fingerprinting. All JVM-side expressions (no Python)
with exact DuckDB-SQL mirrors for the correctness gate.

The heuristics are deliberately simple, deterministic, and
vocabulary-based (n-gram/stopword statistics) — the shape a 100 TB
training-data pipeline needs (cheap, vectorized, pushdown-friendly),
not a model."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from cordon_spark.operators.dedup import shingles_col, tokens_col

EN_STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]


def _stop_array() -> str:
    return "array(" + ",".join(f"'{w}'" for w in EN_STOPWORDS) + ")"


def token_count_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_tokens (whitespace), n_alnum_tokens (BPE-ish [a-z0-9]+ runs),
    n_chars."""
    toks = tokens_col(text_col)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn(
            "n_alnum_tokens",
            F.expr(f"regexp_count(lower({text_col}), '[a-z0-9]+')").cast("long"),
        )
        .withColumn("n_chars", F.length(text_col).cast("long"))
    )


def lang_id_cols(df: DataFrame, text_col: str = "text", min_ratio: float = 0.05) -> DataFrame:
    """pred_lang: 'en' when the English stopword ratio clears min_ratio,
    else 'other' (n-gram/stopword heuristic language ID)."""
    toks = tokens_col(text_col)
    hits = F.size(F.array_intersect(toks, F.expr(_stop_array()))).cast("long")
    # ratio over token count; empty docs -> 'other'
    ratio = hits / F.greatest(F.size(toks).cast("double"), F.lit(1.0))
    return df.withColumn("en_hits_distinct", hits).withColumn(
        "pred_lang", F.when(ratio >= F.lit(min_ratio), F.lit("en")).otherwise(F.lit("other"))
    )


def quality_score_col(text_col: str = "text") -> Column:
    """0.4 * min(1, n_tokens/100) + 0.3 * type-token-ratio + 0.3 *
    stopword-ratio (length / diversity / naturalness mix)."""
    toks = tokens_col(text_col)
    n = F.size(toks).cast("double")
    n_safe = F.greatest(n, F.lit(1.0))
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_safe
    stop_ratio = F.size(F.array_intersect(F.array_distinct(toks), F.expr(_stop_array()))).cast(
        "double"
    ) / F.lit(float(len(EN_STOPWORDS)))
    return (
        F.lit(0.4) * F.least(F.lit(1.0), n / F.lit(100.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * stop_ratio
    )


def fingerprint_col(text_col: str = "text", n: int = 5) -> Column:
    """Document fingerprint: lexicographic MIN md5 over n-token shingles
    (min-hash winnowing); short docs hash their full token string, and
    empty docs keep a stable fingerprint md5('') (shingles_col itself
    emits none for empty docs — dedup semantics differ deliberately).
    Column form — for per-corpus paths prefer with_fingerprint (token
    materialization barrier)."""
    sh = shingles_col(tokens_col(text_col), n)
    sh = F.when(F.size(sh) == 0, F.array(F.lit(""))).otherwise(sh)
    return F.array_min(F.transform(sh, lambda s: F.md5(s)))


def with_fingerprint(
    df: DataFrame, text_col: str = "text", n: int = 5, out: str = "fingerprint"
) -> DataFrame:
    """DataFrame form of fingerprint_col with the shingle/token arrays
    materialized once per row (dedup.with_shingles barrier) — the Column
    form re-evaluates tokenize per shingle inside its lambdas."""
    from cordon_spark.operators.dedup import with_shingles

    step = with_shingles(df, n, text_col, out="_sh")
    # _sh is already a materialized attribute; the when-wrapped array is
    # referenced exactly once below, so no further barrier is needed
    sh = F.when(F.size("_sh") == 0, F.array(F.lit(""))).otherwise(F.col("_sh"))
    return step.withColumn(
        out, F.array_min(F.transform(sh, lambda s: F.md5(s)))
    ).drop("_sh")
