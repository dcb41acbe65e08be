"""Text-analysis column functions: language ID, quality scoring, token
counting, document fingerprinting. All JVM-side expressions (no Python)
with exact DuckDB-SQL mirrors for the correctness gate.

The heuristics are deliberately simple, deterministic, and
vocabulary-based (n-gram/stopword statistics) — the shape a 100 TB
training-data pipeline needs (cheap, vectorized, pushdown-friendly),
not a model."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

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


def repetition_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/C4-style repetition quality signals, all JVM-side:

      dup_line_frac  — fraction of non-empty lines that repeat an
                       earlier line (1 - distinct/total)
      top_2gram_frac — fraction of tokens covered by the single most
                       frequent word 2-gram (token-count flavor of
                       Gopher's most-common-n-gram character fraction)
      dup_3gram_frac — fraction of word 3-grams that are repeats

    100 TB shape: per-row array expressions only — no explode, no
    shuffle; the most-frequent-2-gram count is an O(n) fold over the
    SORTED gram array (max run length of equal neighbors), which stays
    in the JVM (higher-order functions are CodegenFallback but the
    fold is linear per row). Token/line/gram arrays materialize ONCE
    per row behind Generate barriers — referenced repeatedly inside
    one projection they would re-evaluate per use."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    step = df.withColumn(
        "_lines", F.explode(F.array(F.filter(F.split(raw, "\n"), lambda x: x != "")))
    )
    step = step.withColumn("_toks", F.explode(F.array(tokens_col(text_col))))
    n_lines = F.size("_lines").cast("double")
    dup_line = F.when(
        n_lines > 0,
        F.lit(1.0) - F.size(F.array_distinct("_lines")) / n_lines,
    ).otherwise(F.lit(0.0))

    def grams(n: int) -> Column:
        toks = F.col("_toks")
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    step = step.withColumn("_g2", F.explode(F.array(F.array_sort(grams(2)))))
    step = step.withColumn("_g3", F.explode(F.array(grams(3))))
    # max multiplicity = longest run of equal neighbors in the sorted
    # array: fold carrying (prev, run, best)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    best = F.aggregate(
        F.col("_g2"),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["best"],
                F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda a: a["best"],
    )
    n_toks = F.size("_toks").cast("double")
    top2 = F.when(
        F.size("_g2") > 0, F.least(F.lit(1.0), best * 2 / n_toks)
    ).otherwise(F.lit(0.0))
    n_g3 = F.size("_g3").cast("double")
    dup3 = F.when(
        n_g3 > 0, F.lit(1.0) - F.size(F.array_distinct("_g3")) / n_g3
    ).otherwise(F.lit(0.0))
    return (
        step.withColumn("dup_line_frac", dup_line)
        .withColumn("top_2gram_frac", top2)
        .withColumn("dup_3gram_frac", dup3)
        .drop("_lines", "_toks", "_g2", "_g3")
    )


def normalize_text_cols(
    df: DataFrame, text_col: str = "text", out_col: str = "norm_text"
) -> DataFrame:
    """Pre-tokenization text normalization — the cleaning pass a dedup/
    training pipeline runs before shingling so visually-identical docs
    actually hash together:

      1. Unicode NFC normalization (composed forms; é == e+combining)
      2. strip C0/C1 control characters (except \\t \\n \\r)
      3. collapse whitespace runs to one space + trim

    NFC is the one step Spark has no JVM expression for, so it runs as
    an Arrow-batched pandas UDF over Python's unicodedata (same UCD
    tables as DuckDB's nfc_normalize — verified equal in tests); the
    control-strip and collapse are codegen regexp_replace. Keep the NFC
    UDF adjacent to other Python stages in a plan so Catalyst fuses one
    Arrow round-trip, not three."""
    from pyspark.sql.functions import pandas_udf

    from cordon_spark.kernel import ws_class

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.fillna("").map(lambda t: unicodedata.normalize("NFC", t))

    ctrl = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u0080-\\u009F]"
    stripped = F.regexp_replace(nfc(F.col(text_col)), ctrl, "")
    collapsed = F.trim(F.regexp_replace(stripped, ws_class("java") + "+", " "))
    return df.withColumn(out_col, collapsed)


def char_entropy_cols(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy (bits/char) of the character distribution — the
    classic cheap randomness/perplexity proxy a curation pipeline uses
    to drop binary junk (high entropy) and degenerate repetition (low
    entropy) before any model-based scoring.

    100 TB shape: NO explode/shuffle — one vectorized Arrow batch pass,
    H = log2(n) - (sum_c cnt_c*log2(cnt_c)) / n with the contributions
    added in ascending-char order (a sequential float64 loop over the
    np.unique runs), which the SQL oracle reproduces exactly
    (list(cnt ORDER BY ch)). Chars are UTF-16 code units (the text is
    counted via its utf-16-le units) exactly like the previous Spark
    split-on-"" fold and unlike DuckDB's codepoints — identical for BMP
    text (everything in the fixtures); astral-plane text would diverge,
    by construction of the engines' string models.

    This replaced an equivalent JVM higher-order aggregate fold:
    HOFs are CodegenFallback, and the interpreted evaluator degrades
    ~3x in long sessions once its call sites go megamorphic (measured
    1.0s fresh -> 3.2s late in the bench sequence at sf1.0; the Arrow
    pass is a stable 0.55s). Raw values differ from the fold only by
    libm-vs-Math.log2 ulps (max 4.4e-15 across every fixture SF); the
    e4-rounded outputs every oracle compares are bit-identical at
    sf0.001/0.01/0.1/1.0, and no fixture doc sits within 1e-9 of the
    curation 3.0-bit threshold."""
    @F.pandas_udf(T.DoubleType())
    def _entropy(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for s in batches:
            vals = np.zeros(len(s), dtype=np.float64)
            for i, txt in enumerate(s.fillna("")):
                if not txt:
                    continue
                units = np.frombuffer(txt.encode("utf-16-le"), dtype=np.uint16)
                _, cnts = np.unique(units, return_counts=True)
                c = cnts.astype(np.float64)
                terms = c * np.log2(c)
                acc = 0.0
                for t in terms:  # ascending-char, left-to-right (oracle order)
                    acc += t
                n = float(len(units))
                vals[i] = np.log2(n) - acc / n
            yield pd.Series(vals)

    return df.withColumn("char_entropy", _entropy(F.col(text_col)))
