"""Corpus ranking / lexical retrieval over the documents table:
TF-IDF top-terms per document and BM25 keyword search.

These are the lexical half of a training-data curation stack (the
embedding half lives in operators/similarity.py): TF-IDF surfaces each
document's characteristic vocabulary (keyword extraction, near-dup
triage, topic clustering features); BM25 is the standard retrieval
scorer for quality-probe queries over a 100 TB corpus ("find the docs
about X" without an embedding index).

Scale notes: both operators are TWO hash aggregations + one join —
(doc, term) tf counts and per-term document frequencies — all
map-side-combined; the df side is O(vocabulary) and broadcasts. The
corpus statistics (N, avgdl) are 1-row aggregates joined in by
broadcast, not driver-side constants smuggled into the plan, so the
whole thing is a single declarative plan Catalyst can prune. No Python
anywhere.

Tokenization is the shared whitespace family (dedup.tokens_col ==
kernel.tokenize == the SQL regexp_split_to_array mirror), so oracles
reproduce token-for-token.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from cordon_spark.operators.dedup import tokens_col


def _doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term) with one row per token OCCURRENCE (duplicates kept —
    tf needs them), token array materialized once behind the Generate."""
    return docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("term")
    )


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smooth_idf convention):
    output (id, rank, term, tfidf), deterministic tie-break by term.

    Plan: ONE corpus pass — the (doc, term) tf hash agg — then df is a
    COUNT WINDOW over the tf output partitioned by term (tf rows are
    already one-per-(doc,term), so the window count IS the document
    frequency). A join of tf against a separate df aggregate spells
    the same thing but Spark plans the (doc,term) agg subtree TWICE
    (no exchange reuse across the self-join — measured on the executed
    plan), i.e. two full corpus aggregations at 100 TB; the window
    form re-shuffles only the tiny deduped tf frame. N joins in as a
    broadcast 1-row aggregate (count-only parquet scan); the top-k
    window partitions by doc over the few distinct terms per doc."""
    terms = _doc_terms(docs, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("term")))
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                + F.lit(1.0)
            ),
        )
    )
    w = W.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            "tfidf",
        )
    )


def bm25_search(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 scores for every document matching >=1 query term:
    (id, score), higher = more relevant.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (the Robertson-Sparck
    Jones form Lucene uses, always positive); length norm uses the
    whitespace token count against the corpus mean. The query-term
    filter is an isin over a literal list — it prunes the exploded
    terms BEFORE the tf aggregation, so the shuffle carries only
    matching occurrences; df is then a count window over the (tiny)
    tf output, not a second corpus aggregation (same reasoning as
    tfidf_top_terms). Corpus passes: the pruned term explode, plus the
    dl projection (text column only — column pruning reaches the
    scan)."""
    terms = _doc_terms(docs, id_col, text_col)
    dl = docs.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("double").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size(tokens_col(text_col))).alias("avgdl"),
    )
    qt = terms.filter(F.col("term").isin(list(query_terms)))
    tf = qt.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency of each query term = docs with tf >= 1
    tf = tf.withColumn("df", F.count(F.lit(1)).over(W.partitionBy("term")))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf")
        + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    per_term = (
        tf.join(dl, on=id_col)
        .join(F.broadcast(stats))
        .select(F.col(id_col), (idf * norm_tf).alias("s"))
    )
    # decimal sum: the per-term partials are identical doubles on any
    # engine, and decimal accumulation is order-independent — same
    # cross-engine convention as the event value sums (events.py)
    return per_term.groupBy(id_col).agg(
        F.sum(F.col("s").cast("decimal(20,6)"))
        .cast("decimal(20,6)")
        .alias("score")
    )
