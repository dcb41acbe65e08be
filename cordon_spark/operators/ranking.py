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

Document frequency is deliberately NOT a count window over the tf
frame (`F.count(1).over(Window.partitionBy("term"))`): a window has no
partial aggregation, so every row of a term must co-reside in one
task, and term frequency is Zipfian — at 10^9 docs a stopword's
whole-partition window is a ~10^9-row straggler/OOM task. Instead the
tf frame is persisted ONCE (so the corpus aggregation is computed
once, not re-planned per consumer) and df is derived from it with a
hash aggregation — map-side partials collapse each upstream partition
to one row per term before the exchange, which makes hash aggregation
skew-safe where the window is not — then joined back (broadcast by
default; the df frame is O(vocabulary) rows of (term, count); pass
broadcast_df=False for vocabularies too big to broadcast, where the
shuffle join is AQE-skew-split eligible).

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


def _attach_df(tf: DataFrame, broadcast_df: bool = True) -> DataFrame:
    """Attach per-term document frequency to a one-row-per-(doc, term)
    tf frame the skew-safe way (see module docstring): persist tf so
    the corpus aggregation behind it is computed exactly once, derive
    df from it with a map-side-combined hash aggregation, join back.
    The persist is MEMORY_AND_DISK (Spark's DataFrame default) — the
    tf frame is the DEDUPED (doc, term) set, orders of magnitude
    smaller than the token stream it aggregates."""
    tf = tf.persist()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    if broadcast_df:
        dfreq = F.broadcast(dfreq)
    return tf.join(dfreq, on="term")


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_df: bool = True,
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, the sklearn smooth_idf convention):
    output (id, rank, term, tfidf), deterministic tie-break by term.

    Plan: ONE corpus pass — the (doc, term) tf hash agg, persisted —
    then df is a skew-safe hash aggregation over the persisted tf
    joined back by broadcast (_attach_df; never a whole-partition
    window on the Zipfian term key). N joins in as a broadcast 1-row
    aggregate (count-only parquet scan); the top-k window partitions
    by doc over the few distinct terms per doc."""
    terms = _doc_terms(docs, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        _attach_df(tf, broadcast_df)
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
    matching occurrences; df is then a skew-safe hash aggregation over
    the (tiny, query-term-bounded) persisted tf frame joined back by
    broadcast (_attach_df — same spelling as tfidf_top_terms), not a
    second corpus aggregation and not a whole-partition window.
    Corpus passes: the pruned term explode, plus the dl projection
    (text column only — column pruning reaches the scan)."""
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
    tf = _attach_df(tf)
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
