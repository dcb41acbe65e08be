"""Plan-shape regression guards: the scale properties PLANS.md claims
(shuffle counts, broadcasts, pushdown) asserted on the EXECUTED plans,
so a refactor that silently adds an exchange or breaks pushdown fails
CI instead of surfacing at 100 TB."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _counts(df):
    p = _plan(df)
    bc = p.count("BroadcastExchange")
    return {"shuffles": p.count("Exchange") - bc, "broadcasts": bc, "plan": p}


def test_pii_and_stratified_are_shuffle_free(spark):
    from cordon_spark import entry_queries as Q

    for name in ("pii_scrub", "stratified_sample"):
        c = _counts(Q.QUERIES[name](spark, SF_DIR))
        assert c["shuffles"] == 0, f"{name} grew a shuffle:\n{c['plan']}"


def test_pack_sequences_single_shuffle(spark):
    from cordon_spark import entry_queries as Q

    c = _counts(Q.QUERIES["pack_sequences"](spark, SF_DIR))
    assert c["shuffles"] == 1  # the keyed window cumsum, nothing else


def test_asof_join_single_shuffle_above_union(spark):
    """The operator itself must shuffle each side exactly once: one
    Exchange above the Union feeding the Window (the entry query adds
    one more for its right-side dedup agg, excluded here by building
    the operator input directly)."""
    from cordon_spark.operators.events import asof_join

    left = spark.createDataFrame([(1, 10, 100)], "event_id long, user_id long, us long")
    right = spark.createDataFrame([(10, 50, 1.0)], "user_id long, us long, pv double")
    c = _counts(asof_join(left, right, key_col="user_id", ts_col="us", value_cols=("pv",)))
    assert c["shuffles"] == 1, c["plan"]
    assert "Window" in c["plan"] and "Union" in c["plan"]


def test_windowed_segmentation_single_shuffle(spark):
    from cordon_spark import entry_queries as Q

    c = _counts(Q.QUERIES["window_segment"](spark, SF_DIR))
    assert c["shuffles"] == 1, c["plan"]


def test_scan_pushdown_reaches_parquet(spark):
    """Filters and column pruning must reach the parquet scan: the
    brief's explicit requirement (a scan reading all columns for a
    2-column projection is wrong)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    p = _plan(df)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in p
    assert "ReadSchema: struct<doc_id:bigint,lang:string>" in p


def test_dedup_minhash_no_cartesian(spark):
    """The r1 regression that must never come back: the minhash plan
    contains no CartesianProduct / BroadcastNestedLoopJoin."""
    from cordon_spark import entry_queries as Q

    p = _plan(Q.QUERIES["dedup_minhash_lsh"](spark, SF_DIR))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_knn_score_zero_shuffle(spark):
    """Broadcast-matrix kNN scoring is a pure map: no exchange at all."""
    from cordon_spark import entry_queries as Q

    c = _counts(Q.QUERIES["knn_score"](spark, SF_DIR))
    assert c["shuffles"] == 0, c["plan"]


def test_tfidf_single_corpus_aggregation(spark):
    """TF-IDF: the corpus-side (doc, term) aggregation must appear
    EXACTLY once in the plan — df is a count window over the tf
    output, NOT a join against a second corpus agg (the join spelling
    plans the big agg subtree twice; measured, no exchange reuse)."""
    from cordon_spark import entry_queries as Q

    c = _counts(Q.QUERIES["tfidf_terms"](spark, SF_DIR))
    big_aggs = [
        ln
        for ln in c["plan"].splitlines()
        if "Exchange hashpartitioning(" in ln
        and "doc_id" in ln
        and "term" in ln
    ]
    assert len(big_aggs) == 1, c["plan"]
    assert c["broadcasts"] >= 1, c["plan"]  # the 1-row n_docs agg


def test_char_entropy_shuffle_free(spark):
    """Entropy is a per-row sorted-run fold: zero exchanges."""
    from cordon_spark.functions.text import char_entropy_cols

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    c = _counts(char_entropy_cols(df).select("doc_id", "char_entropy"))
    assert c["shuffles"] == 0, c["plan"]


def test_tpch_q3_broadcast_dim_and_pushdown(spark):
    """Shipping-priority join: the filtered customer dimension
    broadcasts; the date predicates reach the parquet scans."""
    from cordon_spark import entry_queries as Q

    df = Q.QUERIES["tpch_shipping_priority"](spark, SF_DIR)
    c = _counts(df)
    assert c["broadcasts"] >= 1, c["plan"]
    assert "PushedFilters" in c["plan"]
    assert "l_shipdate" in c["plan"] and "o_orderdate" in c["plan"]
