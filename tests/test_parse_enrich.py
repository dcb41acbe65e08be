"""Template parse stage (evaluate.py:131-179 semantics) + broadcast
enrichment joins."""

import pandas as pd
import re

from pyspark.sql import functions as F

from cordon_spark.datagen import TEMPLATES, tool_registry_pdf, role_taxonomy_pdf
from cordon_spark.operators.enrich import enrich_roles, enrich_tools
from cordon_spark.operators.parse import compile_templates, extract_templates


def test_wildcard_compilation_matches_reference_semantics():
    # re.escape then [*] -> .*? (evaluate.py:144-151)
    compiled = dict(compile_templates([("T1", "tool [*] returned exit code 0 in [*] ms")]))
    pat = re.compile(compiled["T1"])
    assert pat.search("tool bash returned exit code 0 in 12 ms")
    assert pat.search("prefix tool a b c returned exit code 0 in 999 ms suffix")
    assert not pat.search("tool bash returned exit code 1 in 12 ms")
    # regex metacharacters in the template are literal
    c2 = dict(compile_templates([("T2", "cost ($) is [*]")]))
    assert re.compile(c2["T2"]).search("cost ($) is 44")


def test_extract_templates_first_match_wins(spark):
    pdf = pd.DataFrame(
        {
            "conv_id": ["c"] * 3,
            "turn_idx": pd.Series([0, 1, 2], dtype="int32"),
            "text": [
                "user asks to run step 4 of plan 9",
                "FATAL segfault in tokenizer worker pid 4412 core dumped unexpectedly",
                "tool bash returned exit code 0 in 3 ms",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r.turn_idx: r.template_id for r in extract_templates(df, TEMPLATES).collect()}
    assert got[0] == "T01"
    assert got[1] is None  # anomaly text matches nothing
    assert got[2] == "T03"


def test_enrich_tools_broadcast_left_join(spark):
    turns = spark.createDataFrame(
        pd.DataFrame({"tool": ["bash", "fetch", None], "turn_idx": pd.Series([0, 1, 2], dtype="int32")})
    )
    dim = spark.createDataFrame(tool_registry_pdf())
    got = {r.turn_idx: r for r in enrich_tools(turns, dim).collect()}
    assert got[0].tool_category == "exec" and got[0].risk_level == 3
    assert got[1].tool_category == "unknown" and got[1].risk_level == 0  # missing key
    assert got[2].tool_category == "unknown"
    # plan check: must be a broadcast join, not a shuffle join
    plan = enrich_tools(turns, dim)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_enrich_roles(spark):
    turns = spark.createDataFrame(pd.DataFrame({"role": ["user", "alien"]}))
    dim = spark.createDataFrame(role_taxonomy_pdf())
    got = {r.role: r.role_group for r in enrich_roles(turns, dim).collect()}
    assert got == {"user": "human", "alien": "unknown"}


def test_pipeline_routes_enriched_turns(spark):
    """north_star: enrichment dims ride through the router — routed rows
    carry tool_category/risk_level/role_group with missing-key defaults,
    and sink decisions are unchanged vs the unenriched run."""
    from cordon_spark.config import AnalysisConfig
    from cordon_spark.datagen import (
        generate_transcripts,
        role_taxonomy_pdf,
        tool_registry_pdf,
    )
    from cordon_spark.plans.pipeline import analyze_transcripts

    pdf, _ = generate_transcripts(n_convs=4, mean_turns=30, seed=11, with_edge_cases=False)
    df = spark.createDataFrame(pdf)
    cfg = AnalysisConfig()

    plain = analyze_transcripts(spark, df, cfg)
    enriched = analyze_transcripts(
        spark,
        df,
        cfg,
        tool_registry=spark.createDataFrame(tool_registry_pdf()),
        role_taxonomy=spark.createDataFrame(role_taxonomy_pdf()),
    )
    try:
        cols = set(enriched.routed.columns)
        assert {"tool_category", "risk_level", "role_group", "sink"} <= cols
        assert plain.counts == enriched.counts
        # missing-key defaults: 'fetch' is absent from the registry
        rows = enriched.routed.filter("tool = 'fetch'").select(
            "tool_category", "risk_level"
        ).distinct().collect()
        assert [(r.tool_category, r.risk_level) for r in rows] == [("unknown", 0)]
        # sink decision per turn identical
        p = {(r.conv_id, r.turn_idx): r.sink for r in plain.routed.collect()}
        e = {(r.conv_id, r.turn_idx): r.sink for r in enriched.routed.collect()}
        assert p == e
    finally:
        plain.unpersist()
        enriched.unpersist()


def test_salted_join_equals_plain_join(spark):
    """salted_join output == the unsalted join as a multiset, for
    inner AND fact-preserving left, on a corpus with one hot key that
    owns 90% of the fact rows and a dim key with no fact match."""
    from pyspark.sql import functions as F

    from cordon_spark.operators.enrich import salted_join

    hot = spark.range(0, 900).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    tail = spark.range(0, 100).select(
        (F.col("id") % 10).alias("k"), (F.col("id") + 10_000).alias("v")
    )
    facts = hot.union(tail)
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(12)], "k long, label string"
    )  # keys 10,11 match nothing; fact key 7 is hot
    for how in ("inner", "left"):
        plain = facts.join(dim, on="k", how=how)
        salted = salted_join(facts, dim, on="k", buckets=8, how=how)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, salted.collect())
        ), how


def test_salted_join_spreads_hot_key_across_partitions(spark):
    """The point of the salt: the hot key's rows must land in MANY
    shuffle partitions (the plain join concentrates them in one)."""
    from pyspark.sql import functions as F

    from cordon_spark.operators.enrich import salted_join

    # 90% of rows on key 7, the rest spread — k must stay non-constant
    # or Catalyst constant-folds it out of the join keys entirely
    facts = spark.range(0, 2000).select(
        F.when(F.col("id") < 1800, F.lit(7)).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in (7, 0, 1, 2, 3, 4)], "k long, label string"
    )

    salted = salted_join(facts, dim.hint("shuffle_hash"), on="k", buckets=4)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    # the exchange must key on (k, _salt) — the hot key hashes to 4
    # distinct shuffle keys instead of 1 (AQE may still coalesce the
    # tiny TEST partitions afterwards; the key space is the mechanism)
    assert "hashpartitioning(k" in plan and "_salt" in plan, plan
    # and the salt actually splits the hot key's rows
    n_salts = (
        facts.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in facts.columns]), F.lit(4)),
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 4


def test_salted_join_rejects_unsupported_how(spark):
    import pytest as _pytest

    from cordon_spark.operators.enrich import salted_join

    df = spark.range(1).select(F.col("id").alias("k"))
    with _pytest.raises(ValueError):
        salted_join(df, df, on="k", how="right")
