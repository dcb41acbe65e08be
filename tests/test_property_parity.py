"""Property-based Spark-vs-oracle parity (hypothesis): randomized small
corpora and configs must produce the exact reference anomaly set.
Few examples (each runs real Spark jobs) but wide input space."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, assume, given, settings, strategies as st

from cordon_spark.config import AnalysisConfig
from cordon_spark.oracle import run_oracle
from cordon_spark.plans.pipeline import analyze_transcripts

VOCAB = ["alpha", "beta", "gamma", "delta", "error", "ok", "retry", "x1", "x2", ""]


@st.composite
def corpora(draw):
    n_convs = draw(st.integers(1, 3))
    rows = []
    for c in range(n_convs):
        n_turns = draw(st.integers(1, 18))
        for t in range(n_turns):
            n_words = draw(st.integers(0, 5))
            words = [VOCAB[draw(st.integers(0, len(VOCAB) - 1))] for _ in range(n_words)]
            trail = draw(st.sampled_from(["", " ", "\t", "  "]))
            rows.append((f"c{c}", t, " ".join(words) + trail))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf


@st.composite
def configs(draw):
    mode = draw(st.sampled_from(["pct", "range", "all", "none"]))
    kwargs = dict(
        window_size=draw(st.integers(1, 5)),
        k_neighbors=draw(st.integers(1, 8)),
    )
    if mode == "pct":
        kwargs["anomaly_percentile"] = draw(
            st.sampled_from([0.02, 0.1, 0.25, 0.5, 0.9])
        )
    elif mode == "all":
        kwargs["anomaly_percentile"] = 1.0
    elif mode == "none":
        kwargs["anomaly_percentile"] = 0.0
    else:
        lo = draw(st.sampled_from([0.0, 0.05, 0.2]))
        hi = draw(st.sampled_from([0.3, 0.5, 0.9]))
        kwargs["anomaly_range_min"] = lo
        kwargs["anomaly_range_max"] = hi
    return AnalysisConfig(**kwargs)


def _blocks(pdf):
    return {
        (r.conv_id, int(r.start_idx), int(r.end_idx), round(float(r.max_score), 6))
        for r in pdf.itertuples()
    }


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(corpus=corpora(), cfg=configs())
def test_random_corpus_exact_parity(spark, corpus, cfg):
    oracle = run_oracle(corpus, cfg)
    res = analyze_transcripts(spark, spark.createDataFrame(corpus), cfg)
    got = (
        res.scored_windows.orderBy("conv_id", "window_id")
        .select("conv_id", "window_id", "score")
        .toPandas()
    )
    exp = oracle.windows[["conv_id", "window_id", "score"]].reset_index(drop=True)
    assert len(got) == len(exp)
    got_s, exp_s = got.score.to_numpy(), exp.score.to_numpy()
    assert np.allclose(got_s, exp_s, atol=1e-12)
    if not np.array_equal(got_s, exp_s):
        # dgemm results are shape-dependent (see operators/scoring.py
        # header): when the two engines' scores differ in the last ulp,
        # a score sitting essentially ON the percentile threshold can
        # legitimately land on either side. Discard those knife-edge
        # draws — the property being tested is pipeline parity, not
        # sub-ulp threshold tie-breaking (the reference documents the
        # identical batch-size-invariance caveat).
        from cordon_spark.kernel import percentile_thresholds

        lo, up = percentile_thresholds(exp_s, cfg)
        for thr in (lo, up):
            if thr is not None and len(exp_s):
                assume(float(np.min(np.abs(exp_s - thr))) > 1e-9)
    assert _blocks(res.blocks.toPandas()) == _blocks(oracle.blocks)
    assert res.counts["anomalous"] == oracle.stats["anomalous_turns"]
    assert res.counts["routine"] == oracle.stats["routine_turns"]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters=["\x00"]
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_rstrip_three_engine_property(spark, texts):
    """For ARBITRARY unicode text: kernel == str.rstrip == Spark regex ==
    DuckDB rtrim (the whitespace class is shared from one constant)."""
    import duckdb

    from cordon_spark import kernel
    from cordon_spark.entry_queries import _RTRIM
    from cordon_spark.operators.windowing import with_stripped_text

    expected = [t.rstrip() for t in texts]
    assert [kernel.rstrip_text(t) for t in texts] == expected

    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        with_stripped_text(spark.createDataFrame(pdf))
        .orderBy("i")
        .select("text_stripped")
        .collect()
    )
    assert [r.text_stripped for r in got] == expected

    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    rows = con.execute(f"SELECT {_RTRIM} FROM t ORDER BY i").fetchall()
    assert [r[0] for r in rows] == expected


@given(
    texts=st.lists(
        st.text(alphabet=" abcdef\t", max_size=30), min_size=1, max_size=8
    ),
    n=st.integers(1, 4),
)
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_shingles_spark_matches_kernel_property(spark, texts, n):
    """shingles_col == kernel.token_shingles for arbitrary inputs
    (incl. empty / whitespace-only docs -> no shingles)."""
    from cordon_spark import kernel
    from cordon_spark.operators import dedup as D

    pdf = pd.DataFrame({"i": range(len(texts)), "text": texts})
    got = (
        spark.createDataFrame(pdf)
        .select("i", D.shingles_col(D.tokens_col("text"), n).alias("sh"))
        .orderBy("i")
        .collect()
    )
    for r, t in zip(got, texts):
        # spark array_distinct preserves first-seen order like the kernel
        assert list(r.sh) == kernel.token_shingles(kernel.tokenize(t), n), repr(t)
