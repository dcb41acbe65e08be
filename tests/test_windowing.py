"""OP-3 window segmentation: Spark vs oracle + reference edge cases
(reference tests/test_segmentation.py:8-94)."""

import pandas as pd

from cordon_spark.config import AnalysisConfig
from cordon_spark.operators.windowing import segment_windows
from cordon_spark.oracle import oracle_windows


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    return pdf, spark.createDataFrame(pdf)


def _windows_sorted(df):
    return (
        df.orderBy("conv_id", "window_id")
        .select("conv_id", "window_id", "start_idx", "end_idx", "n_turns", "content")
        .collect()
    )


def test_exact_boundaries_and_content(spark):
    cfg = AnalysisConfig(window_size=2)
    rows = [("c1", i, f"line {i}") for i in range(5)]
    pdf, df = _mk(spark, rows)
    got = _windows_sorted(segment_windows(df, cfg))
    assert [(r.window_id, r.start_idx, r.end_idx) for r in got] == [
        (0, 0, 1),
        (1, 2, 3),
        (2, 4, 4),  # final partial window emitted (windower.py:56-66)
    ]
    assert got[0].content == "line 0\nline 1"
    assert got[2].content == "line 4"
    assert got[2].n_turns == 1


def test_rstrip_in_content_only(spark):
    cfg = AnalysisConfig(window_size=2)
    pdf, df = _mk(spark, [("c1", 0, "a  \t"), ("c1", 1, "  b")])
    got = _windows_sorted(segment_windows(df, cfg))
    assert got[0].content == "a\n  b"  # trailing stripped, leading kept


def test_rstrip_unicode_whitespace_three_engines(spark):
    """Reference reader.py:25 uses str.rstrip() = Unicode whitespace; the
    kernel, the Spark regex, and the DuckDB rtrim char list must all
    strip the identical codepoint set."""
    import duckdb

    from cordon_spark import kernel
    from cordon_spark.entry_queries import _RTRIM

    samples = [
        "abc \xa0\t",            # nbsp between ASCII ws
        "x ",               # line separator
        "y　 ",         # ideographic + thin space
        "keep​",            # zero-width space is NOT whitespace
        "mid\xa0dle \x85",       # internal nbsp kept, trailing NEL stripped
        "ctl\x1c\x1d\x1e\x1f",   # FS/GS/RS/US: Python strips, \p{IsWhite_Space} doesn't
        "plain",
        "",
    ]
    # 1. kernel == str.rstrip
    for s in samples:
        assert kernel.rstrip_text(s) == s.rstrip(), repr(s)
    # 2. Spark regex == str.rstrip
    cfg = AnalysisConfig(window_size=1)
    pdf, df = _mk(spark, [("c1", i, s) for i, s in enumerate(samples)])
    got = _windows_sorted(segment_windows(df, cfg))
    assert [r.content for r in got] == [s.rstrip() for s in samples]
    # 3. DuckDB rtrim == str.rstrip
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(s,) for s in samples])
    rows = con.execute(f"SELECT {_RTRIM} FROM t").fetchall()
    assert [r[0] for r in rows] == [s.rstrip() for s in samples]


def test_single_turn_conversation(spark):
    cfg = AnalysisConfig(window_size=4)
    pdf, df = _mk(spark, [("c1", 0, "only")])
    got = _windows_sorted(segment_windows(df, cfg))
    assert len(got) == 1 and got[0].content == "only"


def test_matches_oracle_on_fixture(spark, tiny_transcripts, tiny_df):
    pdf, _ = tiny_transcripts
    for ws in (1, 2, 4, 5):
        cfg = AnalysisConfig(window_size=ws)
        got = (
            segment_windows(tiny_df, cfg)
            .orderBy("conv_id", "window_id")
            .toPandas()[["conv_id", "window_id", "start_idx", "end_idx", "n_turns", "content"]]
        )
        exp = oracle_windows(pdf, cfg)[
            ["conv_id", "window_id", "start_idx", "end_idx", "n_turns", "content"]
        ]
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True),
            exp.reset_index(drop=True),
            check_dtype=False,
        )


def test_partition_count_invariance(spark, tiny_transcripts):
    pdf, _ = tiny_transcripts
    cfg = AnalysisConfig()
    outs = []
    for n in (2, 16):
        df = spark.createDataFrame(pdf).repartition(n)
        outs.append(
            segment_windows(df, cfg)
            .orderBy("conv_id", "window_id")
            .toPandas()
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
