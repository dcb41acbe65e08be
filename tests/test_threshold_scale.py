"""Scale-path percentile: the approx-bracketed two-phase refinement must
reproduce the direct exact percentile bit-for-bit (same linear
interpolation as np.percentile)."""

import numpy as np
import pandas as pd
import pytest

from cordon_spark.operators import threshold as TH


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "ties"])
def test_bracketed_equals_direct(spark, dist, monkeypatch):
    rng = np.random.RandomState(3)
    if dist == "uniform":
        vals = rng.rand(20_000)
    elif dist == "lognormal":
        vals = rng.lognormal(size=20_000)
    else:  # heavy ties around the percentile targets
        vals = np.round(rng.rand(20_000), 2)
    df = spark.createDataFrame(pd.DataFrame({"score": vals}))
    pcts = [50.0, 90.0, 98.0]

    direct = TH.exact_percentiles(df, "score", pcts)
    monkeypatch.setattr(TH, "EXACT_PERCENTILE_DIRECT_LIMIT", 1)
    bracketed = TH.exact_percentiles(df, "score", pcts)
    expected = [float(np.percentile(vals, p)) for p in pcts]

    for d, b, e in zip(direct, bracketed, expected):
        assert d == pytest.approx(e, abs=1e-12)
        assert b == pytest.approx(e, abs=1e-12)


def test_empty_and_single(spark):
    import math

    empty = spark.createDataFrame([], "score double")
    assert all(math.isnan(v) for v in TH.exact_percentiles(empty, "score", [50.0]))
    one = spark.createDataFrame(pd.DataFrame({"score": [3.5]}))
    assert TH.exact_percentiles(one, "score", [90.0]) == [3.5]
