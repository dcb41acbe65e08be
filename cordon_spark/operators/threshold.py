"""OP-6: percentile threshold filter (thresholder.py:17-81).

Numeric contract: the threshold is an EXACT percentile with linear
interpolation — numpy's definition (thresholder.py:71-73). Spark's
exact `percentile` aggregate implements the same definition;
`percentile_approx` does not and is only used to BRACKET the threshold
on the scale path.

Tie rules copied verbatim (SURVEY.md §4):
  percentile mode: keep score >= threshold (ties included, :76)
  range mode:      keep lower <= score < upper (:51-53)
  isclose(p, 1.0) -> keep all; isclose(p, 0.0) -> keep none (:63-68)

Scale path (SURVEY.md §7.5): exact global percentile needs a global
sort; at 10^12 rows we bracket with percentile_approx(+/- accuracy),
then run the exact percentile only over the bracketed band (tiny).
`exact_percentiles()` picks the strategy by row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from cordon_spark.config import AnalysisConfig

# above this many rows, bracket with approx before the exact pass —
# Spark's exact percentile merges a per-value count map on one reducer,
# which costs seconds by 2M distinct doubles; the bracketed path is
# exact (test_threshold_scale) and stays cheap at any n
EXACT_PERCENTILE_DIRECT_LIMIT = 500_000


def exact_percentiles(
    df: DataFrame, col: str, pcts: list[float], n_rows: int | None = None
) -> list[float]:
    """Exact linear-interpolation percentiles of df[col] (pcts in [0,100]).

    Direct mode: one exact `percentile` aggregate.
    Bracketed mode (huge inputs): percentile_approx bounds each target,
    counts below the band give the exact global rank offset, then the
    exact order statistics are interpolated from the (small) band.
    """
    if n_rows is None:
        n_rows = df.count()
    if n_rows == 0:
        return [float("nan") for _ in pcts]
    qs = [p / 100.0 for p in pcts]
    if n_rows <= EXACT_PERCENTILE_DIRECT_LIMIT:
        row = df.select(
            F.expr(
                "percentile({c}, array({qs}))".format(
                    c=col, qs=",".join(repr(q) for q in qs)
                )
            ).alias("p")
        ).first()
        return [float(v) for v in row["p"]]
    return _bracketed_percentiles(df, col, qs, n_rows)


def _bracketed_percentiles(df: DataFrame, col: str, qs: list[float], n_rows: int):
    """Two-phase exact percentile for huge inputs.

    percentile_approx(accuracy=A) guarantees rank error <= n/A; so the
    approx values at q -/+ margin bound the exact order statistics at
    ranks floor/ceil((n-1)q). We count rows strictly below the lower
    bound (-> global rank offset), collect ONLY the bracketed band
    (O(n/A) rows), and interpolate exactly — identical result to the
    direct exact percentile."""
    accuracy = 10_000
    margin = 3.0 / accuracy  # > guaranteed rank error, with slack
    lo_qs = [max(q - margin, 0.0) for q in qs]
    hi_qs = [min(q + margin, 1.0) for q in qs]
    # job 1: approx brackets for every quantile at once
    bounds = df.select(
        F.percentile_approx(col, lo_qs + hi_qs, accuracy).alias("b")
    ).first()["b"]
    a_los = [float(bounds[i]) for i in range(len(qs))]
    a_his = [float(bounds[i + len(qs)]) for i in range(len(qs))]
    return _refine_brackets(df, col, qs, n_rows, a_los, a_his)


def _refine_brackets(df, col, qs, n_rows, a_los, a_his):
    """Exact refinement given approx brackets: one aggregate for the
    global rank offsets + one collect of the union of (tiny) bands."""
    # exact global rank offsets for ALL brackets in one aggregate
    below_row = df.select(
        *[
            F.sum(F.when(F.col(col) < F.lit(a_lo), 1).otherwise(0)).alias(f"b{i}")
            for i, a_lo in enumerate(a_los)
        ]
    ).first()
    # job 3: one collect of the UNION of all (tiny) bracketed bands
    band_pred = None
    for a_lo, a_hi in zip(a_los, a_his):
        pred = (F.col(col) >= F.lit(a_lo)) & (F.col(col) <= F.lit(a_hi))
        band_pred = pred if band_pred is None else (band_pred | pred)
    band = sorted(
        float(r[0]) for r in df.filter(band_pred).select(col).collect()
    )
    out = []
    for i, q in enumerate(qs):
        rank = (n_rows - 1) * q
        lo_idx, hi_idx = int(rank), min(int(rank) + 1, n_rows - 1)
        n_below = int(below_row[f"b{i}"] or 0)
        # this quantile's slice of the collected union band
        sub = [v for v in band if a_los[i] <= v <= a_his[i]]
        pos_lo, pos_hi = lo_idx - n_below, hi_idx - n_below
        if not sub or pos_lo < 0 or pos_hi >= len(sub):
            # bracket missed (shouldn't happen) — fall back to direct exact
            out.append(
                float(df.select(F.expr(f"percentile({col}, {q!r})")).first()[0])
            )
            continue
        frac = rank - lo_idx
        out.append(sub[pos_lo] + (sub[pos_hi] - sub[pos_lo]) * frac)
    return out


def compute_thresholds(
    scored: DataFrame, cfg: AnalysisConfig, score_col: str = "score"
) -> tuple[float | None, float | None]:
    """(lower, upper) per kernel.percentile_thresholds semantics."""
    if cfg.keep_all or cfg.keep_none:
        return None, None
    if cfg.range_mode:
        upper_p = (1.0 - cfg.anomaly_range_min) * 100.0
        lower_p = (1.0 - cfg.anomaly_range_max) * 100.0
        lo, up = exact_percentiles(scored, score_col, [lower_p, upper_p])
        return lo, up
    (thr,) = exact_percentiles(
        scored, score_col, [(1.0 - cfg.anomaly_percentile) * 100.0]
    )
    return thr, None


def thresholds_and_stats(
    scored: DataFrame, cfg: AnalysisConfig, score_col: str = "score"
) -> tuple[float | None, float | None, dict]:
    """Threshold(s) + the OP-10 score distribution, minimizing jobs:
    job 1 fuses count/min/max/avg WITH the approx percentile brackets;
    then either one direct exact-percentile job (small n) or the
    rank-offset + band-collect jobs (large n)."""
    pcts = [50.0, 90.0]
    if not (cfg.keep_all or cfg.keep_none):
        if cfg.range_mode:
            pcts += [(1.0 - cfg.anomaly_range_max) * 100.0, (1.0 - cfg.anomaly_range_min) * 100.0]
        else:
            pcts += [(1.0 - cfg.anomaly_percentile) * 100.0]
    qs = [p / 100.0 for p in pcts]
    accuracy = 10_000
    margin = 3.0 / accuracy
    lo_qs = [max(q - margin, 0.0) for q in qs]
    hi_qs = [min(q + margin, 1.0) for q in qs]
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(score_col).alias("min"),
        F.max(score_col).alias("max"),
        F.avg(score_col).alias("mean"),
        F.percentile_approx(score_col, lo_qs + hi_qs, accuracy).alias("bounds"),
    ).first()
    n = row["n"]
    if n == 0:
        return None, None, {"min": 0.0, "max": 0.0, "mean": 0.0, "median": 0.0, "p90": 0.0, "n": 0}
    if n <= EXACT_PERCENTILE_DIRECT_LIMIT:
        vals = exact_percentiles(scored, score_col, pcts, n_rows=n)
    else:
        a_los = [float(row["bounds"][i]) for i in range(len(qs))]
        a_his = [float(row["bounds"][i + len(qs)]) for i in range(len(qs))]
        vals = _refine_brackets(scored, score_col, qs, n, a_los, a_his)
    stats = {
        "min": float(row["min"]),
        "max": float(row["max"]),
        "mean": float(row["mean"]),
        "median": vals[0],
        "p90": vals[1],
        "n": int(n),
    }
    if cfg.keep_all or cfg.keep_none:
        return None, None, stats
    if cfg.range_mode:
        return vals[2], vals[3], stats
    return vals[2], None, stats


def select_significant(
    scored: DataFrame, cfg: AnalysisConfig, score_col: str = "score"
) -> tuple[DataFrame, float | None, float | None]:
    """Filter scored windows by the threshold; returns (df, lower, upper).
    Sorting score-desc (thresholder.py:79) is left to consumers — a
    global orderBy is only warranted at output time."""
    if cfg.keep_none:
        return scored.filter(F.lit(False)), None, None
    if cfg.keep_all:
        return scored, None, None
    lower, upper = compute_thresholds(scored, cfg, score_col)
    if cfg.range_mode:
        kept = scored.filter(
            (F.col(score_col) >= F.lit(lower)) & (F.col(score_col) < F.lit(upper))
        )
    else:
        kept = scored.filter(F.col(score_col) >= F.lit(lower))
    return kept, lower, upper
