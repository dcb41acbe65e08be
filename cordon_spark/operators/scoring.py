"""OP-5: k-NN density anomaly scoring (scorer.py:129-321) + the
centroid-sketch scale path (SURVEY.md §7.5 / north_star).

Exact k-NN, Spark spelling
--------------------------
The reference materializes an (n_windows x dim) float32 matrix and runs
blocked matmul + running top-k (scorer.py:147,247 / :264-305). n_windows
is n_turns / window_size — small relative to the input — so the idiomatic
distributed form is:

  1. collect the (id-ordered) embedding matrix once (Arrow toPandas),
  2. BROADCAST it to all executors,
  3. mapInPandas: each partition scores ITS OWN rows against the
     broadcast matrix with the shared numpy kernel — embarrassingly
     parallel, zero shuffle, and partition-invariant up to ~1 ulp of
     BLAS rounding (dgemm results are shape-dependent, so a score
     exactly on a threshold boundary can in principle flip between
     partitionings; cross-engine checks therefore compare after
     floor(x*1e4+0.5) rounding — the reference's batch-size-invariance
     property, tests/test_analysis.py:76-100, has the same caveat).

The relational spelling (crossJoin + Window row_number <= k + avg) is
kept in the DuckDB oracle SQL only — it is the O(n^2)-shuffle plan you
must NOT run at scale.

Centroid sketch, 100 TB path
----------------------------
Exact k-NN is O(n^2) in windows and needs the full matrix per executor;
at 10^12 turns both break. north_star substitutes per-template centroid
sketches in broadcast state: score = cosine distance to the centroid of
the window's template signature. That is one groupBy(signature) over a
tiny key space + one broadcast dict — O(n * templates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cordon_spark.config import AnalysisConfig

_SCORE_FIELD = T.StructField("score", T.DoubleType(), False)


def _collect_matrix(windows: DataFrame, id_cols: list[str]) -> np.ndarray:
    pdf = (
        windows.select(*id_cols, "embedding")
        .orderBy(*id_cols)
        .toPandas()
    )
    if len(pdf) == 0:
        return np.zeros((0, 1), dtype=np.float64)
    return np.array(pdf["embedding"].tolist(), dtype=np.float64)


def score_windows_knn(
    spark: SparkSession,
    windows: DataFrame,
    cfg: AnalysisConfig,
    id_cols: tuple[str, ...] = ("conv_id", "window_id"),
) -> DataFrame:
    """windows(+embedding) -> windows(+score). Exact k-NN vs all windows.

    Single-window edge: score 0.0 (scorer.py:344-346); empty input:
    empty output (scorer.py:340-341) — both handled inside the kernel.

    Guarded: refuses above cfg.knn_max_windows (the matrix collect is
    driver-bound by design — it is the exact test-scale oracle); the
    scale path is scorer="centroid".
    """
    # limit-probe instead of a full count: early-terminates as soon as
    # max+1 rows exist, so the guard costs ~nothing at 10^12-turn scale
    probe = windows.limit(cfg.knn_max_windows + 1).count()
    if probe > cfg.knn_max_windows:
        raise ValueError(
            f"exact kNN scoring collects the full embedding matrix to the "
            f"driver; input exceeds knn_max_windows="
            f"{cfg.knn_max_windows} windows. Use scorer='centroid' (the "
            f"O(n) broadcast-sketch scale path) or raise knn_max_windows."
        )
    matrix = _collect_matrix(windows, list(id_cols))
    bc = spark.sparkContext.broadcast(matrix)
    # Spread the scoring across the cluster: the input is often a
    # single small parquet file = ONE scan task, which serializes the
    # whole O(n^2) matmul through one python worker (measured 34s for
    # 20k rows at sf1.0; 32-way it is ~2s). Candidate chunk boundaries
    # are absolute offsets into the broadcast matrix, so the CANDIDATE
    # blocking is partitioning-independent; the query-side dgemm block
    # shape still varies with partitioning, which can move a score by
    # ~1 ulp (the module-header caveat — same class of freedom every
    # partitioning of this mapInPandas always had; cross-engine checks
    # compare after e4 rounding). Scale-adaptive: width comes from the
    # scheduler, not a constant (guide §2).
    n_slots = spark.sparkContext.defaultParallelism
    if n_slots > 1 and len(matrix) >= 2 * n_slots:
        windows = windows.repartition(n_slots)
    # scoring_batch_size is the reference's explicit knob; when None the
    # Spark-side default chunk applies (reference auto-detects by GPU)
    k = cfg.k_neighbors
    chunk = cfg.scoring_batch_size or cfg.scoring_chunk_size
    schema = T.StructType(windows.schema.fields + [_SCORE_FIELD])

    def score_partition(batches):
        from cordon_spark import kernel

        cand = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(score=pd.Series(dtype="float64"))
                continue
            queries = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            scores = kernel.knn_scores(queries, cand, k, chunk)
            yield pdf.assign(score=scores)

    return windows.mapInPandas(score_partition, schema)


_TREE_FANIN = 64


def _merge_partial_rows(batches):
    """Combine rows of the (sigs, cnts, flat) partial schema into one row
    per partition — the executor-side level of the tree reduce."""
    sums: dict = {}
    counts: dict = {}
    for pdf in batches:
        for _, row in pdf.iterrows():
            sigs = list(row["sigs"])
            if not sigs:
                continue
            flat = np.asarray(row["flat"], dtype=np.float64).reshape(len(sigs), -1)
            for i, sig in enumerate(sigs):
                if sig in sums:
                    sums[sig] = sums[sig] + flat[i]
                    counts[sig] += int(row["cnts"][i])
                else:
                    sums[sig] = flat[i]
                    counts[sig] = int(row["cnts"][i])
    if not sums:
        return
    mat = np.stack(list(sums.values()))
    yield pd.DataFrame(
        {
            "sigs": [list(sums.keys())],
            "cnts": [list(counts.values())],
            "flat": [mat.ravel()],
        }
    )


def template_centroids(
    windows: DataFrame, signature_col: str = "signature"
) -> tuple[dict, dict]:
    """(sum_map, count_map) of per-signature embedding SUMS via
    MAP-SIDE PARTIAL AGGREGATION (sums rather than normalized centroids
    so the scorer can do leave-one-out subtraction): each
    partition reduces its windows to (signature, count, sum-vector) rows
    inside one mapInPandas pass — numpy sums, no exploded shuffle — and
    the tiny partials (n_partitions x n_signatures rows) merge on the
    driver. At 10^12 turns this is the only aggregation shape that
    works: the shuffle payload is O(signatures x dim) per partition,
    independent of row count."""
    # ONE output row per partition: (sigs, cnts, flat sum-matrix). The
    # earlier per-(partition, signature)-row spelling boxed sigs x 64
    # python floats per partition (measured: 299MB shuffle + 200s of
    # pure boxing CPU at 2M windows); flat numpy arrays make the
    # partial O(1) rows and the merge a vectorized np.add.at.
    schema = T.StructType(
        [
            T.StructField("sigs", T.ArrayType(T.StringType())),
            T.StructField("cnts", T.ArrayType(T.LongType())),
            T.StructField("flat", T.ArrayType(T.DoubleType())),
        ]
    )

    def partials(batches):
        sums: dict = {}
        counts: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes, uniques = pd.factorize(pdf[signature_col], sort=False)
            mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            acc = np.zeros((len(uniques), mat.shape[1]), dtype=np.float64)
            np.add.at(acc, codes, mat)
            cnt = np.bincount(codes, minlength=len(uniques))
            for i, sig in enumerate(uniques):
                if sig in sums:
                    sums[sig] = sums[sig] + acc[i]
                    counts[sig] += int(cnt[i])
                else:
                    sums[sig] = acc[i]
                    counts[sig] = int(cnt[i])
        if not sums:
            return
        mat = np.stack(list(sums.values()))
        yield pd.DataFrame(
            {
                "sigs": [list(sums.keys())],
                "cnts": [list(counts.values())],
                "flat": [mat.ravel()],
            }
        )

    partial_df = windows.select(
        F.col(signature_col).alias("signature"), "embedding"
    ).mapInPandas(partials, schema)
    # treeAggregate-style two-level reduce: above _TREE_FANIN input
    # partitions, the one-row-per-partition partials are themselves
    # combined executor-side (repartition to ~sqrt(P) then merge rows of
    # the partial schema with the same vectorized combiner), so the
    # driver sees O(sqrt(partitions)) rows instead of O(partitions) —
    # the shape that holds at 1000+ executors. Partial-sum merge order
    # changes the result only in the last float ulp (asserted at 1e-9 in
    # tests).
    n_parts = partial_df.rdd.getNumPartitions()
    if n_parts > _TREE_FANIN:
        fanin = max(2, int(n_parts**0.5))
        partial_df = partial_df.repartition(fanin).mapInPandas(
            _merge_partial_rows, schema
        )
    partial_pdf = partial_df.toPandas()
    # final driver-side merge: O(reduced rows), vectorized.
    all_sigs: list = []
    all_cnts: list = []
    mats: list = []
    for _, row in partial_pdf.iterrows():
        sigs = list(row["sigs"])
        if not sigs:
            continue
        flat = np.asarray(row["flat"], dtype=np.float64)
        mats.append(flat.reshape(len(sigs), -1))
        all_sigs.extend(sigs)
        all_cnts.extend(row["cnts"])
    if not mats:
        return {}, {}
    stacked = np.vstack(mats)
    codes, uniques = pd.factorize(pd.Series(all_sigs), sort=False)
    sums = np.zeros((len(uniques), stacked.shape[1]), dtype=np.float64)
    np.add.at(sums, codes, stacked)
    cnts = np.bincount(codes, weights=np.asarray(all_cnts, dtype=np.float64))
    sum_map = {sig: sums[i] for i, sig in enumerate(uniques)}
    count_map = {sig: int(cnts[i]) for i, sig in enumerate(uniques)}
    return sum_map, count_map


def score_windows_centroid(
    spark: SparkSession,
    windows: DataFrame,
    cfg: AnalysisConfig,
    signature_col: str = "signature",
) -> DataFrame:
    """Scale-path scorer: LEAVE-ONE-OUT cosine distance to the
    own-signature centroid (singleton/unseen signatures fall back to
    the global LOO centroid) — see kernel.centroid_scores_loo for why
    self-exclusion is load-bearing. O(n); no O(n^2) anywhere.

    The score itself is computed ENTIRELY JVM-SIDE: the per-signature
    sums join in via a broadcast-hash join and the cosine arithmetic is
    zip_with/aggregate inside whole-stage codegen. The previous
    mapInPandas spelling paid a full Arrow round-trip of every window
    embedding a second time (measured ~37s CPU per 2M windows per
    action); this one costs a broadcast of O(signatures x dim) floats
    and no Python at all."""
    sum_map, count_map = template_centroids(windows, signature_col)
    if not sum_map:
        return windows.withColumn("score", F.lit(0.0))
    global_sum = np.sum(np.stack(list(sum_map.values())), axis=0)
    global_count = int(sum(count_map.values()))
    if global_count <= 1:
        return windows.withColumn("score", F.lit(0.0))

    cen_rows = [
        (sig, int(count_map[sig]), [float(v) for v in vec])
        for sig, vec in sum_map.items()
    ]
    cen = spark.createDataFrame(
        cen_rows, f"{signature_col} string, _cnt long, _sums array<double>"
    )
    joined = windows.join(F.broadcast(cen), on=signature_col, how="left")
    g_arr = F.array(*[F.lit(float(v)) for v in global_sum])
    sums = F.when(
        F.col("_cnt").isNull() | (F.col("_cnt") <= 1), g_arr
    ).otherwise(F.col("_sums"))
    x = F.col("embedding")
    loo = F.zip_with(sums, x, lambda a, b: a - b)
    nrm = F.sqrt(F.aggregate(loo, F.lit(0.0), lambda acc, v: acc + v * v))
    dot = F.aggregate(
        F.zip_with(x, loo, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    score = F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(2.0),
            F.lit(1.0) - F.when(nrm > 0.0, dot / nrm).otherwise(F.lit(0.0)),
        ),
    )
    out_cols = [F.col(f.name) for f in windows.schema.fields]
    return joined.select(*out_cols, score.alias("score"))
