"""Incremental materialized rollup over append snapshots: keep a
grouped aggregate table fresh by folding in ONLY the snapshots that
arrived since the last refresh — never rescanning history.

The 100 TB why: a day of ingest appends ~TBs of new rows as immutable
snapshots (the streaming/micro-batch pattern `SnapshotCatalog` models);
recomputing `GROUP BY` rollups over the full table on every refresh is
O(history) forever. Sums and counts are MERGEABLE aggregates, so the
classic incremental-view-maintenance shape applies: aggregate the new
snapshots alone (O(delta)), union with the previous rollup's partial
state, and re-aggregate (O(|rollup| + |delta agg|) — both tiny next to
history). Decimal accumulation keeps the merge order-independent, so
an incrementally maintained rollup is bit-identical to a full
recompute (asserted in tests, not assumed).

Source model: each source snapshot is a disjoint APPEND (the ingest
contract — e.g. one micro-batch or one daily load per snapshot id).
Derived snapshots (compaction's `-compacted`, clustering's `-zorder`)
rewrite EXISTING rows and must not be folded twice; refresh skips any
snapshot whose lineage marks it as a rewrite of a covered one.

State is carried in the rollup table's own manifest lineage (the
`covered` list of folded snapshot ids), so refresh is idempotent and
resumable like every other catalog write."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cordon_spark.sources.catalog import SnapshotCatalog

REWRITE_OPS = {"compact", "cluster", "compact_appends"}
_REWRITE_OPS = REWRITE_OPS  # back-compat alias


class IncrementalRollup:
    """Maintains `dst_table` = src grouped by `keys` with
    `n` = count(*) and `sum_<c>` = decimal sum of each c in sum_cols."""

    def __init__(
        self,
        catalog: SnapshotCatalog,
        src_table: str,
        dst_table: str,
        keys: list[str],
        sum_cols: list[str] | None = None,
    ) -> None:
        self.catalog = catalog
        self.src = src_table
        self.dst = dst_table
        self.keys = list(keys)
        self.sum_cols = list(sum_cols or [])

    # ---- aggregate shapes -------------------------------------------
    def _aggregate(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("n")] + [
            F.sum(F.col(c).cast("decimal(30,6)")).alias(f"sum_{c}")
            for c in self.sum_cols
        ]
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge(self, prev: DataFrame, delta: DataFrame) -> DataFrame:
        # merge at the persisted sum type (decimal(38,6) after Spark's
        # sum-widening), NOT re-cast down to (30,6): a sum wider than 24
        # integer digits would overflow the downcast to NULL and
        # silently corrupt the rollup
        aggs = [F.sum("n").cast("long").alias("n")] + [
            F.sum(F.col(f"sum_{c}")).alias(f"sum_{c}") for c in self.sum_cols
        ]
        return prev.unionByName(delta).groupBy(*self.keys).agg(*aggs)

    # ---- state ------------------------------------------------------
    def covered(self) -> list[str]:
        sid = self.catalog.current_snapshot(self.dst)
        if sid is None:
            return []
        return list(self.catalog.manifest(self.dst, sid)["lineage"]["covered"])

    def pending(self) -> list[str]:
        done = set(self.covered())
        out = []
        for sid in self.catalog.snapshots(self.src):
            if sid in done:
                continue
            lin = self.catalog.manifest(self.src, sid)["lineage"] or {}
            if lin.get("op") in _REWRITE_OPS:
                # rewrites (compaction, clustering) re-layout EXISTING
                # rows — the catalog enforces their row invariant — so
                # they never contribute delta, even when chained
                # (compact -> cluster): skip unconditionally
                continue
            out.append(sid)
        return out

    # ---- refresh ----------------------------------------------------
    def refresh(self, spark: SparkSession) -> dict:
        """Fold every pending source snapshot into the rollup as a new
        dst snapshot. No pending snapshots -> no-op returning the
        current manifest (idempotent)."""
        todo = self.pending()
        cur = self.catalog.current_snapshot(self.dst)
        if not todo:
            if cur is None:
                raise FileNotFoundError(
                    f"nothing to roll up: {self.src} has no snapshots"
                )
            return self.catalog.manifest(self.dst, cur)

        delta = None
        for sid in todo:
            part = self.catalog.read(spark, self.src, sid)
            delta = part if delta is None else delta.unionByName(part)
        delta_agg = self._aggregate(delta)

        if cur is None:
            merged = delta_agg.withColumn("n", F.col("n").cast("long"))
        else:
            merged = self._merge(self.catalog.read(spark, self.dst, cur), delta_agg)

        new_sid = f"r{len(self.covered()) + len(todo):06d}"
        return self.catalog.write_snapshot(
            merged,
            self.dst,
            new_sid,
            lineage={
                "op": "incremental_rollup",
                "src_table": self.src,
                "covered": self.covered() + todo,
                "delta_snapshots": todo,
            },
        )
