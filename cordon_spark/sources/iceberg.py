"""Iceberg catalog implementation (used when iceberg-spark-runtime is on
the classpath; import-gated — the sandbox has no jar, SURVEY.md §7.3).

Same interface as SnapshotCatalog so pipeline code is storage-agnostic.
Snapshot ids map to real Iceberg snapshots; resume reads
`table.snapshots` metadata."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class IcebergCatalog:  # pragma: no cover - exercised only with the jar
    def __init__(self, namespace: str | Path) -> None:
        self.namespace = str(namespace).strip("/").replace("/", ".") or "cordon"

    def _ident(self, table: str) -> str:
        return f"{self.namespace}.{table}"

    def write_snapshot(
        self,
        df: DataFrame,
        table: str,
        snapshot_id: str,
        lineage: dict | None = None,
        mode: str = "overwrite",
    ) -> dict:
        writer = df.writeTo(self._ident(table)).option(
            "snapshot-property.cordon.snapshot_id", snapshot_id
        )
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return {"table": table, "snapshot_id": snapshot_id, "lineage": lineage or {}}

    def current_snapshot(self, table: str) -> str | None:
        spark = SparkSession.getActiveSession()
        rows = (
            spark.sql(f"SELECT summary FROM {self._ident(table)}.snapshots ORDER BY committed_at DESC")
            .limit(1)
            .collect()
        )
        if not rows:
            return None
        return rows[0]["summary"].get("cordon.snapshot_id")

    def has_snapshot(self, table: str, snapshot_id: str) -> bool:
        spark = SparkSession.getActiveSession()
        try:
            rows = spark.sql(
                f"SELECT summary FROM {self._ident(table)}.snapshots"
            ).collect()
        except Exception:
            return False
        return any(r["summary"].get("cordon.snapshot_id") == snapshot_id for r in rows)

    def read(
        self, spark: SparkSession, table: str, snapshot_id: str | None = None
    ) -> DataFrame:
        return spark.read.format("iceberg").load(self._ident(table))
