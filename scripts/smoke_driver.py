"""Verification driver: the spark-submit surface of cordon_spark."""
import sys
from pyspark.sql import SparkSession

from cordon_spark.config import AnalysisConfig
from cordon_spark.datagen import TEMPLATES, write_fixture
from cordon_spark.plans.pipeline import analyze_transcripts
from cordon_spark.sources.catalog import SnapshotCatalog

out = sys.argv[1]
spark = (SparkSession.builder.appName("verify_cordon").master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

write_fixture(f"{out}/transcripts.parquet", scale="tiny")
df = spark.read.parquet(f"{out}/transcripts.parquet")
catalog = SnapshotCatalog(f"{out}/warehouse")
res = analyze_transcripts(spark, df, AnalysisConfig(), templates=TEMPLATES,
                          catalog=catalog, run_id="r1", resume=True)
print("SINK_COUNTS", res.counts)
print("THRESHOLD", round(res.threshold_lower, 6))
print("STATS", {k: round(v, 4) if isinstance(v, float) else v for k, v in res.stats.items()})
print("BLOCKS:")
for r in res.blocks.orderBy("conv_id", "start_idx").collect():
    print("  ", r.conv_id, r.start_idx, r.end_idx, [int(x) for x in r.original_windows], round(r.max_score, 4))
anom = catalog.read(spark, "anomalous_turns")
print("ANOM_SINK_ROWS", anom.count(), "sample:", anom.orderBy("conv_id","turn_idx").first())
print("SNAPSHOTS", {t: catalog.snapshots(t) for t in ("scored_windows","blocks","routed_turns","anomalous_turns","routine_turns")})
