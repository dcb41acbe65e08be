"""Per-query measurement harness for the optimization round (guide §1).

NOT the driver bench — bench.py is frozen. This script times individual
declared queries (same session config, same .collect() methodology as
bench.py) so single optimizations can be measured in isolation, and can
dump .explain("formatted") plans to plans/<tag>/<query>_<suffix>.txt.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--repeats N] [--explain plans/r06 --suffix before] [--noop] \
      query1 query2 ...

Prints one JSON line {"queries": {name: best_sec}, "samples": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None, help="directory for plan dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--noop", action="store_true", help="time noop sink instead of collect")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from cordon_spark import entry_queries as Q
    from cordon_spark.session import get_spark

    spark = get_spark(
        "cordon_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
        arrow_batch=20_000,
    )

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    for name in args.queries:
        fn = Q.QUERIES[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.explain}/{name}_{args.suffix}.txt", "w") as fh:
                fh.write(plan)
        runs = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            runs.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = min(runs)
        samples[name] = runs
        print(f"## {name}: best={min(runs)} samples={runs}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "queries": timings, "samples": samples}))


if __name__ == "__main__":
    main()
