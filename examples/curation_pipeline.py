#!/usr/bin/env python3
"""Training-data curation walkthrough: the operators a 100 TB corpus
pipeline chains between raw documents and a training mix, on a small
self-contained fixture. Run from the repo root:

    python examples/curation_pipeline.py

Stages (each is a single declarative plan — see docs/architecture.md
for the shuffle budget of each):

  1. curate_corpus     quality stats -> filter -> PII scrub -> exact
                       dedup (digest groupBy is the only shuffle)
  2. minhash_lsh_pairs_collapsed -> dedup_clusters -> apply_dedup
                       near-dup removal with exact-dup hot-bucket
                       defusal
  3. split_dataset     deterministic train/val/test (growth-stable)
  4. token_budget_sample  ~N tokens per language shard
  5. pack_sequences    fixed-budget pack assignment for the trainer
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F


def main() -> None:
    from cordon_spark.operators.curation import (
        curate_corpus,
        pack_sequences,
        split_dataset,
        token_budget_sample,
    )
    from cordon_spark.operators.dedup import (
        apply_dedup,
        dedup_clusters,
        minhash_lsh_pairs_collapsed,
    )
    from cordon_spark.session import get_spark

    spark = get_spark("curation_example", master="local[4]",
                      shuffle_partitions=4)

    # tokens come from a hash mix, not a linear formula — a linear
    # i*A + j*B grid makes doc i+d a token-shift of doc i (phantom
    # near-dups; same pitfall scripts/dedup_scale_bench.py documents)
    import hashlib

    def tok(i, j):
        return "w" + hashlib.md5(f"{i}|{j}".encode()).hexdigest()[:6]

    base = [
        (i, " ".join(tok(i, j) for j in range(30)),
         ["en", "de", "zh"][i % 3])
        for i in range(200)
    ]
    # plant near-dups, exact dups, junk, and PII
    base += [(500 + i, base[i][1] + " extra", base[i][2]) for i in range(10)]
    base += [(600 + i, base[0][1], "en") for i in range(5)]  # exact dups
    base += [(700, "x", "en"), (701, "contact me at a@b.com now please "
                                     "regarding the document topic", "en")]
    docs = spark.createDataFrame(base, "doc_id long, text string, lang string")
    print(f"input docs: {docs.count()}")

    # curate_corpus returns one row of stats per kept representative;
    # join back (broadcast — the stats frame is the kept minority) to
    # recover text/lang for the near-dup stage
    stats = curate_corpus(docs, min_tokens=5, min_entropy=2.0)
    kept = docs.join(
        F.broadcast(stats.select("doc_id", "n_tokens")), on="doc_id"
    )
    print(f"after quality filter + scrub + exact dedup: {kept.count()}")

    pairs = minhash_lsh_pairs_collapsed(kept, n=3)
    clusters = dedup_clusters(pairs)
    kept = apply_dedup(kept, clusters)
    print(f"after near-dup removal (3-gram LSH): {kept.count()}")

    split = split_dataset(kept, {"train": 0.9, "val": 0.05, "test": 0.05})
    print("split counts:",
          {r["split"]: r["count"]
           for r in split.groupBy("split").count().collect()})

    train = split.filter(F.col("split") == "train")
    budgeted = token_budget_sample(train, budget=800, group_col="lang")
    print("token budget per lang:",
          {r["lang"]: r["toks"] for r in budgeted.groupBy("lang")
           .agg(F.sum("n_tokens").alias("toks")).collect()})

    packed = pack_sequences(budgeted, max_tokens=256, group_col="lang")
    print(f"packs: {packed.select('lang', 'pack_id').distinct().count()}")
    spark.stop()


if __name__ == "__main__":
    main()
