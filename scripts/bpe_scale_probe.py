"""BPE merge-loop partitioning probe at a REAL vocabulary size.

The round-4 fix dropped the merge loop's ``.coalesce(1)`` and proved
the merge sequence partitioning-invariant — but only at a 31-word toy
vocabulary, where parallelism cannot show up in wall-clock. This probe
builds a >=10^5-distinct-word corpus from the driver's sf0.1
``documents`` table (every distinct word crossed with suffix-mutated
replicas — same replication trick as ``scale_replicate.py``; nothing
synthesized from outside the test data) and times ``bpe_train`` with
the vocabulary held at 1 vs N shuffle partitions, asserting the merge
sequences are identical. Results are recorded in SCALING.md.

Usage: python scripts/bpe_scale_probe.py [n_merges] [replicas]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    # the sf0.1 documents vocabulary is ~30 distinct words, so the
    # replica factor is what builds the 10^5-word vocabulary
    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 4000

    from pyspark.sql import functions as F

    from luma_etl_data_platform_spark.core.session import get_spark
    from luma_etl_data_platform_spark.operators.bpe import bpe_train

    spark = get_spark(app_name="bpe-scale-probe", extra_conf={
        # the probe MEASURES partitioning: AQE's partition coalescing
        # would silently collapse the parallel lane back to ~1
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    })
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = (docs.select(F.explode(F.split(F.lower("text"),
                                           "[^a-z]+")).alias("w"))
             .filter(F.length("w") >= 2).distinct())
    reps = F.broadcast(spark.range(replicas)
                       .select(F.col("id").alias("_r")))
    corpus = (words.crossJoin(reps)
              .select(F.concat("w", F.lit("q"),
                               F.col("_r").cast("string")).alias("w"))
              .localCheckpoint(eager=True))
    n_vocab = corpus.count()
    print(f"distinct words: {n_vocab}")
    assert n_vocab >= 100_000, "probe needs a >=1e5-word vocabulary"

    results = {}
    merges_by_p = {}
    for parts in (1, 8):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        # warm-up (parquet footers / codegen), then best-of-2
        bpe_train(corpus, "w", n_merges=1)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            merges = bpe_train(corpus, "w", n_merges=n_merges)
            best = min(best, time.perf_counter() - t0)
        results[parts] = round(best, 2)
        merges_by_p[parts] = [(m["left"], m["right"], m["pair_count"])
                              for m in merges]
        print(f"shuffle.partitions={parts}: {best:.2f}s "
              f"({n_merges} merges)")
    assert merges_by_p[1] == merges_by_p[8], (
        "merge sequence must be partitioning-invariant")
    print(f"merge sequence identical at 1 vs 8 partitions: "
          f"{merges_by_p[1]}")
    print(f"RESULT vocab={n_vocab} merges={n_merges} "
          f"p1={results[1]}s p8={results[8]}s "
          f"speedup={results[1] / results[8]:.2f}x")


if __name__ == "__main__":
    main()
