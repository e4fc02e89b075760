"""Build an sf1.0-equivalent dataset by replicating the driver's
sf0.1 parquet 10x with key-shifted replicas (FK-consistent), for the
SCALING.md growth-validation runs.

The driver ships sf{0.001,0.01,0.1} only; this script synthesizes
nothing new — every replica row is an sf0.1 row with its keys offset
by ``replica * (max_key + 1)``, so joins/foreign keys stay valid and
per-query semantics are unchanged. Exact text/embedding duplicates
across replicas are intentional for the dedup family (they exercise
the candidate-pruning paths under a 10x duplicate load, the
adversarial case for pair blow-up).

Usage: python scripts/scale_replicate.py [out_dir] [factor]
Writes out_dir/{table}.parquet (default /root/repo/.scale_sf1, 10x).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale_sf1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from luma_etl_data_platform_spark.core.session import get_spark

    spark = get_spark(app_name="scale-replicate")
    reps = F.broadcast(
        spark.range(factor).select(F.col("id").alias("_rep")))

    # per-table key columns to shift (offset = _rep * (max+1));
    # nation/region are fixed dimensions and copy through unshifted
    shifted: dict[str, list[str]] = {
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
        "nation": [],
        "region": [],
    }
    # cross-table FK offsets must agree: one offset per key family
    key_base: dict[str, int] = {}
    for t, cols in shifted.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        for c in cols:
            fam = c.split("_", 1)[1]  # orderkey, custkey, partkey, ...
            if fam not in key_base:
                key_base[fam] = df.agg(F.max(c)).collect()[0][0] + 1

    os.makedirs(out_dir, exist_ok=True)
    for t, cols in shifted.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if cols and factor > 1:
            df = df.crossJoin(reps)
            for c in cols:
                fam = c.split("_", 1)[1]
                df = df.withColumn(
                    c, F.col(c) + F.col("_rep") * F.lit(key_base[fam]))
            df = df.drop("_rep")
        if cols and factor > 1:
            # one output file per replica-ish: a replicated table
            # written as 1-2 big files has 1-2 parquet row groups, so
            # scan parallelism caps there no matter the split size and
            # an 8-vs-32-core comparison measures nothing (round-12
            # scaling-tier finding). 4 files per replica keeps files
            # >= a few MB while giving the scheduler real splits.
            df = df.repartition(4 * factor)
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"{t}: {spark.read.parquet(f'{out_dir}/{t}.parquet').count()} rows")


if __name__ == "__main__":
    main()
