"""Generate scaled-up test data by deterministic key-offset replication.

The driver provides sf{0.001,0.01,0.1}; the scaling measurement
(BENCH_SCALING.json, r5 verdict task 5) needs an sf1-class dataset to
confirm the top-cost gates scale near-linearly. 10 replicas of sf0.1 with
every primary/foreign key offset by replica*STRIDE reproduce the join
topology exactly (replica r's orders reference replica r's customers),
while dimension tables (region, nation) keep their real-world property of
NOT growing with the facts. Text/embedding payloads repeat across
replicas — which also stresses the dedup/LSH paths with genuine
cross-replica duplicates, the worst realistic case for them.

Usage: python tools/gen_scale.py [factor] [src_dir] [dst_dir]
Defaults: 10 /root/testdata/sf0.1 ./scaledata/sf1 (dst is gitignored).
"""

from __future__ import annotations

import os
import sys

STRIDE = 100_000_000  # far above any sf0.1 key

# per-table key columns offset by replica*STRIDE (FK partners share the
# offset, so within-replica referential integrity is exact)
OFFSET_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = {"region", "nation"}  # copied once, never replicated


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "./scaledata/sf1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("gen_scale")
        .getOrCreate()
    )
    os.makedirs(dst, exist_ok=True)
    for table, keys in OFFSET_COLS.items():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        out = f"{dst}/{table}.parquet"
        if table in DIMS:
            df.coalesce(1).write.mode("overwrite").parquet(out)
            print(f"{table}: copied (dimension)")
            continue
        reps = spark.range(factor).select(F.col("id").alias("_rep"))
        wide = df.crossJoin(reps)
        for k in keys:
            wide = wide.withColumn(
                k, (F.col(k) + F.col("_rep") * STRIDE).cast("long")
            )
        wide.drop("_rep").repartition(32).write.mode("overwrite").parquet(out)
        print(f"{table}: x{factor}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
