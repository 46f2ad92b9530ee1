"""LSH persisted-index serving quality at a REAL scale (r11 verdict task
7): recall@10 of lsh_query_index vs exact brute force at sf1, across the
full probe-depth dial (probe_bits 0/1/2), at the production AUTO plane
count — the one ANN tier whose persisted-index path had lifecycle proofs
(build/append/serve/consistency) but no committed sf1 recall number.

Writes/updates the "lsh_quality" key inside BENCH_SCALING.json, next to
the other four tiers' records (quantization_quality / ivf_sq8_quality /
pq_quality / ivf_pq_quality):

    {"dir": ..., "n_queries": 400, "k": 10, "num_planes": <auto>,
     "recall_at_k": {"probe_bits_0": ..., "probe_bits_1": ...,
                     "probe_bits_2": ...},
     "threshold": 0.8, "pass": true}

Threshold: recall@10 >= 0.8 at the probe_bits=2 SERVING dial — the same
floor as the SQ8/IVF-SQ8 tiers, justified by measurement: the auto
9-plane dial at sf1 measures 0.902 / 0.912 / 0.935 at probe_bits 0/1/2
(these label-clustered embeddings collide same-label vectors into the
same half-spaces). All three probe depths are recorded so the
recall/fan-out trade stays visible, not hidden.

Usage: python tools/lsh_quality_report.py [sf_dir] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, ".")

THRESHOLD = 0.8
K = 10
N_QUERIES = 400


def main() -> int:
    args = list(sys.argv[1:])
    out_path = "BENCH_SCALING.json"
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            raise SystemExit(
                "usage: lsh_quality_report.py [sf_dir] [--out FILE]"
            )
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "./scaledata/sf1"

    from pyspark.sql import functions as F

    from hive_io_experimental_spark import get_spark
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.similarity import (
        cosine_topk,
        lsh_build_index,
        lsh_query_index,
    )

    spark = get_spark(
        "lsh-quality", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    with tempfile.TemporaryDirectory() as tmp:
        cat = Catalog(os.path.join(tmp, "wh"))
        # num_planes=None -> resolve_num_planes(n) — the production dial
        lsh_build_index(
            spark, cat, "default.lshq_sf1", emb, num_planes=None
        )
        from hive_io_experimental_spark.input import HiveInput, ScanSpec

        num_planes = int(
            HiveInput(spark, cat)
            .read_table(ScanSpec(table="default.lshq_sf1_meta"))
            .first()["num_planes"]
        )
        exact = (
            cosine_topk(emb, queries, k=K)
            .select("query_id", "neighbor_id")
        )
        from hive_io_experimental_spark.functions.reuse import reuse

        exact = reuse(exact)
        n_exact = exact.count()
        if n_exact == 0:
            raise SystemExit(
                f"lsh_quality_report: no vectors with vec_id < "
                f"{N_QUERIES} in {sf_dir}/embeddings.parquet — nothing "
                f"to grade (check the sf_dir)"
            )
        recalls = {}
        for bits in (0, 1, 2):
            approx = lsh_query_index(
                spark, cat, "default.lshq_sf1", emb, queries,
                k=K, probe_bits=bits,
            ).select("query_id", "neighbor_id")
            hits = approx.join(exact, ["query_id", "neighbor_id"]).count()
            recalls[f"probe_bits_{bits}"] = round(hits / n_exact, 4)
    spark.stop()

    report = {
        "dir": sf_dir,
        "n_queries": N_QUERIES,
        "k": K,
        "num_planes": num_planes,
        "n_exact_slots": int(n_exact),
        "recall_at_k": recalls,
        "threshold": THRESHOLD,
        "pass": recalls["probe_bits_2"] >= THRESHOLD,
    }
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    else:
        doc = {}
    doc["lsh_quality"] = report
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
