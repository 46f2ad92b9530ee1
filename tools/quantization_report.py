"""Quantized-ANN promotion gate: recall@k of int8 cosine vs exact fp32
at a REAL scale (default scaledata/sf1, 20k vectors / 400 queries), not
just the sf0.01 fixture the pytest floor uses.

The r7 verdict's promotion criterion for the quantized tier: measure
quantization_quality_report end-to-end at sf1 and commit the report row
alongside the scaling record. This writes/updates the
"quantization_quality" key inside BENCH_SCALING.json:

    {"dir": ..., "n_queries": ..., "k": ..., "total_hits": ...,
     "recall_at_k": ..., "max_err_bound": ..., "threshold": 0.8,
     "pass": true}

and (r8 verdict task 6) the "ivf_sq8_quality" key — the COMPOSED
IVF-pruning + int8-scoring path (ivf_quantized_topk) graded the same
way via ivf_sq8_recall_check, so the tier that stacks both
approximations has its own committed recall record:

    {"dir": ..., "n_queries": ..., "k": ..., "nprobe": ...,
     "n_hits": ..., "recall_at_k": ..., "threshold": 0.8, "pass": true}

Threshold: recall@10 >= 0.8 for both, the same floor the unit test pins
at sf0.01 (tests/test_operators.py::test_quantized_cosine_topk_*) —
int8 with per-vector scales loses at most ~1/254 per component, and on
these label-clustered embeddings nprobe=2 of the stride-50 lists keeps
the true neighbors' lists probed (measured 0.916 at sf1).

Usage: python tools/quantization_report.py [sf_dir] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

THRESHOLD = 0.8


def main() -> int:
    args = list(sys.argv[1:])
    out_path = "BENCH_SCALING.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "./scaledata/sf1"

    from pyspark.sql import functions as F

    from hive_io_experimental_spark import get_spark
    from hive_io_experimental_spark.operators.similarity import (
        ivf_sq8_recall_check,
        quantization_quality_report,
    )

    spark = get_spark(
        "quant-report", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    row = quantization_quality_report(emb, k=10, query_mod=50).first()
    recall = row.total_hits / (row.n_queries * row.k)
    report = {
        "dir": sf_dir,
        "n_queries": int(row.n_queries),
        "k": int(row.k),
        "total_hits": int(row.total_hits),
        "recall_at_k": round(recall, 4),
        "max_err_bound": round(float(row.max_err_bound), 6),
        "threshold": THRESHOLD,
        "pass": recall >= THRESHOLD,
    }
    # composed IVF-SQ8 tier: fixed 400-query audit (same gate shape as
    # similarity_ivf_sq8_recall), nprobe=2 over the stride-50 lists
    sq8 = ivf_sq8_recall_check(
        emb, emb.filter(F.col("vec_id") < 400), k=10, nprobe=2
    ).first()
    sq8_recall = sq8.n_hits / sq8.n_exact_results
    sq8_report = {
        "dir": sf_dir,
        "n_queries": int(sq8.n_queries),
        "k": 10,
        "nprobe": 2,
        "n_hits": int(sq8.n_hits),
        "recall_at_k": round(sq8_recall, 4),
        "threshold": THRESHOLD,
        "pass": sq8_recall >= THRESHOLD,
    }
    # PQ-ADC tier: the 32-64x-compression path graded the same way —
    # sampled codebooks (stride 5, capped 128 — the gate dial), fixed
    # 400-query audit. PQ trades recall for compression far more
    # aggressively than SQ8, so its floor is the operator's contract
    # floor (0.2), not the SQ8 tier's 0.8 — recorded, not hidden.
    from hive_io_experimental_spark.operators.similarity import (
        pq_recall_check,
    )

    pq = pq_recall_check(
        emb, emb.filter(F.col("vec_id") < 400), k=10,
        centroid_stride=5, max_codes=128,
    ).first()
    pq_recall = pq.n_hits / pq.n_exact_results
    pq_report = {
        "dir": sf_dir,
        "n_queries": int(pq.n_queries),
        "k": 10,
        "num_subspaces": 4,
        "max_codes": 128,
        "n_hits": int(pq.n_hits),
        "recall_at_k": round(pq_recall, 4),
        "threshold": 0.2,
        "pass": pq_recall >= 0.2,
    }
    # IVF-PQ tier (new r10): the fully composed billion-scale shape —
    # sqrt(n) coarse lists (resolve_ivf_stride auto) + PQ-ADC in-list
    # scoring. Loses recall BOTH ways, so its floor is the operator's
    # contract floor (0.1) — recorded, not hidden.
    from hive_io_experimental_spark.operators.similarity import (
        ivf_pq_recall_check,
        resolve_ivf_stride,
    )

    n_corpus = emb.count()
    ivfpq = ivf_pq_recall_check(
        emb, emb.filter(F.col("vec_id") < 400), k=10,
        pq_stride=5, max_codes=128,
    ).first()
    ivfpq_recall = ivfpq.n_hits / ivfpq.n_exact_results
    ivfpq_report = {
        "dir": sf_dir,
        "n_queries": int(ivfpq.n_queries),
        "k": 10,
        "nprobe": 2,
        "centroid_stride": resolve_ivf_stride(n_corpus),
        "num_subspaces": 4,
        "max_codes": 128,
        "n_hits": int(ivfpq.n_hits),
        "recall_at_k": round(ivfpq_recall, 4),
        "threshold": 0.1,
        "pass": ivfpq_recall >= 0.1,
    }
    spark.stop()

    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    else:
        doc = {}
    doc["quantization_quality"] = report
    doc["ivf_sq8_quality"] = sq8_report
    doc["pq_quality"] = pq_report
    doc["ivf_pq_quality"] = ivfpq_report
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    print(json.dumps(sq8_report))
    print(json.dumps(pq_report))
    print(json.dumps(ivfpq_report))
    return 0 if (report["pass"] and sq8_report["pass"]
                 and pq_report["pass"] and ivfpq_report["pass"]) else 1


if __name__ == "__main__":
    raise SystemExit(main())
