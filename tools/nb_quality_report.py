"""NB classifier routing quality at a REAL scale: held-out language
accuracy at sf1 (50k docs — train on even doc_ids, score odd), committed
next to the ANN tiers' quality records.

Writes/updates the "nb_quality" key inside BENCH_SCALING.json:

    {"dir": ..., "n_train": ..., "n_test": ..., "n_correct": ...,
     "accuracy": ..., "n_labels": ..., "chance": ...,
     "threshold_over_chance": 1.4, "pass": true}

Threshold: accuracy >= 1.4x chance. The synthetic corpus encodes the
lang label WEAKLY by construction — the committed lang_id heuristic
itself only agrees ~0.39 with the labels — so the honest bar is
beats-chance-with-margin, not absolute accuracy; the measured value is
recorded for r13's gate to reference.

Usage: python tools/nb_quality_report.py [sf_dir] [--out FILE]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

THRESHOLD_OVER_CHANCE = 1.4


def main() -> int:
    args = list(sys.argv[1:])
    out_path = "BENCH_SCALING.json"
    if "--out" in args:
        i = args.index("--out")
        if i + 1 >= len(args):
            raise SystemExit(
                "usage: nb_quality_report.py [sf_dir] [--out FILE]"
            )
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "./scaledata/sf1"

    from pyspark.sql import functions as F

    from hive_io_experimental_spark import get_spark
    from hive_io_experimental_spark.operators.text import nb_score, nb_train

    spark = get_spark(
        "nb-quality", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter(F.col("doc_id") % 2 == 0)
    test = docs.filter(F.col("doc_id") % 2 == 1)
    priors, likelihoods = nb_train(train, label_col="lang")
    n_labels = priors.count()
    if n_labels < 2:
        raise SystemExit(
            f"nb_quality_report: {sf_dir} holds < 2 language labels — "
            f"nothing to classify"
        )
    pred = nb_score(test, priors, likelihoods)
    row = (
        pred.join(
            test.select("doc_id", F.col("lang").alias("truth")), "doc_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("label") == F.col("truth"), 1).otherwise(0)
            ).alias("ok"),
        )
        .first()
    )
    n_train = train.count()
    spark.stop()
    acc = row["ok"] / row["n"]
    chance = 1.0 / n_labels
    report = {
        "dir": sf_dir,
        "n_train": int(n_train),
        "n_test": int(row["n"]),
        "n_correct": int(row["ok"]),
        "accuracy": round(acc, 4),
        "n_labels": int(n_labels),
        "chance": round(chance, 4),
        "threshold_over_chance": THRESHOLD_OVER_CHANCE,
        "pass": acc >= THRESHOLD_OVER_CHANCE * chance,
    }
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    else:
        doc = {}
    doc["nb_quality"] = report
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(json.dumps(report))
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
