"""Steady-state ingestion bench: probe cost vs corpus size.

The ingestion module's 100 TB claim is that a tick is BATCH-bound once
the artifacts exist: build once per corpus snapshot, then every batch
pays only its own tokenization plus joins against the stored probe
tables. This bench measures exactly that separation — artifacts are
built (and timed) once per corpus scale, then the SAME fixed batch is
probed against each, so the probe-time ratio across the corpus-growth
span isolates the corpus-size dependence of a tick. Tiers: sf0.1 ->
sf1 -> sf10, a measured 100x corpus span (r8 verdict task 5 — the
README's scale claim cites this record).

Writes INGEST_BENCH.json:
  build_s[tag]       artifact build wall (corpus-bound by design)
  probe_s[tag][op]   min-of-2 wall for ingest_batch /
                     ingest_batch_neardups / decontaminate_batch
  probe_ratio[op]    probe_s[largest] / probe_s[smallest] — the claim
                     is that this stays near 1 while the corpus grows
                     100x
  probe_ratio_steps  the same per adjacent tier pair (each a 10x step)
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

TIERS = [
    ("sf0.1", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")),
    ("sf1", "./scaledata/sf1"),
    ("sf10", "./scaledata/sf10"),
]
OUT = "INGEST_BENCH.json"


def _timed_min(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.operators import ingestion

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        # local mode: the driver JVM hosts every executor thread — the
        # 1g default OOMs on the sf10 artifact build (32 concurrent
        # winnowing tasks over 5M docs); match bench_scaling's sizing
        .config("spark.driver.memory", "32g")
        .appName("bench-ingest")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one fixed batch for every corpus scale, so probe ratios isolate
    # corpus-size dependence (batch work is held constant)
    batch = (
        spark.read.parquet(f"{TIERS[0][1]}/documents.parquet")
        .filter(F.col("doc_id") % 6 == 0)
        .localCheckpoint()  # pin the batch rows; exclude its scan from timings
    )
    n_batch = batch.count()

    result = {
        "n_batch": n_batch,
        "corpus_rows": {},
        "build_s": {},
        "probe_s": {},
    }
    tmp_roots = []
    # warm-up build (untimed): the session's first pandas/Arrow stage and
    # JIT otherwise land entirely on whichever corpus is built first and
    # invert the build comparison (observed: cold sf0.1 build slower than
    # warm sf1)
    warm = tempfile.mkdtemp(prefix="hio_ingest_bench_warm_")
    tmp_roots.append(warm)
    ingestion.build_corpus_artifacts(
        spark.read.parquet(f"{TIERS[0][1]}/documents.parquet"), warm,
        winnow=True,
    )
    try:
        for tag, d in TIERS:
            corpus = spark.read.parquet(f"{d}/documents.parquet")
            result["corpus_rows"][tag] = corpus.count()
            art = tempfile.mkdtemp(prefix=f"hio_ingest_bench_{tag}_")
            tmp_roots.append(art)
            t0 = time.perf_counter()
            ingestion.build_corpus_artifacts(corpus, art, winnow=True)
            result["build_s"][tag] = round(time.perf_counter() - t0, 3)
            result["probe_s"][tag] = {
                "ingest_batch": _timed_min(
                    lambda: ingestion.ingest_batch(batch, art).count()
                ),
                "ingest_batch_neardups": _timed_min(
                    lambda: ingestion.ingest_batch_neardups(batch, art).count()
                ),
                "decontaminate_batch": _timed_min(
                    lambda: ingestion.decontaminate_batch(batch, art).count()
                ),
            }
        small, big = TIERS[0][0], TIERS[-1][0]
        result["corpus_ratio"] = round(
            result["corpus_rows"][big] / result["corpus_rows"][small], 2
        )
        result["build_ratio"] = round(
            result["build_s"][big] / result["build_s"][small], 2
        )
        result["probe_ratio"] = {
            op: round(result["probe_s"][big][op] / result["probe_s"][small][op], 2)
            for op in result["probe_s"][small]
        }
        result["probe_ratio_steps"] = {
            f"{a}->{b}": {
                op: round(
                    result["probe_s"][b][op] / result["probe_s"][a][op], 2
                )
                for op in result["probe_s"][a]
            }
            for (a, _), (b, _) in zip(TIERS, TIERS[1:])
        }
        result["note"] = (
            "probe_ratio near 1 at a {}x corpus = ingestion ticks are "
            "batch-bound once artifacts exist; build_ratio tracks corpus "
            "size by design (paid once per snapshot, not per tick)"
        ).format(result["corpus_ratio"])
    finally:
        for p in tmp_roots:
            shutil.rmtree(p, ignore_errors=True)
    with open(OUT, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
