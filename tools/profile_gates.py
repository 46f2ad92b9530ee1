"""Per-job profiling of expensive gates (optimization round instrument).

Runs the named gates once (after the bench's standard warmup), with the
Spark UI enabled, and prints each gate's wall seconds plus its Spark jobs
(duration, description) fetched from the UI REST API — guide §1's "decide
where the current plan is actually spending time" step. Not part of the
bench contract; a scratch instrument.

Usage: python tools/profile_gates.py [gate ...]   (default: top-cost set)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from hive_io_experimental_spark import get_spark  # noqa: E402

DEFAULT_GATES = [
    "similarity_ivfpq_repair",
    "nb_incremental_update",
    "similarity_ivfpq_append",
    "similarity_pq_append",
    "ingest_decontaminate",
    "similarity_ivf_pq_index",
    "bpe_vocab_index",
    "nb_classify_lang",
    "ingest_batch_neardups",
    "similarity_pq_index",
]


def _jobs(api: str) -> list[dict]:
    with urllib.request.urlopen(f"{api}/jobs") as r:
        return json.loads(r.read())


def main() -> int:
    gates = sys.argv[1:] or DEFAULT_GATES
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("hio-profile", extra_conf={
        "spark.ui.enabled": "true",
        "spark.ui.port": "4050",
    })
    # same warmup as bench.py
    spark.range(1_000_000).agg(F.sum("id")).collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1).collect()
    spark.range(1024).repartition(int(os.environ.get(
        "SPARK_GRAFT_CPUS", os.cpu_count() or 4
    ))).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    with urllib.request.urlopen("http://localhost:4050/api/v1/applications") as r:
        app_id = json.loads(r.read())[0]["id"]
    api = f"http://localhost:4050/api/v1/applications/{app_id}"

    qfns = entrymod.queries()
    for name in gates:
        fn = qfns[name]
        before_ids = {j["jobId"] for j in _jobs(api)}
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [j for j in _jobs(api) if j["jobId"] not in before_ids]
        jobs.sort(key=lambda j: j["jobId"])
        total_job = 0.0
        rows = []
        for j in jobs:
            try:
                t_sub = time.strptime(
                    j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                )
                t_end = time.strptime(
                    j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"
                )
                # sub-second precision from the GMT offsets
                ms_sub = float(j["submissionTime"][19:23] or 0)
                ms_end = float(j["completionTime"][19:23] or 0)
                dur = (time.mktime(t_end) + ms_end) - (
                    time.mktime(t_sub) + ms_sub
                )
            except Exception:
                dur = -1
            total_job += max(dur, 0)
            rows.append((dur, j["jobId"], (j.get("description") or j.get(
                "name", ""))[:110], j.get("numTasks", 0)))
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs, "
              f"job-time sum {total_job:.2f}s, "
              f"gap(driver) {wall - total_job:.2f}s ===")
        for dur, jid, desc, ntasks in sorted(rows, reverse=True)[:15]:
            print(f"  {dur:7.3f}s  job{jid:<5d} tasks={ntasks:<4d} {desc}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
