"""Isolated warm-session timing forensics for drift-watchlist gates.

The repo's documented tiebreaker for a multi-second gate whose wall
moved across rounds while PLAN_AUDIT proved its plan byte-identical
(r8 verdict task 2: similarity_topk_bucketed 1.81 -> 2.63 -> 2.82 s
over r6 -> r8): time the gate ALONE in one warm session, many passes,
and commit the spread. The decision rule is the repo's own noise
calibration (ROADMAP/memory): back-to-back identical runs on this VM
swing up to ~1.5x on multi-second gates under CPU steal — so

  * spread max/min >= 1.5  -> the movement is inside the machine's own
    jitter band; environment, matter closed;
  * tight spread (max/min < 1.3) whose median sits at the drifted
    level -> real, and the build_s/exec_s split names WHERE: plan
    CONSTRUCTION (Python/probe-side work the plan lines can't show)
    vs plan EXECUTION (the JVM job the plan fully describes).

Writes PERF_FORENSICS_r{N}.json:
  {gate: {"build_s": [...], "exec_s": [...], "total_spread":
          {"min","med","max"}, "spread_ratio": max/min,
          "verdict": "noise-band" | "tight"}}

Usage: python tools/perf_forensics.py [sf_dir] --round N [gates...]
       (default gates: the r8 verdict watchlist)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

WATCHLIST = [
    "similarity_topk_bucketed",
    "dedup_simhash_pairs",
    "snapshot_rollback",
    "repartition_migrate",
    "dedup_embedding_clusters",
]
PASSES = 7


def main() -> int:
    args = list(sys.argv[1:])
    rnd = "9"
    if "--round" in args:
        i = args.index("--round")
        rnd = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    gates = [a for a in args if not os.path.isdir(a)] or WATCHLIST

    import __spark_entry__ as e
    from hive_io_experimental_spark import get_spark

    spark = get_spark(
        "perf-forensics",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    q = e.queries()
    # warm: JVM, parquet reader, Arrow worker pool (same as bench.py)
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    spark.range(1024).repartition(
        int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    ).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    out = {}
    for name in gates:
        fn = q[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        build_s, exec_s, totals = [], [], []
        for _ in range(PASSES):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            build_s.append(round(t1 - t0, 3))
            exec_s.append(round(t2 - t1, 3))
            totals.append(round(t2 - t0, 3))
        ratio = round(max(totals) / min(totals), 2)
        out[name] = {
            "build_s": build_s,
            "exec_s": exec_s,
            "total_spread": {
                "min": min(totals),
                "med": round(statistics.median(totals), 3),
                "max": max(totals),
            },
            "spread_ratio": ratio,
            "verdict": "noise-band" if ratio >= 1.5 else "tight",
        }
        print(name, json.dumps(out[name]["total_spread"]),
              "ratio", ratio, out[name]["verdict"])
    spark.stop()
    path = f"PERF_FORENSICS_r{int(rnd):02d}.json"
    with open(path, "w") as f:
        json.dump({"sf_dir": sf_dir, "passes": PASSES, "gates": out}, f,
                  indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
