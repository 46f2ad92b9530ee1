"""Benchmark harness — mirrors the reference's tailer/InputBenchmark shape.

The reference's only published number is scan+parse throughput (140 MB/s,
README.md:111, hivetail CSV: rows/threads/MB/seconds/rows/s/MB/s —
tailer/Stats.java:133-151).  This harness reports:

  * scan: full lineitem scan projecting 3 cols (BIGINT,BIGINT,DOUBLE —
    the reference's parseLongLongDouble shape, InputBenchmark.java:132-136),
    forcing materialization, -> rows/s and MB/s;
  * write: partitioned parquet write+commit (OutputCmd shape) -> rows/s;
  * every headline query from __spark_entry__.queries() -> seconds each.

Every timed item runs SPARK_GRAFT_BENCH_RUNS times (default 3) and the
headline number is the min — the VM shows heavy CPU-steal noise (a
single-run suite showed 7.8 s vs 1.2 s for two near-identical
aggregates over one table), and min-of-runs is the standard way to
strip scheduler noise from a steady-state benchmark. The record ALSO
carries every raw sample and the per-gate min/med/max spread (r8
verdict task 8): a gate whose wall "drifted" between rounds answers
from the committed spread — a wide spread is steal noise, a tight
spread that moved is real — instead of from memory. prev_delta is
computed on MEDIANS (the steal-robust center), falling back to min
when the previous record predates spreads. tools/bench_merge.py
merges the samples of several back-to-back passes into one record —
SAME-HEAD passes only (r12 verdict task 1): every record carries a
``head`` + ``generated_at`` stamp, and a record is one sitting at one
commit; folding a later sitting's pass into an older record let stale
quiet-machine minima survive as unreproducible medians.
The record grades itself: ``contention_flag`` is set when >= 5 gates
show a >3x max/min spread within the SAME run on identical code —
read a flagged record against a quiet-machine BENCH_LOCAL.json, not
as a code regression (r10 verdict task 8). Two r13-verdict hardenings:
``queries_norm``/``prev_delta_norm`` are each gate's median as a ratio
to the same pass's scan_3col median (cancels pass-wide VM load, so a
loaded pass shows ~0 normalized movers instead of 38 phantom ones),
and in a quiet pass any sub-second gate whose raw median moved >1.4x
is automatically given RUNS more samples before the record is written
(``resampled`` lists them).

Prints ONE JSON line:
  {"metric": "suite_seconds", "value": N, "unit": "sec",
   "queries": {...}, "samples": {...}, "spread": {...}, "sf": ...,
   "scan_mb_per_s": ..., "scan_rows_per_s": ...,
   "prev_delta": {...}}   # cur/prev MEDIAN ratio per query that moved
                          # >1.3x, vs the last committed BENCH_LOCAL.json

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default all cores),
     SPARK_GRAFT_BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from hive_io_experimental_spark import get_spark  # noqa: E402


RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _timed(fn, runs: int = RUNS) -> list[float]:
    """Wall-clock samples over ``runs`` executions of ``fn``."""
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    return out


def _timed_min(fn, runs: int = RUNS) -> float:
    """Min wall-clock over ``runs`` executions of ``fn``."""
    return min(_timed(fn, runs))


def _spread(samples: list[float]) -> dict[str, float]:
    import statistics

    return {
        "min": round(min(samples), 3),
        "med": round(statistics.median(samples), 3),
        "max": round(max(samples), 3),
    }


def _latest_prev_bench(here: str) -> dict | None:
    """The previous round's full per-query map.

    Preference order: the last COMMITTED BENCH_LOCAL.json (the auditable
    round record — `git show` so a re-run within a round still diffs
    against the prior round, not against itself), then the on-disk
    BENCH_LOCAL.json, then the newest driver-recorded BENCH_r{N}.json.
    The driver record archives only the tail of the bench stdout, so its
    "parsed" field is usually null — it is the last resort, not the first.
    """
    import glob
    import re
    import subprocess

    try:
        doc = json.loads(
            subprocess.run(
                ["git", "-C", here, "show", "HEAD:BENCH_LOCAL.json"],
                capture_output=True, text=True, timeout=30, check=True,
            ).stdout
        )
        if doc.get("queries"):
            return doc
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    try:
        with open(os.path.join(here, "BENCH_LOCAL.json")) as f:
            doc = json.load(f)
        if doc.get("queries"):
            return doc
    except (OSError, ValueError):
        pass
    best_n, best_path = -1, None
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best_n, best_path = int(m.group(1)), p
    if best_path is None:
        return None
    try:
        with open(best_path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return None
    # the driver wraps this script's JSON line under "parsed" (often null,
    # because only the stdout tail survives)
    parsed = doc.get("parsed") or {}
    return parsed if parsed.get("queries") else None


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("hio-bench")

    timings: dict[str, float] = {}
    samples: dict[str, list[float]] = {}

    # --- warmup: JVM/JIT + Hadoop FS + parquet reader init (excluded from
    # timings, standard steady-state benchmark practice) ---------------------
    lineitem_path = f"{sf_dir}/lineitem.parquet"
    spark.range(1_000_000).agg(F.sum("id")).collect()
    spark.read.parquet(lineitem_path).limit(1).collect()
    # Python/Arrow worker pool: the first pandas-UDF stage of a session pays
    # ~250ms x n_workers daemon spin-up; touch every worker once so Arrow
    # queries measure steady-state like everything else.
    spark.range(1024).repartition(int(os.environ.get(
        "SPARK_GRAFT_CPUS", os.cpu_count() or 4
    ))).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()

    # --- scan benchmark (reference parseLongLongDouble shape) ---------------
    # The testdata files are single-row-group parquet, which Spark cannot
    # split below one task; the reference's tailer instead runs N threads
    # over a split queue (SplitOptions.java). Mirror that: list the file once
    # per thread so the scan runs as `threads` parallel splits, and time the
    # value-materializing aggregate (count() alone would be answered from
    # parquet footer metadata without reading data pages).
    threads = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    scan = spark.read.parquet(*([lineitem_path] * threads)).select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    n_rows = scan.count()
    samples["scan_3col"] = _timed(
        lambda: scan.agg(
            F.sum("l_orderkey"), F.sum("l_partkey"), F.sum("l_extendedprice")
        ).collect()
    )
    scan_s = min(samples["scan_3col"])
    scan_mb = _dir_bytes(lineitem_path) * threads / 1e6
    timings["scan_3col"] = round(scan_s, 3)

    # --- write benchmark (partitioned write+commit, OutputCmd shape) --------
    out_dir = tempfile.mkdtemp(prefix="hio_bench_out_")
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    write_rows_per_s = -1
    try:
        samples["write_partitioned"] = _timed(
            lambda: (
                spark.read.parquet(f"{sf_dir}/orders.parquet")
                .withColumn("o_status_part", F.col("o_orderstatus"))
                .write.mode("overwrite")
                .partitionBy("o_status_part")
                .parquet(f"{out_dir}/orders_bench")
            )
        )
        timings["write_partitioned"] = min(samples["write_partitioned"])
        write_rows_per_s = round(n_orders / timings["write_partitioned"])

        # --- partition-filtered scan (get_partitions_by_filter path): the
        # filter prunes partition directories at plan time ------------------
        samples["scan_partition_filtered"] = _timed(
            lambda: (
                spark.read.parquet(f"{out_dir}/orders_bench")
                .filter(F.col("o_status_part") == "F")
                .agg(F.sum("o_totalprice"))
                .collect()
            )
        )
        timings["scan_partition_filtered"] = min(
            samples["scan_partition_filtered"]
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)

    # --- headline queries ----------------------------------------------------
    qfns = entrymod.queries()
    for name, fn in qfns.items():
        try:
            samples[name] = _timed(
                lambda: fn(spark, sf_dir)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            timings[name] = min(samples[name])
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench query {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            samples.pop(name, None)

    total = round(sum(t for t in timings.values() if t > 0), 3)

    # --- deltas vs the previous round's driver-recorded bench ----------------
    prev = _latest_prev_bench(os.path.dirname(os.path.abspath(__file__)))
    prev_delta: dict[str, float] = {}
    try:  # deltas only make sense at the same scale factor
        if prev and float(prev.get("sf", "nan")) != float(sf):
            prev = None
    except (TypeError, ValueError):
        prev = None
    spread = {name: _spread(s) for name, s in samples.items()}
    # self-grading contention flag (r10 verdict task 8): identical code
    # within one run should time tight; many gates with a wide max/min
    # spread mean the box was contended and the absolute numbers (and
    # prev_delta) should be read against a quiet-machine BENCH_LOCAL
    # record, not as a code regression.
    contended = sorted(
        name for name, sp in spread.items()
        if sp["min"] > 0 and sp["max"] / sp["min"] > 3.0
    )

    def _raw_ratios() -> dict[str, float]:
        out: dict[str, float] = {}
        if not prev:
            return out
        prev_spread = prev.get("spread") or {}
        for name, cur in timings.items():
            # medians, both sides, when available (steal-robust center);
            # min-vs-min only against pre-spread records
            cur_c = spread.get(name, {}).get("med", cur)
            old = (prev_spread.get(name) or {}).get(
                "med", (prev.get("queries") or {}).get(name)
            )
            if isinstance(old, (int, float)) and old > 0 and cur_c > 0:
                out[name] = cur_c / old
        return out

    # sub-second outlier resample (r13 verdict task 3): in an otherwise
    # QUIET pass, a 0.1-1 s gate whose median moved >1.4x vs the committed
    # record is almost always a scheduler blip the 3-sample median failed
    # to reject (the r13 record shipped three such multimodal medians the
    # driver's fresh pass put back at 0.5-0.65x) — too few gates to trip
    # contention_flag, too small to self-average. Give exactly those gates
    # RUNS more samples and let the median re-center before the record is
    # written; the resample list is recorded for the audit trail.
    resampled: list[str] = []
    if prev and len(contended) < 5:
        # largest movement first: the 10-gate wall-clock bound must spend
        # itself on the worst outliers, not the alphabet (the r14 record
        # left a 1.32x sub-second mover unresampled because 10 smaller
        # movers sorted ahead of it by name)
        for name, r in sorted(
            _raw_ratios().items(), key=lambda kv: -max(kv[1], 1 / kv[1])
        ):
            if len(resampled) >= 10:
                break  # bound the extra wall-clock a noisy pass can add
            med = spread.get(name, {}).get("med")
            if (
                name in qfns and name in samples
                and med is not None and med < 1.0
                and (r >= 1.4 or r <= 1 / 1.4)
            ):
                fn = qfns[name]
                try:
                    samples[name].extend(_timed(
                        lambda: fn(spark, sf_dir)
                        .write.format("noop").mode("overwrite").save()
                    ))
                except Exception as exc:
                    print(f"resample {name} failed: {exc}", file=sys.stderr)
                    continue
                timings[name] = min(samples[name])
                spread[name] = _spread(samples[name])
                resampled.append(name)
    if resampled:
        # re-derive the headline total and the contention self-grade from
        # the post-resample pool — both were computed from pre-resample
        # samples, and a record whose `value` is not the sum of its own
        # per-gate mins (or whose contention_flag disagrees with its own
        # spread) corrupts the self-grading signal it exists to carry
        total = round(sum(t for t in timings.values() if t > 0), 3)
        contended = sorted(
            name for name, sp in spread.items()
            if sp["min"] > 0 and sp["max"] / sp["min"] > 3.0
        )

    for name, ratio in _raw_ratios().items():
        # only report material movement (>1.3x either way) — the
        # VM's CPU-steal noise makes smaller swings meaningless
        if ratio >= 1.3 or ratio <= 1 / 1.3:
            prev_delta[name] = round(ratio, 2)

    # load-normalized twin of prev_delta (r13 verdict task 2): wall medians
    # move 1.3-1.6x UNIFORMLY when the VM is loaded (the driver's r13 pass
    # flagged 38/42 gates with zero plan changes). Each gate's median as a
    # RATIO to the same pass's scan_3col median cancels the pass-wide load
    # factor, so prev_delta_norm shows plan changes, not machine weather.
    # (scan_3col is the anchor: JVM-side, first-timed, in every record.)
    _ANCHOR = "scan_3col"
    queries_norm: dict[str, float] = {}
    a_med = spread.get(_ANCHOR, {}).get("med")
    if a_med and a_med > 0:
        queries_norm = {
            name: round(sp["med"] / a_med, 4)
            for name, sp in spread.items() if name != _ANCHOR
        }
    prev_delta_norm: dict[str, float] = {}
    if prev and queries_norm:
        prev_norm = dict(prev.get("queries_norm") or {})
        if not prev_norm:  # older record: derive from its spread medians
            ps = prev.get("spread") or {}
            pa = (ps.get(_ANCHOR) or {}).get(
                "med", (prev.get("queries") or {}).get(_ANCHOR)
            )
            if isinstance(pa, (int, float)) and pa > 0:
                for name, sp in ps.items():
                    if name != _ANCHOR and sp.get("med", 0) > 0:
                        prev_norm[name] = sp["med"] / pa
        for name, cur_n in queries_norm.items():
            old_n = prev_norm.get(name)
            if isinstance(old_n, (int, float)) and old_n > 0 and cur_n > 0:
                ratio = cur_n / old_n
                if ratio >= 1.3 or ratio <= 1 / 1.3:
                    prev_delta_norm[name] = round(ratio, 2)
    # Key order matters: the driver archives only the TAIL of stdout, so the
    # big per-query dicts go first and the scalar headline metrics last —
    # a front-truncated capture still retains scan throughput and the total.
    # single-epoch provenance stamp (r12 verdict task 1): a committed
    # record must be reproducible — HEAD pins the code, the timestamp
    # pins the sitting, and bench_merge refuses to fold passes from a
    # different HEAD into one record (the cross-sitting deep-merge let
    # old quiet-machine minima drift the record ~1.4-2.7x optimistic)
    import subprocess as _sp
    import time as _time

    try:
        _here = os.path.dirname(os.path.abspath(__file__))
        _head = _sp.run(
            ["git", "-C", _here, "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        # a dirty worktree means the measured code is NOT the commit the
        # stamp names — mark it so bench_merge refuses to fold such a
        # pass into a record (two dirty passes at one HEAD can be two
        # different uncommitted plans). Bench/correctness artifacts and
        # untracked files are EXCLUDED from the probe: the first pass
        # overwrites tracked BENCH_LOCAL.json and drops pass copies, so a
        # plain `git status --porcelain` stamped every subsequent pass of
        # the sitting +dirty and the documented multi-pass merge could
        # never run (r13 ADVICE). Tradeoff: a brand-new UNTRACKED source
        # module escapes the probe — acceptable, because measured code is
        # imported from tracked modules and the committed record is
        # re-proven by the driver's own pass each round.
        _dirty = _sp.run(
            ["git", "-C", _here, "status", "--porcelain",
             "--untracked-files=no", "--", ".",
             ":(exclude)BENCH_LOCAL.json", ":(exclude)BENCH_r*.json",
             ":(exclude)BENCH_SCALING.json",
             ":(exclude)BENCH_SCALING_100X.json",
             ":(exclude)INGEST_BENCH.json",
             ":(exclude)OPERATORS.md", ":(exclude)PLAN_AUDIT.txt",
             ":(exclude)CORRECTNESS*.json", ":(exclude)VERDICT.md",
             ":(exclude)ADVICE.md"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout.strip()
        if _dirty:
            _head += "+dirty"
    except (OSError, _sp.SubprocessError):
        _head = None
    result = {
        "queries": timings,
        "samples": samples,
        "spread": spread,
        "queries_norm": queries_norm,
        "prev_delta": prev_delta,
        "prev_delta_norm": prev_delta_norm,
        "norm_anchor": _ANCHOR,
        "resampled": resampled,
        "head": _head,
        "generated_at": _time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", _time.gmtime()
        ),
        "sf": sf,
        "scan_rows": n_rows,
        "scan_seconds": round(scan_s, 3),
        "scan_mb": round(scan_mb, 2),
        "scan_mb_per_s": round(scan_mb / scan_s, 2),
        "scan_rows_per_s": round(n_rows / scan_s),
        "write_rows": n_orders,
        "write_rows_per_s": write_rows_per_s,
        "threads": threads,
        "runs_per_item": RUNS,
        "n_failed": sum(1 for t in timings.values() if t < 0),
        "contention_gates": len(contended),
        "contention_flag": len(contended) >= 5,
        "metric": "suite_seconds",
        "value": total,
        "unit": "sec",
    }
    # Persist the full structured result alongside the repo so round-over-
    # round comparisons stay auditable even when the driver's stdout capture
    # truncates the JSON line.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as f:
        json.dump(result, f, indent=1)
    # The printed contract line is COMPACT (r14 verdict task 8): the r13
    # line was lost to the driver's bounded stdout-tail capture because
    # the per-sample/spread/norm maps made it ~60 KB. Those maps live in
    # the BENCH_LOCAL.json sidecar above (same pass, full detail); the
    # line keeps the full per-gate seconds map and every scalar — the
    # driver contract — at ~6 KB. It is also the FINAL stdout line:
    # spark.stop() runs first so no late JVM/py4j output can trail it.
    compact = {
        k: v for k, v in result.items()
        if k not in ("samples", "spread", "queries_norm")
    }
    spark.stop()
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
