"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark AND its oracle_sql()
twin on DuckDB at the given sf dir, then compares row count, column names,
and order-insensitive values (columns sorted by name, rows sorted, doubles
compared bit-for-bit after both engines' own rounding).

Usage: python tools/check_oracle.py [--vanilla] [sf_dir] [query ...]

``--vanilla`` runs against a bare SparkSession (no engine confs), mimicking
the driver's session — catches anything that silently depends on
session.get_spark() defaults (the round-1 events/nanos failure mode).
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = repr(v)
            vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return out


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entrymod

    if vanilla:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[*]")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        from hive_io_experimental_spark import get_spark

        spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # gates are independent: drop the previous gate's cached frames
        # and release py4j handles so its localCheckpoint blocks can be
        # JVM-GC'd — without this the vanilla session accumulates ~188
        # gates of checkpoint/cache blocks and dies late in the suite
        # (observed: stopped SparkContext from gate ~170 onward)
        import gc as _gc

        spark.catalog.clearCache()
        _gc.collect()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            failures.append(name)
            rec["err"] = f"spark error: {exc}"
            print(f"FAIL {name}: spark error: {exc}")
            continue
        spark_t = time.perf_counter() - t0
        rec["spark_rows"] = len(s_rows)
        if name not in oracles:
            rec["err"] = "no oracle (rows-only check)"
            print(f"skip {name}: no oracle ({len(s_rows)} rows, {spark_t:.1f}s)")
            continue
        try:
            # Portability lint FIRST: our fetchall() turns HUGEINT into a
            # Python int (matches Spark's BIGINT repr), but a harness that
            # materializes via pandas/arrow gets float64/object instead —
            # exactly the r2-r4 driver-only funnel/source_mix divergence.
            # DuckDB widens SUM(int) to HUGEINT, so any uncast SUM is a
            # latent driver-side hash mismatch this replica cannot see.
            rel_types = [str(t) for t in con.sql(oracles[name]).types]
            hazards = [
                t for t in rel_types
                if t in ("HUGEINT", "UHUGEINT", "FLOAT")
                or t.startswith("DECIMAL")
            ]
            if hazards:
                failures.append(name)
                rec["err"] = f"oracle type hazard: {hazards}"
                print(
                    f"FAIL {name}: oracle emits non-portable types "
                    f"{hazards} (CAST to BIGINT/DOUBLE in the SQL)"
                )
                continue
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as exc:
            failures.append(name)
            rec["err"] = f"duckdb error: {exc}"
            print(f"FAIL {name}: duckdb error: {exc}")
            continue
        rec["oracle_rows"] = len(d_rows)
        rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
        rec["rows_match"] = len(s_rows) == len(d_rows)
        problems = []
        if not rec["schema_match"]:
            problems.append(f"columns {sorted(s_cols)} vs {sorted(d_cols)}")
        if not rec["rows_match"]:
            problems.append(f"rowcount {len(s_rows)} vs {len(d_rows)}")
        if not problems:
            sn = normalize(s_rows, s_cols)
            dn = normalize(d_rows, d_cols)
            rec["hash_match"] = sn == dn
            if sn != dn:
                diff = [
                    (a, b) for a, b in zip(sn, dn) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"ok   {name}: {len(s_rows)} rows ({spark_t:.1f}s spark)")

    if not only:  # full runs persist the whole map for the round record
        import json
        import os

        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "CORRECTNESS_LOCAL.json",
        )
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "vanilla": vanilla,
                       "results": report}, f, indent=1)
        print(f"wrote {out}")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
