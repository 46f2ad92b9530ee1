"""Plan-shape audit: exchanges/broadcasts/read-columns for every query.

Run after adding or changing operators — a query whose exchange count jumps
unexpectedly has grown a shuffle that will bite at 100 TB long before it
shows up in sf0.1 wall-clock.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from hive_io_experimental_spark import get_spark
    from hive_io_experimental_spark.plans.inspect import scan_plan_report

    spark = get_spark(
        "plan-audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    bad = 0
    for name, fn in entrymod.queries().items():
        try:
            rep = scan_plan_report(fn(spark, sf_dir))
            print(
                f"{name:<28} exchanges={rep['num_exchanges']} "
                f"broadcasts={rep['num_broadcasts']} "
                f"read_cols={len(rep['read_columns'])} "
                f"pushed={len(rep['pushed_filters'])}"
            )
        except Exception as exc:  # noqa: BLE001 — audit must list every query
            bad += 1
            print(f"{name:<28} ERROR {exc}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
