"""Plan-shape audit: exchanges/broadcasts/read-columns for every query.

Run after adding or changing operators — a query whose exchange count jumps
unexpectedly has grown a shuffle that will bite at 100 TB long before it
shows up in sf0.1 wall-clock.

Usage: python tools/plan_audit.py [sf_dir] [--diff prev]

--diff prev: after printing the current audit, print a DIFF section
against the last committed PLAN_AUDIT.txt (``git show HEAD:PLAN_AUDIT.txt``)
— one line per query whose exchange/broadcast/read-col/pushed-filter shape
changed, plus added/removed queries. This is how "why did gate X regress"
questions answer themselves: a wall-clock mover with an unchanged plan line
is environment noise, a changed plan line names the added work.
"""

from __future__ import annotations

import re
import subprocess
import sys

sys.path.insert(0, ".")

_LINE = re.compile(
    r"^(\S+)\s+exchanges=(\d+) broadcasts=(\d+) read_cols=(\d+) pushed=(\d+)"
)


def _parse_audit(text: str) -> dict[str, tuple[int, int, int, int]]:
    out: dict[str, tuple[int, int, int, int]] = {}
    for line in text.splitlines():
        m = _LINE.match(line)
        if m:
            out[m.group(1)] = tuple(int(m.group(i)) for i in range(2, 6))
    return out


def _print_diff(cur_text: str) -> None:
    try:
        prev_text = subprocess.run(
            ["git", "show", "HEAD:PLAN_AUDIT.txt"],
            capture_output=True, text=True, timeout=30, check=True,
        ).stdout
    except (OSError, subprocess.SubprocessError):
        print("# diff: no committed PLAN_AUDIT.txt to diff against")
        return
    prev, cur = _parse_audit(prev_text), _parse_audit(cur_text)
    fields = ("exchanges", "broadcasts", "read_cols", "pushed")
    changed = []
    for name in sorted(set(prev) & set(cur)):
        if prev[name] != cur[name]:
            delta = ", ".join(
                f"{f} {p}->{c}"
                for f, p, c in zip(fields, prev[name], cur[name])
                if p != c
            )
            changed.append(f"~ {name:<28} {delta}")
    added = sorted(set(cur) - set(prev))
    removed = sorted(set(prev) - set(cur))
    print()
    print(
        f"# PLAN DIFF vs committed PLAN_AUDIT.txt: "
        f"{len(changed)} changed, {len(added)} added, {len(removed)} removed"
    )
    for line in changed:
        print(line)
    for name in added:
        print(f"+ {name}")
    for name in removed:
        print(f"- {name}")
    if not (changed or added or removed):
        print("# (no plan-shape changes)")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    do_diff = False
    if "--diff" in args:
        i = args.index("--diff")
        # accept "--diff prev" (the only mode) or bare "--diff"
        tail = args[i + 1 : i + 2]
        args = args[:i] + args[i + (2 if tail == ["prev"] else 1):]
        do_diff = True
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from hive_io_experimental_spark import get_spark
    from hive_io_experimental_spark.plans.inspect import scan_plan_report

    spark = get_spark(
        "plan-audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    bad = 0
    lines: list[str] = []
    for name, fn in entrymod.queries().items():
        try:
            rep = scan_plan_report(fn(spark, sf_dir))
            lines.append(
                f"{name:<28} exchanges={rep['num_exchanges']} "
                f"broadcasts={rep['num_broadcasts']} "
                f"read_cols={len(rep['read_columns'])} "
                f"pushed={len(rep['pushed_filters'])}"
            )
        except Exception as exc:  # noqa: BLE001 — audit must list every query
            bad += 1
            lines.append(f"{name:<28} ERROR {exc}")
        print(lines[-1])
    spark.stop()
    if do_diff:
        _print_diff("\n".join(lines))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
