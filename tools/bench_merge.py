"""Merge several back-to-back bench.py passes into one BENCH_LOCAL.json.

SINGLE-EPOCH FENCE (r12 verdict task 1): every pass must carry the SAME
``head`` stamp (bench.py stamps HEAD + timestamp since r13) — merging
passes from different commits or different sittings produced a record
whose min/median nobody could reproduce (old quiet-machine minima kept
surviving the merge while the plans' true cost drifted; the r12 judge
measured ~18 gates 1.4-2.7x above the merged medians with zero plan
changes). A record is one sitting at one HEAD, full stop; a new sitting
starts a new record.

Each bench.py invocation OVERWRITES BENCH_LOCAL.json, so the round
workflow copies each pass aside and merges here: raw samples are
CONCATENATED per gate (never min-of-mins alone — the spread must come
from the real sample pool, r8 verdict task 8), then

  queries[gate]  = min over all samples (the steady-state headline)
  spread[gate]   = min / median / max over all samples
  prev_delta     = recomputed on MEDIANS vs the last COMMITTED
                   BENCH_LOCAL.json (git show HEAD: — a merge re-run
                   within a round still diffs against the prior round)

Scalar throughput fields (scan_mb_per_s etc.) are recomputed from the
merged scan_3col min; other metadata comes from the first pass.

Usage: python tools/bench_merge.py pass1.json pass2.json [...] \
           [--out BENCH_LOCAL.json]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys


def _spread(samples: list[float]) -> dict[str, float]:
    return {
        "min": round(min(samples), 3),
        "med": round(statistics.median(samples), 3),
        "max": round(max(samples), 3),
    }


def _prev_committed(here: str) -> dict | None:
    try:
        doc = json.loads(
            subprocess.run(
                ["git", "-C", here, "show", "HEAD:BENCH_LOCAL.json"],
                capture_output=True, text=True, timeout=30, check=True,
            ).stdout
        )
        return doc if doc.get("queries") else None
    except (OSError, ValueError, subprocess.SubprocessError):
        return None


def main() -> int:
    args = list(sys.argv[1:])
    out_path = "BENCH_LOCAL.json"
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    if len(args) < 1:
        print(__doc__, file=sys.stderr)
        return 2

    passes = []
    for p in args:
        with open(p) as f:
            passes.append(json.load(f))
    sfs = {d.get("sf") for d in passes}
    if len(sfs) != 1:
        raise SystemExit(f"refusing to merge across scale factors: {sfs}")
    # single-epoch fence: one sitting at one HEAD. Unstamped pass files
    # predate the fence and are refused too — re-run bench.py.
    heads = {d.get("head") for d in passes}
    if None in heads or len(heads) != 1:
        raise SystemExit(
            f"refusing to merge passes across epochs: head stamps {heads} "
            f"— a merged record is ONE sitting at ONE commit (re-run "
            f"bench.py for unstamped passes; never fold a new pass into "
            f"an older record)"
        )
    if any(h.endswith("+dirty") for h in heads):
        raise SystemExit(
            f"refusing to merge dirty-worktree passes (head {heads}): the "
            f"stamp names a commit the measured code does not match, and "
            f"two dirty passes can be two different uncommitted plans. "
            f"Commit first, then re-run bench.py."
        )
    # same-SITTING fence: same-HEAD passes taken days apart mix machine-
    # load regimes into one sample pool — the unreproducible-median
    # failure the epoch stamp exists to close. 4h comfortably covers
    # back-to-back passes (~20 min each) and blocks the next-week case.
    # A pass missing generated_at is refused outright (same treatment as
    # a missing head, r13 ADVICE) — silently skipping the span check let
    # a hand-assembled pass bypass the very window this fence enforces.
    if any(not d.get("generated_at") for d in passes):
        raise SystemExit(
            "refusing to merge passes without a generated_at stamp: the "
            "sitting window cannot be checked — re-run bench.py (it "
            "stamps every pass) instead of hand-assembling pass files"
        )
    stamps_in = sorted(d["generated_at"] for d in passes)
    import datetime as _dt

    fmt = "%Y-%m-%dT%H:%M:%SZ"
    span = (
        _dt.datetime.strptime(stamps_in[-1], fmt)
        - _dt.datetime.strptime(stamps_in[0], fmt)
    ).total_seconds()
    if span > 4 * 3600:
        raise SystemExit(
            f"refusing to merge passes {span / 3600:.1f}h apart: a "
            f"record is ONE sitting (<= 4h window) at one commit — "
            f"start a fresh record instead of folding into an old one"
        )

    pool: dict[str, list[float]] = {}
    for d in passes:
        for name, s in (d.get("samples") or {}).items():
            pool.setdefault(name, []).extend(s)
        # pre-spread pass files carry only the per-gate min
        for name, v in (d.get("queries") or {}).items():
            if name not in (d.get("samples") or {}) and isinstance(
                v, (int, float)
            ) and v > 0:
                pool.setdefault(name, []).append(v)

    merged = dict(passes[0])
    merged["queries"] = {n: min(s) for n, s in pool.items()}
    merged["samples"] = pool
    merged["spread"] = {n: _spread(s) for n, s in pool.items()}
    merged["n_passes_merged"] = len(passes)
    # epoch provenance: the shared HEAD plus the sitting's time window,
    # so a judge can see at a glance that the record is one epoch
    stamps = sorted(
        d["generated_at"] for d in passes if d.get("generated_at")
    )
    merged["epoch"] = {
        "head": passes[0].get("head"),
        "first_pass": stamps[0] if stamps else None,
        "last_pass": stamps[-1] if stamps else None,
    }
    merged["value"] = round(
        sum(v for v in merged["queries"].values() if v > 0), 3
    )
    merged["n_failed"] = max(d.get("n_failed", 0) for d in passes)
    if "scan_3col" in merged["queries"] and merged.get("scan_mb"):
        scan_s = merged["queries"]["scan_3col"]
        merged["scan_seconds"] = scan_s
        merged["scan_mb_per_s"] = round(merged["scan_mb"] / scan_s, 2)
        if merged.get("scan_rows"):
            merged["scan_rows_per_s"] = round(merged["scan_rows"] / scan_s)

    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prev = _prev_committed(here)
    prev_delta: dict[str, float] = {}
    if prev and str(prev.get("sf")) == str(merged.get("sf")):
        prev_spread = prev.get("spread") or {}
        for name, sp in merged["spread"].items():
            old = (prev_spread.get(name) or {}).get(
                "med", (prev.get("queries") or {}).get(name)
            )
            if isinstance(old, (int, float)) and old > 0:
                ratio = sp["med"] / old
                if ratio >= 1.3 or ratio <= 1 / 1.3:
                    prev_delta[name] = round(ratio, 2)
    merged["prev_delta"] = prev_delta

    # load-normalized twin (r13 verdict task 2) — same contract as
    # bench.py: each gate's merged median as a ratio to the merged
    # scan_3col median, and normalized movers vs the committed record.
    anchor = "scan_3col"
    a_med = (merged["spread"].get(anchor) or {}).get("med")
    queries_norm: dict[str, float] = {}
    if a_med and a_med > 0:
        queries_norm = {
            n: round(sp["med"] / a_med, 4)
            for n, sp in merged["spread"].items() if n != anchor
        }
    merged["queries_norm"] = queries_norm
    merged["norm_anchor"] = anchor
    prev_delta_norm: dict[str, float] = {}
    if prev and queries_norm and str(prev.get("sf")) == str(merged.get("sf")):
        prev_norm = dict(prev.get("queries_norm") or {})
        if not prev_norm:  # pre-norm record: derive from its spread
            ps = prev.get("spread") or {}
            pa = (ps.get(anchor) or {}).get(
                "med", (prev.get("queries") or {}).get(anchor)
            )
            if isinstance(pa, (int, float)) and pa > 0:
                prev_norm = {
                    n: sp["med"] / pa
                    for n, sp in ps.items()
                    if n != anchor and sp.get("med", 0) > 0
                }
        for n, cur_n in queries_norm.items():
            old_n = prev_norm.get(n)
            if isinstance(old_n, (int, float)) and old_n > 0 and cur_n > 0:
                ratio = cur_n / old_n
                if ratio >= 1.3 or ratio <= 1 / 1.3:
                    prev_delta_norm[n] = round(ratio, 2)
    merged["prev_delta_norm"] = prev_delta_norm

    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(
        json.dumps(
            {
                "merged": len(passes),
                "gates": len(pool),
                "value": merged["value"],
                "prev_delta": prev_delta,
                "prev_delta_norm": prev_delta_norm,
                "out": out_path,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
