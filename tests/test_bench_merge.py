"""tools/bench_merge.py fences and normalized-record fields.

No Spark: the merger is pure JSON plumbing, driven here via subprocess
exactly as the round workflow drives it. sf is set to a value no
committed record uses so prev-delta comparisons are inert and the
asserts stay stable across rounds.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MERGE = os.path.join(REPO, "tools", "bench_merge.py")


def _pass(head="abc123", at="2026-01-01T10:00:00Z", scale=1.0):
    return {
        "sf": "9.9",
        "head": head,
        "generated_at": at,
        "queries": {"scan_3col": 0.2 * scale, "g1": 1.0 * scale},
        "samples": {
            "scan_3col": [0.2 * scale, 0.22 * scale, 0.21 * scale],
            "g1": [1.0 * scale, 1.1 * scale, 1.05 * scale],
        },
        "scan_mb": 100.0,
        "scan_rows": 1000,
    }


def _run(passes, tmp_path):
    files = []
    for i, doc in enumerate(passes):
        p = tmp_path / f"pass{i}.json"
        p.write_text(json.dumps(doc))
        files.append(str(p))
    out = tmp_path / "merged.json"
    res = subprocess.run(
        [sys.executable, MERGE, *files, "--out", str(out)],
        capture_output=True, text=True, cwd=REPO, timeout=120,
    )
    return res, out


def test_merge_emits_normalized_fields(tmp_path):
    res, out = _run(
        [_pass(), _pass(at="2026-01-01T10:30:00Z", scale=1.02)], tmp_path
    )
    assert res.returncode == 0, res.stderr
    doc = json.loads(out.read_text())
    assert doc["n_passes_merged"] == 2
    assert doc["norm_anchor"] == "scan_3col"
    # the anchor itself is excluded; other gates carry med/anchor_med
    assert "scan_3col" not in doc["queries_norm"]
    assert doc["queries_norm"]["g1"] > 0
    assert "prev_delta_norm" in doc  # inert here (sf matches no record)


def test_merge_refuses_missing_generated_at(tmp_path):
    p = _pass()
    del p["generated_at"]
    res, _ = _run([_pass(), p], tmp_path)
    assert res.returncode != 0
    assert "generated_at" in res.stderr


def test_merge_refuses_dirty_and_cross_epoch_and_sittings(tmp_path):
    res, _ = _run([_pass(head="abc123+dirty")], tmp_path)
    assert res.returncode != 0 and "dirty" in res.stderr
    res, _ = _run([_pass(), _pass(head="other")], tmp_path)
    assert res.returncode != 0 and "epoch" in res.stderr
    res, _ = _run(
        [_pass(), _pass(at="2026-01-01T19:00:00Z")], tmp_path
    )
    assert res.returncode != 0 and "sitting" in res.stderr
