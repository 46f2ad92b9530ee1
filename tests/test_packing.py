"""Invariants for the training-export operators (operators/packing.py).

pack_sequences' engine parity is oracle-gated; here we pin the packing
INVARIANTS that the aggregate gate can't see, especially for the greedy
(no-split) variant whose sequential semantics have no SQL twin:
  * no bin overflows (except designated oversize singletons),
  * every document is packed exactly once,
  * bins are contiguous from 0 within each shard,
  * the assignment is independent of input partitioning (determinism),
  * split packing wastes nothing (every non-final window is exactly full).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_io_experimental_spark.operators import packing

WINDOW = 64


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ("word " * ((i * 7) % 40 + 1)).strip(), f"src{i % 4}")
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_split_packing_fills_every_nonfinal_window(spark, docs):
    packed = packing.pack_sequences(docs, window=WINDOW, n_shards=4).collect()
    assert len(packed) == 200
    per_shard_tokens: dict[int, int] = {}
    for r in packed:
        per_shard_tokens[r.shard] = per_shard_tokens.get(r.shard, 0) + r.tokens
        assert r.n_windows == r.last_window - r.first_window + 1
    # with splitting, windows used = ceil(total/window) — zero waste
    by_shard_last = {}
    for r in packed:
        by_shard_last[r.shard] = max(by_shard_last.get(r.shard, 0), r.last_window)
    for shard, total in per_shard_tokens.items():
        assert by_shard_last[shard] == (total - 1) // WINDOW


def test_greedy_packing_never_overflows_and_covers_all(spark, docs):
    out = packing.pack_sequences_greedy(docs, window=WINDOW, n_shards=4)
    rows = out.collect()
    assert len(rows) == 200
    assert len({r.doc_id for r in rows}) == 200
    fills: dict[tuple[int, int], int] = {}
    oversize: set[tuple[int, int]] = set()
    for r in rows:
        key = (r.shard, r.bin_id)
        fills[key] = fills.get(key, 0) + r.tokens
        if r.truncated:
            oversize.add(key)
    for key, fill in fills.items():
        if key in oversize:
            continue
        assert fill <= WINDOW, f"bin {key} overflows: {fill}"
    # oversize bins hold exactly one document
    counts: dict[tuple[int, int], int] = {}
    for r in rows:
        counts[(r.shard, r.bin_id)] = counts.get((r.shard, r.bin_id), 0) + 1
    for key in oversize:
        assert counts[key] == 1
    # bins contiguous from 0 per shard
    by_shard: dict[int, set[int]] = {}
    for r in rows:
        by_shard.setdefault(r.shard, set()).add(r.bin_id)
    for shard, bins in by_shard.items():
        assert bins == set(range(len(bins)))


def test_greedy_packing_is_partitioning_independent(spark, docs):
    a = packing.pack_sequences_greedy(docs, window=WINDOW, n_shards=4)
    b = packing.pack_sequences_greedy(
        docs.repartition(13), window=WINDOW, n_shards=4
    )
    ra = sorted((r.doc_id, r.shard, r.bin_id) for r in a.collect())
    rb = sorted((r.doc_id, r.shard, r.bin_id) for r in b.collect())
    assert ra == rb


def test_oversize_doc_is_flagged_not_split(spark):
    docs = spark.createDataFrame(
        [(1, "word " * 200, "s"), (2, "tiny text", "s")],
        "doc_id long, text string, source string",
    )
    rows = packing.pack_sequences_greedy(docs, window=WINDOW, n_shards=1).collect()
    flags = {r.doc_id: r.truncated for r in rows}
    assert flags[1] is True and flags[2] is False


def test_token_budget_mix_respects_budgets(spark, docs):
    budgets = {"src0": 120, "src1": 60}
    mixed = packing.token_budget_mix(docs, budgets=budgets)
    agg = {
        r.source: r.total
        for r in mixed.groupBy("source")
        .agg(F.sum("tokens").alias("total"))
        .collect()
    }
    assert set(agg) <= set(budgets)
    for src, total in agg.items():
        assert total <= budgets[src]
    # rerun identical (hash-gated, no RNG)
    again = {
        (r.doc_id, r.source) for r in packing.token_budget_mix(
            docs, budgets=budgets
        ).collect()
    }
    assert again == {(r.doc_id, r.source) for r in mixed.collect()}


def test_token_entropy_known_values(spark):
    from hive_io_experimental_spark.operators import text as textops

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform over 4 -> H = 2.0, norm = 1.0
            (2, "a a a a"),          # single token -> H = 0, norm NULL
            (3, "a a b b"),          # uniform over 2 -> H = 1.0, norm = 1.0
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textops.token_entropy(docs).collect()}
    assert rows[1].token_entropy == 2.0 and rows[1].norm_entropy == 1.0
    assert rows[2].token_entropy == 0.0 and rows[2].norm_entropy is None
    assert rows[3].token_entropy == 1.0 and rows[3].n_tokens == 4
    assert rows[3].n_uniq == 2


def test_exact_dup_representatives_picks_lowest_id(spark):
    docs = spark.createDataFrame(
        [(5, "same", "s"), (2, "same", "s"), (9, "other", "s")],
        "doc_id long, text string, source string",
    )
    rows = {
        r.doc_id: r.n_copies
        for r in packing.exact_dup_representatives(docs).collect()
    }
    assert rows == {2: 2, 9: 1}


def test_export_sorted_shards_total_order(spark, tmp_path):
    """Cross-file ordering: max(sort key) of part-i <= min of part-(i+1)."""
    import pathlib

    import pyarrow.parquet as pq

    from hive_io_experimental_spark.operators.packing import (
        export_sorted_shards,
    )

    out = str(tmp_path / "shards")
    df = spark.range(10_000).selectExpr(
        "xxhash64(id) % 1000 AS score", "id"
    )
    export_sorted_shards(df, ("score", "id"), n_shards=8, out_dir=out)

    files = sorted(
        p for p in pathlib.Path(out).glob("part-*.parquet")
    )
    assert len(files) == 8
    prev_max = None
    total = 0
    for f in files:
        t = pq.read_table(str(f)).to_pydict()
        scores = t["score"]
        total += len(scores)
        assert scores == sorted(scores)  # within-file sorted
        if prev_max is not None and scores:
            assert scores[0] >= prev_max  # cross-file range order
        if scores:
            prev_max = scores[-1]
    assert total == 10_000

    import pytest

    with pytest.raises(ValueError, match="n_shards"):
        export_sorted_shards(df, ("score",), 0, out + "_bad")
