"""M1/M2 parity: backoff retry (FaultyCheckOutputSpecsTest.java:41-92 shape)
and observer metrics (HiveApiInputObserver / MetricsObserver shape)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from hive_io_experimental_spark.observers import ScanMeter
from hive_io_experimental_spark.retry import RetryPolicy, backoff_retry


class Flaky:
    """Counts calls; fails the first ``n_failures`` with OSError."""

    def __init__(self, n_failures: int):
        self.n_failures = n_failures
        self.calls = 0

    def __call__(self):
        self.calls += 1
        if self.calls <= self.n_failures:
            raise OSError(f"injected failure {self.calls}")
        return "ok"


def test_retry_recovers_when_failures_below_max():
    sleeps: list[float] = []
    flaky = Flaky(3)
    out = backoff_retry(
        flaky,
        RetryPolicy(max_tries=5, initial_delay_s=10.0),
        sleep=sleeps.append,
        rng=random.Random(7),
    )
    assert out == "ok"
    assert flaky.calls == 4
    # exponential: ~10, ~20, ~40 (jittered within 10%)
    assert len(sleeps) == 3
    for got, base in zip(sleeps, [10.0, 20.0, 40.0]):
        assert base * 0.9 <= got <= base * 1.1


def test_retry_raises_after_max_tries():
    flaky = Flaky(99)
    with pytest.raises(OSError):
        backoff_retry(
            flaky, RetryPolicy(max_tries=5), sleep=lambda s: None
        )
    assert flaky.calls == 5


def test_retry_does_not_catch_logic_errors():
    def boom():
        raise ValueError("logic bug")

    with pytest.raises(ValueError):
        backoff_retry(boom, RetryPolicy(max_tries=5), sleep=lambda s: None)


def test_scan_meter_counts_rows_and_bytes(spark, sf_dir):
    meter = ScanMeter("t_meter")
    df = meter.attach(
        spark.read.parquet(f"{sf_dir}/region.parquet").select("r_name")
    )
    df.write.format("noop").mode("overwrite").save()
    stats = meter.stats()
    assert stats.n_rows == 5
    assert stats.approx_mb > 0
    assert stats.rows_per_s > 0
    line = stats.csv_line(threads=4)
    assert line.startswith("5,4,")


def test_write_meter_observes_write_table(spark, warehouse, sf_dir):
    """write_table/write_dynamic meter rows+bytes DURING the write job
    (RecordWriterImpl.java:88-131 observer parity): observed rows equal
    the rows written, bytes/throughput are positive, and the tailer CSV
    line renders."""
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec
    from hive_io_experimental_spark.schema import HiveTableSchema

    from pyspark.sql import types as T

    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    cat = Catalog(warehouse)
    cat.create_table(
        "default.obs_w",
        HiveTableSchema(
            tuple((f.name, f.dataType) for f in region.schema.fields)
        ),
    )
    out = HiveOutput(spark, cat)
    assert out.last_write_stats is None
    out.write_table(WriteSpec("default.obs_w"), region)
    stats = out.last_write_stats
    assert stats is not None
    assert stats.n_rows == region.count() == 5
    assert stats.approx_mb > 0 and stats.rows_per_s > 0
    assert stats.csv_line(threads=2).startswith("5,2,")

    # dynamic path: observed rows equal the full frame across partitions
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").withColumn(
        "rk", F.col("n_regionkey").cast("string")
    )
    cat.create_table(
        "default.obs_dyn",
        HiveTableSchema(
            tuple(
                (f.name, f.dataType)
                for f in nation.schema.fields
                if f.name != "rk"
            ),
            partition_keys=("rk",),
        ),
    )
    out.write_dynamic("default.obs_dyn", nation)
    assert out.last_write_stats.n_rows == 25


def test_write_meter_freezes_wall_clock_at_write_action(spark, sf_dir):
    """mark_done pins elapsed at the action boundary: post-write driver
    work (stats re-reads, catalog registration) is not billed to the
    write job — the 'observed DURING the write job' contract — and
    stats() is stable across later calls. mark_done is idempotent."""
    import time as _time

    from hive_io_experimental_spark.observers import WriteMeter

    meter = WriteMeter()
    df = meter.attach(spark.read.parquet(f"{sf_dir}/region.parquet"))
    df.write.format("noop").mode("overwrite").save()
    meter.mark_done()
    s1 = meter.stats().seconds
    _time.sleep(0.2)
    assert meter.stats().seconds == s1  # frozen at the mark, not now()
    meter.mark_done()                   # second call: first mark wins
    assert meter.stats().seconds == s1


def test_scan_meter_counts_failed_reads_during_scan(spark, tmp_path):
    """hiveReadRowFailed parity (HiveApiInputObserver.java:43-46), in
    aggregate: a PERMISSIVE csv scan wired through with_corrupt_capture
    routes unparseable lines into the capture column, and the SAME
    Observation that meters rows/bytes counts them — failed reads are
    metered during the scan, no second job, no per-row callback."""
    from pyspark.sql import types as T

    from hive_io_experimental_spark.observers import ScanMeter
    from hive_io_experimental_spark.sources.formats import (
        read_source,
        with_corrupt_capture,
    )

    src = tmp_path / "rows.tsv"
    src.write_text("1\t2\nx\ty\n3\t4\nnot-a-row\n")
    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.LongType()),
    ])
    cap_schema, cap_col = with_corrupt_capture(schema)
    df = read_source(spark, str(src), "csv", schema=cap_schema)
    meter = ScanMeter("failed_reads_meter")
    observed = meter.attach(df, corrupt_col=cap_col)
    good = observed.filter(F.col(cap_col).isNull()).drop(cap_col)
    rows = good.collect()
    meter.mark_done()
    stats = meter.stats()
    assert stats.n_read_failed == 2
    assert stats.n_rows == 4  # observer sits above the filter: all reads
    assert sorted((r.a, r.b) for r in rows) == [(1, 2), (3, 4)]
    # schema collisions fail loud, never silent double-capture
    with pytest.raises(ValueError, match="collides"):
        with_corrupt_capture(cap_schema)
    # the csv_line shape is pinned (Stats.java parity) — failed count
    # rides the dataclass, not the tailer line
    assert len(stats.csv_line(4).split(",")) == 6
