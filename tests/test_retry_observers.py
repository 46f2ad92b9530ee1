"""M1/M2 parity: backoff retry (FaultyCheckOutputSpecsTest.java:41-92 shape)
and observer metrics (HiveApiInputObserver / MetricsObserver shape)."""

from __future__ import annotations

import random

import pytest

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
