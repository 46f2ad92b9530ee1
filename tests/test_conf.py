"""M3 parity: typed option registry (conf/*.java, AllOptions dump)."""

from __future__ import annotations

from hive_io_experimental_spark import conf
from hive_io_experimental_spark.cli import main as cli_main


def test_option_defaults_and_override(spark):
    assert conf.DROP_PARTITION.get(spark) is False
    assert conf.RETRY_MAX_TRIES.get(spark) == 5
    try:
        conf.DROP_PARTITION.set(spark, True)
        conf.RETRY_MAX_TRIES.set(spark, 9)
        assert conf.DROP_PARTITION.get(spark) is True
        assert conf.RETRY_MAX_TRIES.get(spark) == 9
    finally:
        spark.conf.unset(conf.DROP_PARTITION.key)
        spark.conf.unset(conf.RETRY_MAX_TRIES.key)


def test_registry_dump_contains_every_option(spark):
    dump = conf.all_options_string(spark)
    for key in conf.all_options():
        assert key in dump
    assert "default:" in dump and "effective:" in dump


def test_cli_conf_options(capsys):
    assert cli_main(["conf-options"], stop_session=False) == 0
    out = capsys.readouterr().out
    assert "hiveio.output.drop_partition" in out
    assert "hiveio.retry.max_tries" in out


def test_shingle_freq_conf_drives_df_cut(spark):
    """hiveio.dedup.max_shingle_freq: unset -> default cut; 0 -> exact
    (unbounded) semantics; explicit argument always wins."""
    from hive_io_experimental_spark.operators import dedup

    n = 30
    rows = [
        (i, "shared boilerplate words appearing in every single document "
            + f"u{i} v{i} w{i}")
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        conf.SHINGLE_MAX_FREQ.set(spark, 5)  # boilerplate df=30 > 5 -> cut
        assert dedup.ngram_jaccard_pairs(df, threshold=0.0).count() == 0
        conf.SHINGLE_MAX_FREQ.set(spark, 0)  # 0 -> exact: quadratic pairs
        assert (
            dedup.ngram_jaccard_pairs(df, threshold=0.0).count()
            == n * (n - 1) // 2
        )
        # explicit argument overrides the conf
        assert (
            dedup.ngram_jaccard_pairs(
                df, threshold=0.0, max_shingle_freq=5
            ).count()
            == 0
        )
    finally:
        spark.conf.unset(conf.SHINGLE_MAX_FREQ.key)


def test_hist_bucket_conf_drives_bucket_width(spark):
    import datetime as dt

    from hive_io_experimental_spark.operators import incremental as inc

    df = spark.createDataFrame(
        [(1, "t", dt.datetime(2024, 1, 1), 3.7)],
        "event_id long, event_type string, ts timestamp, value double",
    )
    assert inc.hourly_histogram_state(df).collect()[0].bucket == 3
    try:
        conf.HIST_BUCKET_E4.set(spark, 5_000)  # 0.5-unit buckets
        assert inc.hourly_histogram_state(df).collect()[0].bucket == 7
    finally:
        spark.conf.unset(conf.HIST_BUCKET_E4.key)


def test_reuse_rejects_unknown_strategy(spark):
    """A typo in hiveio.reuse.strategy must fail loud, not silently hand
    the user lineage-truncating checkpoint semantics when they thought
    they opted into fault-tolerant 'recompute'."""
    import pytest

    from hive_io_experimental_spark.functions.reuse import reuse

    df = spark.range(3)
    try:
        conf.REUSE_STRATEGY.set(spark, "recmpute")
        with pytest.raises(ValueError, match="reuse.strategy"):
            reuse(df)
        conf.REUSE_STRATEGY.set(spark, "recompute")
        assert reuse(df) is df  # pure lineage: frame passes through
    finally:
        spark.conf.unset(conf.REUSE_STRATEGY.key)
