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
