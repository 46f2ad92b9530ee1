"""Type-widening matrix tests — mirrors output/TypeUpgradeTest.java:59-331:
every widening pair accepted, every narrowing pair raises, NULL round-trips.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from hive_io_experimental_spark.errors import TypeMismatchError
from hive_io_experimental_spark.types import (
    HiveType,
    check_and_upgrade,
    check_python_value,
    from_spark_type,
    to_spark_type,
    widening_cast_ok,
)

NUMERIC = [HiveType.BYTE, HiveType.SHORT, HiveType.INT, HiveType.LONG,
           HiveType.FLOAT, HiveType.DOUBLE]


class TestWideningLattice:
    def test_every_widening_pair_accepted(self):
        for i, col in enumerate(NUMERIC):
            for val in NUMERIC[: i + 1]:
                assert check_and_upgrade(col, val) == col

    def test_every_narrowing_pair_raises(self):
        # TypeUpgradeTest 'downgrade throws' (:59-162)
        for i, col in enumerate(NUMERIC):
            for val in NUMERIC[i + 1:]:
                with pytest.raises(TypeMismatchError):
                    check_and_upgrade(col, val)

    def test_same_type_identity(self):
        for t in HiveType:
            assert check_and_upgrade(t, t) == t

    def test_cross_kind_raises(self):
        for col, val in [
            (HiveType.STRING, HiveType.INT),
            (HiveType.INT, HiveType.STRING),
            (HiveType.BOOLEAN, HiveType.INT),
            (HiveType.LONG, HiveType.BOOLEAN),
            (HiveType.LIST, HiveType.MAP),
        ]:
            with pytest.raises(TypeMismatchError):
                check_and_upgrade(col, val)


class TestSparkMapping:
    def test_round_trip_primitives(self):
        for ht in [HiveType.BOOLEAN, HiveType.BYTE, HiveType.SHORT, HiveType.INT,
                   HiveType.LONG, HiveType.FLOAT, HiveType.DOUBLE, HiveType.STRING]:
            assert from_spark_type(to_spark_type(ht)) == ht

    def test_unsupported_spark_types_raise(self):
        # reference throws on DECIMAL/TIMESTAMP/DATE/BINARY (HiveType.java:308-330)
        for dt in [T.DecimalType(10, 2), T.TimestampType(), T.DateType(),
                   T.BinaryType()]:
            with pytest.raises(TypeMismatchError):
                from_spark_type(dt)

    def test_widening_cast_ok(self):
        assert widening_cast_ok(T.IntegerType(), T.LongType())
        assert not widening_cast_ok(T.LongType(), T.IntegerType())
        assert not widening_cast_ok(T.DoubleType(), T.FloatType())
        assert widening_cast_ok(T.FloatType(), T.DoubleType())


class TestPythonValueChecks:
    def test_null_always_ok(self):
        for t in HiveType:
            check_python_value(t, None)

    def test_bool_not_numeric(self):
        with pytest.raises(TypeMismatchError):
            check_python_value(HiveType.INT, True)

    def test_float_into_int_raises(self):
        with pytest.raises(TypeMismatchError):
            check_python_value(HiveType.LONG, 1.5)

    def test_int_range_enforced(self):
        check_python_value(HiveType.BYTE, 127)
        with pytest.raises(TypeMismatchError):
            check_python_value(HiveType.BYTE, 128)
        with pytest.raises(TypeMismatchError):
            check_python_value(HiveType.SHORT, 2**15)

    def test_int_into_float_ok(self):
        check_python_value(HiveType.FLOAT, 3)
        check_python_value(HiveType.DOUBLE, 3)


def test_zorder_key_matches_reference_interleave(spark):
    """Bit-exact Morton interleave vs a python reference, plus bounds."""
    import pytest
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.functions.layout import zorder_key

    def ref(vals, bits):
        n = len(vals)
        out = 0
        for i, v in enumerate(vals):
            v &= (1 << bits) - 1
            for j in range(bits):
                out |= ((v >> j) & 1) << (j * n + i)
        return out

    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
             (70000, 3)]  # 70000 overflows 16 bits -> masked
    df = spark.createDataFrame(cases, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key([F.col("a"), F.col("b")]).alias("z")
        ).collect()
    }
    for a, b in cases:
        assert got[(a, b)] == ref([a, b], 16), (a, b)

    # z-locality: interleave of small coords < interleave of large coords
    assert ref([1, 1], 16) < ref([200, 200], 16)

    with pytest.raises(ValueError):
        zorder_key([])
    with pytest.raises(ValueError):
        zorder_key([F.col("a")] * 4, bits=16)  # 64 bits > signed long
