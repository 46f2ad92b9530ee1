"""HiveType lattice with widening-only upgrade, mapped onto Spark SQL types.

Mirrors the reference's type system (common/HiveType.java:35-233): eight
primitives + LIST/MAP/STRUCT (UNION is declared but never exercised by the
reference and is unsupported here, exactly like DECIMAL/TIMESTAMP/DATE are
unsupported there — HiveType.java:308-330 throws on them).

The one behavioral rule worth engine code is the *widening-only* upgrade on
write (HiveType.checkAndUpgrade, HiveType.java:242-249; verified by
output/TypeUpgradeTest.java:59-331): a value of a narrower numeric type may be
written into a wider column; narrowing raises. Spark's ``Column.cast`` is more
permissive (it happily narrows), so writes go through :func:`check_and_upgrade`
/ :func:`widening_cast` guards.
"""

from __future__ import annotations

import enum

from pyspark.sql import types as T

from hive_io_experimental_spark.errors import TypeMismatchError


class HiveType(enum.Enum):
    """The reference's type enum (common/HiveType.java:35-233)."""

    BOOLEAN = "boolean"
    BYTE = "tinyint"
    SHORT = "smallint"
    INT = "int"
    LONG = "bigint"
    FLOAT = "float"
    DOUBLE = "double"
    STRING = "string"
    LIST = "array"
    MAP = "map"
    STRUCT = "struct"
    # UNION intentionally unsupported (never exercised by the reference).

    @property
    def is_numeric(self) -> bool:
        return self in _NUMERIC_ORDER

    @property
    def is_collection(self) -> bool:
        return self in (HiveType.LIST, HiveType.MAP, HiveType.STRUCT)


# Widening order for numerics: BYTE < SHORT < INT < LONG < FLOAT < DOUBLE.
# This is exactly the set accepted by each type's checkAndUpgrade
# (HiveType.java:53-153): SHORT accepts {BYTE, SHORT}, ... DOUBLE accepts all.
_NUMERIC_ORDER: dict[HiveType, int] = {
    HiveType.BYTE: 0,
    HiveType.SHORT: 1,
    HiveType.INT: 2,
    HiveType.LONG: 3,
    HiveType.FLOAT: 4,
    HiveType.DOUBLE: 5,
}

_TO_SPARK: dict[HiveType, T.DataType] = {
    HiveType.BOOLEAN: T.BooleanType(),
    HiveType.BYTE: T.ByteType(),
    HiveType.SHORT: T.ShortType(),
    HiveType.INT: T.IntegerType(),
    HiveType.LONG: T.LongType(),
    HiveType.FLOAT: T.FloatType(),
    HiveType.DOUBLE: T.DoubleType(),
    HiveType.STRING: T.StringType(),
}

_FROM_SPARK_CLASS: dict[type, HiveType] = {
    T.BooleanType: HiveType.BOOLEAN,
    T.ByteType: HiveType.BYTE,
    T.ShortType: HiveType.SHORT,
    T.IntegerType: HiveType.INT,
    T.LongType: HiveType.LONG,
    T.FloatType: HiveType.FLOAT,
    T.DoubleType: HiveType.DOUBLE,
    T.StringType: HiveType.STRING,
    T.ArrayType: HiveType.LIST,
    T.MapType: HiveType.MAP,
    T.StructType: HiveType.STRUCT,
}

# Python-value classes acceptable for each HiveType on write, pre-upgrade.
_PY_ACCEPT: dict[HiveType, tuple[type, ...]] = {
    HiveType.BOOLEAN: (bool,),
    HiveType.BYTE: (int,),
    HiveType.SHORT: (int,),
    HiveType.INT: (int,),
    HiveType.LONG: (int,),
    HiveType.FLOAT: (int, float),
    HiveType.DOUBLE: (int, float),
    HiveType.STRING: (str,),
    HiveType.LIST: (list, tuple),
    HiveType.MAP: (dict,),
    HiveType.STRUCT: (dict,),
}


def to_spark_type(hive_type: HiveType) -> T.DataType:
    """Primitive HiveType -> Spark DataType (collections need element types)."""
    try:
        return _TO_SPARK[hive_type]
    except KeyError:
        raise TypeMismatchError(
            f"{hive_type} has no bare Spark equivalent; supply a full DataType"
        ) from None


def from_spark_type(dt: T.DataType) -> HiveType:
    """Spark DataType -> HiveType; raises for types outside the lattice.

    Mirrors HiveType.fromHivePrimitiveCategory throwing on DECIMAL/TIMESTAMP/
    DATE/BINARY etc. (HiveType.java:308-330).
    """
    ht = _FROM_SPARK_CLASS.get(type(dt))
    if ht is None:
        raise TypeMismatchError(f"unsupported Spark type for HiveType lattice: {dt}")
    return ht


def check_and_upgrade(column_type: HiveType, value_type: HiveType) -> HiveType:
    """Return the type to use when writing ``value_type`` into ``column_type``.

    Widening-only (HiveType.java:242-249): if the value's type is at or below
    the column's type in the numeric order, the column type wins; anything
    else (narrowing, cross-kind) raises TypeMismatchError.
    """
    if column_type == value_type:
        return column_type
    if column_type.is_numeric and value_type.is_numeric:
        if _NUMERIC_ORDER[value_type] <= _NUMERIC_ORDER[column_type]:
            return column_type
        raise TypeMismatchError(
            f"cannot write {value_type.name} into {column_type.name} column "
            "(narrowing is not allowed)"
        )
    raise TypeMismatchError(
        f"cannot write {value_type.name} into {column_type.name} column"
    )


def check_python_value(column_type: HiveType, value: object) -> None:
    """Strict pre-write check of a Python value against a column type.

    None is always legal (SQL NULL; the reference round-trips nulls,
    TypeUpgradeTest.java 'NULL round-trip'). bool is NOT acceptable for
    numeric columns (Python bool is an int subclass; the reference treats
    Boolean as its own kind).
    """
    if value is None:
        return
    if isinstance(value, bool) and column_type != HiveType.BOOLEAN:
        raise TypeMismatchError(f"cannot write BOOLEAN into {column_type.name} column")
    accepted = _PY_ACCEPT[column_type]
    if not isinstance(value, accepted):
        raise TypeMismatchError(
            f"cannot write {type(value).__name__!r} value into {column_type.name} column"
        )
    if column_type in _NUMERIC_ORDER and column_type != HiveType.DOUBLE:
        if column_type in (HiveType.FLOAT,):
            return
        if isinstance(value, float):
            raise TypeMismatchError(
                f"cannot write DOUBLE into {column_type.name} column (narrowing)"
            )
        _check_int_range(column_type, value)


_INT_RANGES = {
    HiveType.BYTE: (-(2**7), 2**7 - 1),
    HiveType.SHORT: (-(2**15), 2**15 - 1),
    HiveType.INT: (-(2**31), 2**31 - 1),
    HiveType.LONG: (-(2**63), 2**63 - 1),
}


def _check_int_range(column_type: HiveType, value: int) -> None:
    lo, hi = _INT_RANGES[column_type]
    if not lo <= value <= hi:
        raise TypeMismatchError(
            f"integer value {value} out of range for {column_type.name}"
        )


def widening_cast_ok(source: T.DataType, target: T.DataType) -> bool:
    """True iff casting source->target is allowed under the widening lattice.

    Used by the write path to validate a DataFrame's schema against the target
    table schema before Spark's (permissive) cast is applied.
    """
    try:
        s, t = from_spark_type(source), from_spark_type(target)
    except TypeMismatchError:
        return False
    try:
        check_and_upgrade(t, s)
        return True
    except TypeMismatchError:
        return False
