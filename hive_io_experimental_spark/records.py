"""Typed record shim + bean mapping over Spark Rows.

The reference exposes positional strict-typed accessors
(record/HiveReadableRecord.java:29-176: getLong(i), getDouble(i), ... with
wrong-type getters throwing — input/parser/Records.java:85-90, tested by
InputTest.java:175-189) and a record->POJO mapper (bean/RowToBean.java).

This layer is a compatibility shim for the record-level API; DataFrames remain
the real currency (vectorized, JVM-side). Use it at the edges — driver-side
iteration, tests — never in a hot distributed path.
"""

from __future__ import annotations

from dataclasses import fields as dataclass_fields, is_dataclass
from typing import Any, Iterable

from pyspark.sql import Row

from hive_io_experimental_spark.errors import TypeMismatchError
from hive_io_experimental_spark.schema import HiveTableSchema
from hive_io_experimental_spark.types import (
    HiveType,
    check_and_upgrade,
    check_python_value,
)

_GETTER_TYPES: dict[str, tuple[HiveType, ...]] = {
    "boolean": (HiveType.BOOLEAN,),
    "byte": (HiveType.BYTE,),
    "short": (HiveType.SHORT,),
    "int": (HiveType.INT,),
    "long": (HiveType.LONG,),
    "float": (HiveType.FLOAT,),
    "double": (HiveType.DOUBLE,),
    "string": (HiveType.STRING,),
    "list": (HiveType.LIST,),
    "map": (HiveType.MAP, HiveType.STRUCT),
}


class HiveReadableRecord:
    """Strict positional read access over a Row (HiveReadableRecord parity).

    Data columns first, then partition columns; partition values are strings
    (HiveReadableRecord.java:140-146). Wrong-type getters raise
    TypeMismatchError instead of coercing — unlike the reference's
    DefaultRecord null sentinels (DefaultRecord.java:100-146, a documented
    wart), NULL is returned as Python None for every type.
    """

    __slots__ = ("_row", "_schema")

    def __init__(self, row: Row, schema: HiveTableSchema) -> None:
        self._row = row
        self._schema = schema

    def _get_checked(self, index: int, kind: str) -> Any:
        declared = self._schema.hive_type_of(index)
        if declared not in _GETTER_TYPES[kind]:
            raise TypeMismatchError(
                f"column {index} is {declared.name}, not {kind.upper()}"
            )
        return self._row[index]

    def get(self, index: int) -> Any:
        return self._row[index]

    def get_boolean(self, index: int) -> bool | None:
        return self._get_checked(index, "boolean")

    def get_byte(self, index: int) -> int | None:
        return self._get_checked(index, "byte")

    def get_short(self, index: int) -> int | None:
        return self._get_checked(index, "short")

    def get_int(self, index: int) -> int | None:
        return self._get_checked(index, "int")

    def get_long(self, index: int) -> int | None:
        return self._get_checked(index, "long")

    def get_float(self, index: int) -> float | None:
        return self._get_checked(index, "float")

    def get_double(self, index: int) -> float | None:
        return self._get_checked(index, "double")

    def get_string(self, index: int) -> str | None:
        return self._get_checked(index, "string")

    def get_list(self, index: int) -> list | None:
        return self._get_checked(index, "list")

    def get_map(self, index: int) -> dict | None:
        return self._get_checked(index, "map")

    def is_null(self, index: int) -> bool:
        # HiveReadableRecord.isNull (record/HiveReadableRecord.java:175).
        return self._row[index] is None

    @property
    def num_columns(self) -> int:
        return self._schema.num_columns


class HiveWritableRecord:
    """Strict positional write access (HiveWritableRecord parity,
    record/HiveWritableRecord.java:29-138): setters type-check with the
    widening-only rule before accepting a value."""

    __slots__ = ("_values", "_schema")

    def __init__(self, schema: HiveTableSchema) -> None:
        self._schema = schema
        self._values: list[Any] = [None] * schema.num_data_columns

    def set(self, index: int, value: Any, value_type: HiveType | None = None) -> None:
        declared = self._schema.hive_type_of(index)
        if value_type is not None:
            check_and_upgrade(declared, value_type)
        check_python_value(declared, value)
        self._values[index] = value

    def set_boolean(self, index: int, value: bool | None) -> None:
        self.set(index, value, HiveType.BOOLEAN if value is not None else None)

    def set_byte(self, index: int, value: int | None) -> None:
        self.set(index, value, HiveType.BYTE if value is not None else None)

    def set_short(self, index: int, value: int | None) -> None:
        self.set(index, value, HiveType.SHORT if value is not None else None)

    def set_int(self, index: int, value: int | None) -> None:
        self.set(index, value, HiveType.INT if value is not None else None)

    def set_long(self, index: int, value: int | None) -> None:
        self.set(index, value, HiveType.LONG if value is not None else None)

    def set_float(self, index: int, value: float | None) -> None:
        self.set(index, value, HiveType.FLOAT if value is not None else None)

    def set_double(self, index: int, value: float | None) -> None:
        self.set(index, value, HiveType.DOUBLE if value is not None else None)

    def set_string(self, index: int, value: str | None) -> None:
        self.set(index, value, HiveType.STRING if value is not None else None)

    def to_row(self) -> tuple:
        return tuple(self._values)


def row_to_bean(row: Row, bean_class: type) -> Any:
    """Copy row fields into a user object by matching field name -> column.

    RowToBean parity (bean/UnsafeRowToBean.java:46-72): the reference matches
    Java field names to schema positions; here we match dataclass fields (or
    __init__ kwargs) to Row column names.
    """
    data = row.asDict()
    if is_dataclass(bean_class):
        names = [f.name for f in dataclass_fields(bean_class)]
        missing = [n for n in names if n not in data]
        if missing:
            raise TypeMismatchError(
                f"bean fields {missing} not present in record columns "
                f"{sorted(data)}"
            )
        return bean_class(**{n: data[n] for n in names})
    return bean_class(**data)


def rows_to_beans(rows: Iterable[Row], bean_class: type) -> Iterable[Any]:
    for row in rows:
        yield row_to_bean(row, bean_class)
