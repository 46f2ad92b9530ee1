"""Table schema model: data columns first, then partition columns.

Mirrors HiveTableSchema (schema/HiveTableSchema.java:29-69,
schema/HiveTableSchemaImpl.java:46-131): fixed schema with name->index maps
for data columns and partition keys; partition values are always strings
(record/HiveReadableRecord.java:140-146). The Spark-native currency is a
StructType; this wrapper adds the reference's positional semantics so the
record shim and write-policy layer can enforce them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from hive_io_experimental_spark.errors import HiveIOError
from hive_io_experimental_spark.types import HiveType, from_spark_type


@dataclass(frozen=True)
class HiveTableSchema:
    """Schema = ordered data columns + ordered partition keys (all STRING)."""

    data_fields: tuple[tuple[str, T.DataType], ...]
    partition_keys: tuple[str, ...] = ()
    _index: dict[str, int] = field(default_factory=dict, repr=False, compare=False)

    def __post_init__(self) -> None:
        names = [n for n, _ in self.data_fields] + list(self.partition_keys)
        if len(set(names)) != len(names):
            raise HiveIOError(f"duplicate column names in schema: {names}")
        object.__setattr__(
            self, "_index", {name: i for i, name in enumerate(names)}
        )

    # -- positional API (HiveTableSchema.positionOf / numColumns parity) -----

    def position_of(self, name: str) -> int:
        """Name -> position; data columns first, then partition columns.

        Reference: HiveTableSchemaImpl name->index maps
        (schema/HiveTableSchemaImpl.java:46-98).
        """
        try:
            return self._index[name]
        except KeyError:
            raise HiveIOError(f"no such column: {name!r}") from None

    @property
    def num_data_columns(self) -> int:
        return len(self.data_fields)

    @property
    def num_columns(self) -> int:
        return len(self.data_fields) + len(self.partition_keys)

    @property
    def column_names(self) -> list[str]:
        return [n for n, _ in self.data_fields] + list(self.partition_keys)

    def hive_type_of(self, position: int) -> HiveType:
        """HiveType at a position; partition columns are STRING by invariant."""
        if position >= self.num_data_columns:
            return HiveType.STRING
        return from_spark_type(self.data_fields[position][1])

    def spark_type_of(self, position: int) -> T.DataType:
        if position >= self.num_data_columns:
            return T.StringType()
        return self.data_fields[position][1]

    # -- conversions ---------------------------------------------------------

    def to_struct_type(self, include_partition_keys: bool = True) -> T.StructType:
        fields = [T.StructField(n, dt, True) for n, dt in self.data_fields]
        if include_partition_keys:
            fields += [
                T.StructField(k, T.StringType(), True) for k in self.partition_keys
            ]
        return T.StructType(fields)

    @classmethod
    def from_struct_type(
        cls, struct: T.StructType, partition_keys: tuple[str, ...] = ()
    ) -> "HiveTableSchema":
        data = tuple(
            (f.name, f.dataType) for f in struct.fields if f.name not in partition_keys
        )
        return cls(data_fields=data, partition_keys=partition_keys)

    def to_json(self) -> dict:
        return {
            "data_fields": [
                {"name": n, "type": dt.json()} for n, dt in self.data_fields
            ],
            "partition_keys": list(self.partition_keys),
        }

    @classmethod
    def from_json(cls, obj: dict) -> "HiveTableSchema":
        data = tuple(
            (f["name"], T._parse_datatype_json_string(f["type"]))
            for f in obj["data_fields"]
        )
        return cls(data_fields=data, partition_keys=tuple(obj["partition_keys"]))
