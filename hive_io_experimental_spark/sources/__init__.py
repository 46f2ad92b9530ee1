"""Data sources beyond the warehouse parquet tables.

The reference reads whatever storage format the Hive table declares (serde +
InputFormat chosen per partition, HiveApiInputFormat.java:226-255) and picks
the cheapest parser (Parsers.bestParser, input/parser/Parsers.java:102-153).
Spark's DataSource V2 equivalents are built in; this package wires the
engine's ScanSpec front-end onto each format and reproduces the reference's
null-decoding conventions for delimited text (\\N and empty -> NULL,
input/parser/array/BytesParser.java:75-77).
"""

from hive_io_experimental_spark.sources.formats import read_source

__all__ = ["read_source"]
