"""Named input/output profiles — many tables wired into one job.

The reference serializes each HiveInputDescription/HiveOutputDescription into
the Hadoop Configuration under a profile id so a single job can read/write
several tables (input/HiveApiInputFormat.java:145-172,
output/OutputConf.java:33-95, README.md:69-78 "profiles"). Spark needs no
Configuration transport — a profile here is a named ScanSpec/WriteSpec in a
registry, resolvable to DataFrames on demand; serialization to/from JSON is
provided so profiles can ride along in job configs or files.
"""

from __future__ import annotations

import json
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession

from hive_io_experimental_spark.catalog import Catalog
from hive_io_experimental_spark.errors import HiveIOError
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput, WriteSpec

DEFAULT_PROFILE = "default"


class Profiles:
    """Registry of named read/write descriptions (profile-id parity)."""

    def __init__(self, spark: SparkSession, catalog: Catalog | None = None) -> None:
        self.spark = spark
        self.catalog = catalog
        self._inputs: dict[str, ScanSpec] = {}
        self._outputs: dict[str, WriteSpec] = {}

    # -- registration (initProfile parity) -----------------------------------

    def add_input(self, spec: ScanSpec, profile: str = DEFAULT_PROFILE) -> "Profiles":
        self._inputs[profile] = spec
        return self

    def add_output(self, spec: WriteSpec, profile: str = DEFAULT_PROFILE) -> "Profiles":
        self._outputs[profile] = spec
        return self

    # -- resolution ----------------------------------------------------------

    def read(self, profile: str = DEFAULT_PROFILE) -> DataFrame:
        spec = self._inputs.get(profile)
        if spec is None:
            raise HiveIOError(f"no input profile {profile!r}")
        return HiveInput(self.spark, self.catalog).read_table(spec)

    def write(self, df: DataFrame, profile: str = DEFAULT_PROFILE) -> None:
        spec = self._outputs.get(profile)
        if spec is None:
            raise HiveIOError(f"no output profile {profile!r}")
        if self.catalog is None:
            raise HiveIOError("write profiles require a catalog")
        HiveOutput(self.spark, self.catalog).write_table(spec, df)

    def read_all(self) -> dict[str, DataFrame]:
        """Resolve every input profile — the reference's multi-table job."""
        return {p: self.read(p) for p in self._inputs}

    # -- serialization (Configuration-transport parity) ----------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "inputs": {p: asdict(s) for p, s in self._inputs.items()},
                "outputs": {p: asdict(s) for p, s in self._outputs.items()},
            },
            sort_keys=True,
        )

    @classmethod
    def from_json(
        cls, spark: SparkSession, payload: str, catalog: Catalog | None = None
    ) -> "Profiles":
        doc = json.loads(payload)
        prof = cls(spark, catalog)
        for p, s in doc.get("inputs", {}).items():
            s = dict(s)
            s["columns"] = tuple(s.get("columns", ()))
            prof.add_input(ScanSpec(**s), p)
        for p, s in doc.get("outputs", {}).items():
            prof.add_output(WriteSpec(**s), p)
        return prof
