"""Write API with the reference's strict preconditions on top of df.write.

Reference write surface (output/HiveOutput.java:50-86,
output/HiveApiOutputFormat.java): write an iterable of records (here: a
DataFrame) into a table/partition with spec checks and a commit protocol.
Spark's FileFormatWriter already provides task/job commit, _SUCCESS markers
and dynamic partitions; what Spark does NOT provide — and the reference does —
is the strict policy layer:

  * table must exist                      (CheckOutputSpecsTest.java:48-67)
  * partitioned table => partition spec required, arity-checked
                                          (HiveApiOutputFormat.java:307-318)
  * target partition must not exist, unless drop_partition=true
                                          (HiveApiOutputFormat.java:305-323,
                                           OutputConf.java:58-59)
  * unpartitioned table must be empty     (HiveApiOutputFormat.java:332-342)
  * widening-only type upgrade of incoming columns
                                          (HiveType.java:242-249)

On success the partition is registered in the catalog with stats — the
reference's job-commit add_partition (HiveApiOutputCommitter.java:125-166).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from hive_io_experimental_spark.catalog import Catalog, HiveStats, TableDesc
from hive_io_experimental_spark.errors import (
    PartitionExistsError,
    PartitionSpecError,
    SnapshotError,
    TableNotEmptyError,
    TypeMismatchError,
)
from hive_io_experimental_spark.schema import HiveTableSchema
from hive_io_experimental_spark.types import from_spark_type, check_and_upgrade


# Characters Spark/Hive percent-escape in partition directory names. The
# catalog's partition_path does NOT escape, so values needing escaping
# would register a path different from the directory Spark writes —
# reject them at the policy layer instead (partition values are plain
# strings in the reference data model; escaping is intentionally out of
# scope and documented here).
_UNSAFE_PARTITION_CHARS = set('/\\:=%#?*"<>|\x00\n\r\t')


def _check_partition_values(spec_values: dict[str, str]) -> None:
    for k, v in spec_values.items():
        if v is None:
            raise PartitionSpecError(
                f"partition key {k} has NULL values — null partitions are "
                f"not supported (Hive __HIVE_DEFAULT_PARTITION__ escaping "
                f"is out of scope)"
            )
        bad = set(v) & _UNSAFE_PARTITION_CHARS
        if bad:
            raise PartitionSpecError(
                f"partition value {v!r} for key {k} contains characters "
                f"{sorted(bad)} that Spark would escape in the directory "
                f"name; escaped partition paths are not supported"
            )


@dataclass(frozen=True)
class WriteSpec:
    """HiveOutputDescription parity (output/HiveOutputDescription.java:40-46).

    partition_values: static partition spec {key: string-value}.
    drop_partition: overwrite an existing partition (OutputConf.java:58-59).
    """

    table: str
    partition_values: dict[str, str] = field(default_factory=dict)
    drop_partition: bool = False
    # data-quality contract gating the write (engine extension; see
    # operators/expectations.py rule forms): any rule with violations
    # aborts BEFORE bytes land, raising ExpectationsFailedError with the
    # per-rule report. Costs one extra aggregate pass over the input.
    expectations: tuple[dict, ...] = ()


class HiveOutput:
    """Write-side entry point (HiveOutput parity)."""

    def __init__(self, spark: SparkSession, catalog: Catalog) -> None:
        self.spark = spark
        self.catalog = catalog
        # rows/bytes/wall-clock of the MOST RECENT write_table/write_dynamic,
        # observed during the write job itself (observers.WriteMeter —
        # RecordWriterImpl.java:88-131 observer parity). None until the
        # first write completes; failed writes leave the previous value.
        self.last_write_stats = None

    def _metered(self, df: DataFrame):
        """Attach a write meter; returns (observed_df, meter)."""
        from hive_io_experimental_spark.observers import WriteMeter

        meter = WriteMeter()
        return meter.attach(df), meter

    def _observed_rows(self, meter) -> int | None:
        """The committed row count, read from the write job's own
        Observation instead of a readback-count job over the files just
        written (guide §1.2: don't recompute what the write job already
        counted — the readback was one extra Spark job per versioned
        write/append, and at scale re-lists and re-opens every footer).
        Returns None — caller falls back to the readback count — when
        speculative execution is on: a duplicated successful attempt
        could double-count observed metrics, and table stats must stay
        exact."""
        spec = self.spark.conf.get("spark.speculation", "false")
        if (spec or "").strip().lower() == "true":
            return None
        return int(meter.stats().n_rows)

    def write_table(self, spec: WriteSpec, df: DataFrame) -> None:
        """Spec-check + widen + write + register: the full W1-W6 pipeline."""
        desc = TableDesc.parse(spec.table)
        schema = self.catalog.get_schema(desc)  # raises TableNotFoundError
        self._check_partition_spec(schema, spec)
        if schema.partition_keys:
            # validate EVERY partitioned write path (the versioned branch
            # re-checks; this closes the unversioned static path) and pin
            # the directory segment order to the SCHEMA's key order — the
            # caller's dict insertion order must never decide the layout
            _check_partition_values(spec.partition_values)
            spec = replace(
                spec,
                partition_values={
                    k: spec.partition_values[k]
                    for k in schema.partition_keys
                },
            )
        if spec.expectations:
            self._check_expectations(df, spec)
        df = self._apply_layout(self._conform(df, schema), desc)
        df, meter = self._metered(df)

        if self.catalog.is_versioned(desc):
            self._write_versioned(desc, schema, spec, df, meter=meter)
            self.last_write_stats = meter.stats()
            return

        from hive_io_experimental_spark.sources.formats import writer_options

        location = self.catalog.table_location(desc)
        fmt = self.catalog.table_format(desc)
        opts = writer_options(fmt)
        if schema.partition_keys:
            part_path = Catalog.partition_path(location, spec.partition_values)
            exists = self.catalog.partition_exists(desc, spec.partition_values)
            if exists and not spec.drop_partition:
                raise PartitionExistsError(
                    f"partition {spec.partition_values} already exists in "
                    f"{desc} (set drop_partition=True to overwrite)"
                )
            # Spark's file commit protocol handles atomicity of the directory
            # write; mode=overwrite implements drop_partition. The table's
            # declared storage format is honored (serde parity,
            # output/OutputInfo.java:51-111).
            df.write.mode("overwrite" if exists else "errorifexists").options(
                **opts
            ).format(fmt).save(part_path)
            meter.mark_done()
            stats = self._stats_for(
                part_path, fmt, schema, num_rows=self._observed_rows(meter)
            )
            if exists:
                self.catalog.drop_partition(desc, spec.partition_values)
            self.catalog.add_partition(desc, spec.partition_values, stats)
        else:
            self._check_table_is_empty(location)
            df.write.mode("append").options(**opts).format(fmt).save(location)
            meter.mark_done()
        self.last_write_stats = meter.stats()

    def write_dynamic(
        self, table: str, df: DataFrame, drop_partitions: bool = False
    ) -> list[dict[str, str]]:
        """Dynamic-partition write: ONE Spark job writes every partition the
        data contains, then job-commit registers them all — the reference's
        committer loop (HiveApiOutputCommitter.registerPartitions,
        output/HiveApiOutputCommitter.java:125-166), where the static-spec
        ``write_table`` mirrors the single add_partition path.

        ``df`` must carry the partition key columns. The partition-exists
        policy still applies to every partition the data touches: with
        ``drop_partitions=False`` any collision raises BEFORE anything is
        written (all-or-nothing spec check, like checkOutputSpecs). At
        scale this is the right seeding path — a thousand partitions cost
        one job, not a thousand sequential ones. Returns the registered
        partition specs.
        """
        desc = TableDesc.parse(table)
        schema = self.catalog.get_schema(desc)
        keys = list(schema.partition_keys)
        if not keys:
            raise PartitionSpecError(
                f"{desc} is unpartitioned; use write_table"
            )
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise PartitionSpecError(
                f"dynamic write needs partition columns {missing} in the data"
            )
        # conform first: a malformed frame must fail before any Spark job
        body = self._apply_layout(
            self._conform(df, schema, extra_cols=keys),
            desc,
            prefix_keys=keys,
        )
        # distinct partition VALUES + per-partition row counts in ONE
        # aggregation job: driver-sized metadata, never rows. Values come
        # from the already-string-cast body columns, so the registered
        # spec and Spark's directory name agree by construction; counting
        # here (map-side combined) is what keeps job-commit O(1) Spark
        # jobs instead of one count job per registered partition.
        spec_rows = body.groupBy(*keys).count().collect()
        specs = [{k: r[k] for k in keys} for r in spec_rows]
        row_counts = {
            tuple(sorted({k: r[k] for k in keys}.items())): r["count"]
            for r in spec_rows
        }
        for s in specs:
            _check_partition_values(s)
        # meter attached AFTER the spec aggregation so the observation is
        # bound to the write job alone (an Observation fires on the first
        # action over its frame)
        body, meter = self._metered(body)
        if self.catalog.is_versioned(desc):
            out = self._write_dynamic_versioned(
                desc, schema, body, specs, drop_partitions, row_counts,
                on_written=meter.mark_done,
            )
            self.last_write_stats = meter.stats()
            return out
        colliding = [
            s for s in specs if self.catalog.partition_exists(desc, s)
        ]
        if colliding and not drop_partitions:
            raise PartitionExistsError(
                f"partitions already exist in {desc}: {colliding} "
                f"(set drop_partitions=True to overwrite)"
            )
        colliding_set = {tuple(sorted(s.items())) for s in colliding}

        from hive_io_experimental_spark.sources.formats import writer_options

        location = self.catalog.table_location(desc)
        fmt = self.catalog.table_format(desc)
        writer = (
            body.write.mode("overwrite")
            .options(**writer_options(fmt))
            .partitionBy(*keys)
            .option("partitionOverwriteMode", "dynamic")
        )
        writer.format(fmt).save(location)
        meter.mark_done()
        for s in specs:
            part_path = Catalog.partition_path(location, s)
            stats = self._stats_for(
                part_path, fmt, schema,
                num_rows=row_counts[tuple(sorted(s.items()))],
            )
            # collisions were computed before the write — no re-query
            if tuple(sorted(s.items())) in colliding_set:
                self.catalog.drop_partition(desc, s)
            self.catalog.add_partition(desc, s, stats)
        self.last_write_stats = meter.stats()
        return specs

    def _apply_layout(
        self, df: DataFrame, desc: TableDesc,
        prefix_keys: tuple[str, ...] | list[str] = (),
    ) -> DataFrame:
        """Clustered layout: sort by the table's declared sort_cols WITHIN
        each task (no shuffle added) so parquet/ORC row-group min/max stats
        become selective for predicates on those columns.

        Dynamic partitioned writes must pass the partition keys as
        ``prefix_keys``: FileFormatWriter requires task rows ordered by the
        dynamic partition columns and will inject its own (non-stable) sort
        if they aren't — sorting by (keys..., sort_cols...) satisfies that
        requirement up front, so no second sort runs and the per-directory
        writers see rows already ordered by sort_cols."""
        sort_cols = self.catalog.table_sort_cols(desc)
        if sort_cols:
            df = df.sortWithinPartitions(*prefix_keys, *sort_cols)
        return df

    # -- versioned (snapshot / time travel) writes ---------------------------
    #
    # Layout: every write lands in an immutable snapshot directory —
    #   partitioned:    <location>/<k=v .../>snap-NNNNN/
    #   unpartitioned:  <location>/snap-NNNNN/
    # so older versions' files are never touched by later writes. The
    # manifest committed to the catalog lists the FULL partition set of the
    # new version (unchanged partitions keep their prior snap dirs).
    # Optimistic concurrency: the version number is reserved via
    # next_version() before writing; commit_snapshot rejects a stale number,
    # leaving the loser's files as unreferenced orphans (never readable,
    # reclaimed by expire_snapshots(clean_orphans=True)). Every write
    # ATTEMPT gets its own unique directory (snap-NNNNN-<token>), so a slow
    # writer that computed version N before a peer committed N can never
    # touch — let alone delete — the committed snapshot's data: the two
    # attempts live in different directories and only commit_snapshot's
    # compare-and-swap decides whose becomes version N. (Iceberg's model:
    # unique file sets, metadata CAS, orphan-file cleanup as maintenance.)

    @staticmethod
    def _snap_name(version: int) -> str:
        """Unique per-ATTEMPT snapshot dir name. The version prefix keeps
        directories sortable/debuggable; the random suffix is what makes
        concurrent attempts at the same version collision-free."""
        import uuid

        return f"snap-{version:05d}-{uuid.uuid4().hex[:8]}"

    @staticmethod
    def _manifest_dicts(parts) -> list[dict]:
        return [
            {"values": p.values, "location": p.location, "stats": vars(p.stats)}
            for p in parts
        ]

    def _write_versioned(
        self, desc: TableDesc, schema: HiveTableSchema, spec: WriteSpec,
        df: DataFrame, meter=None,
    ) -> None:
        from hive_io_experimental_spark.sources.formats import writer_options

        location = self.catalog.table_location(desc)
        fmt = self.catalog.table_format(desc)
        opts = writer_options(fmt)
        version = self.catalog.next_version(desc)
        prior = self.catalog.snapshot_manifest(desc)

        if schema.partition_keys:
            _check_partition_values(spec.partition_values)
            exists = any(p.values == spec.partition_values for p in prior)
            if exists and not spec.drop_partition:
                raise PartitionExistsError(
                    f"partition {spec.partition_values} already exists in "
                    f"{desc}@v{version - 1} (set drop_partition=True to "
                    f"supersede it in the new snapshot)"
                )
            snap_path = os.path.join(
                Catalog.partition_path(location, spec.partition_values),
                self._snap_name(version),
            )
            df.write.mode("errorifexists").options(**opts).format(fmt).save(
                snap_path
            )
            if meter is not None:
                meter.mark_done()
            stats = self._stats_for(
                snap_path, fmt, schema,
                num_rows=None if meter is None else self._observed_rows(meter),
            )
            manifest = self._manifest_dicts(
                [p for p in prior if p.values != spec.partition_values]
            )
            manifest.append(
                {
                    "values": dict(spec.partition_values),
                    "location": snap_path,
                    "stats": vars(stats),
                }
            )
            note = f"write_table {spec.partition_values}"
        else:
            # A versioned unpartitioned table supports repeated writes: each
            # one REPLACES the visible content in a new snapshot (Iceberg
            # overwrite semantics) — the unversioned must-be-empty rule is
            # what versioning exists to relax, while history stays readable.
            snap_path = os.path.join(location, self._snap_name(version))
            df.write.mode("errorifexists").options(**opts).format(fmt).save(
                snap_path
            )
            if meter is not None:
                meter.mark_done()
            stats = self._stats_for(
                snap_path, fmt, schema,
                num_rows=None if meter is None else self._observed_rows(meter),
            )
            manifest = [
                {"values": {}, "location": snap_path, "stats": vars(stats)}
            ]
            note = "write_table"
        self.catalog.commit_snapshot(desc, version, manifest, note=note)

    def append_table(
        self, spec: WriteSpec, df: DataFrame, note: str = "append_table"
    ) -> int:
        """Versioned APPEND: commit a new snapshot whose manifest is the
        prior file set PLUS one new immutable snap dir — read-back sees old
        and new rows, history keeps every increment. Only meaningful for
        versioned unpartitioned tables (a partitioned table appends by
        writing a new partition; an unversioned unpartitioned table is
        append-once by the must-be-empty rule). Returns the committed
        version — and ``note`` rides into the snapshot metadata, which is
        how the streaming sink makes batch replays idempotent
        (streaming/snapshots.py).
        """
        from hive_io_experimental_spark.sources.formats import writer_options

        desc = TableDesc.parse(spec.table)
        schema = self.catalog.get_schema(desc)
        if schema.partition_keys:
            raise PartitionSpecError(
                f"{desc} is partitioned — append new partitions via "
                f"write_table/write_dynamic instead"
            )
        if not self.catalog.is_versioned(desc):
            raise SnapshotError(
                f"append_table requires a versioned table; {desc} is not "
                f"(unversioned unpartitioned tables are append-once by the "
                f"empty-table precondition)"
            )
        # same policy surface as write_table: stray partition values are
        # rejected, declared expectations gate the append too
        self._check_partition_spec(schema, spec)
        if spec.expectations:
            self._check_expectations(df, spec)
        df = self._apply_layout(self._conform(df, schema), desc)
        df, meter = self._metered(df)
        location = self.catalog.table_location(desc)
        fmt = self.catalog.table_format(desc)
        version = self.catalog.next_version(desc)
        prior = self.catalog.snapshot_manifest(desc)
        snap_path = os.path.join(location, self._snap_name(version))
        df.write.mode("errorifexists").options(
            **writer_options(fmt)
        ).format(fmt).save(snap_path)
        meter.mark_done()
        manifest = self._manifest_dicts(prior)
        manifest.append(
            {
                "values": {},
                "location": snap_path,
                "stats": vars(self._stats_for(
                    snap_path, fmt, schema,
                    num_rows=self._observed_rows(meter),
                )),
            }
        )
        self.last_write_stats = meter.stats()
        return self.catalog.commit_snapshot(desc, version, manifest, note=note)

    def _write_dynamic_versioned(
        self, desc: TableDesc, schema: HiveTableSchema, body: DataFrame,
        specs: list[dict[str, str]], drop_partitions: bool,
        row_counts: dict | None = None, on_written=None,
    ) -> list[dict[str, str]]:
        import shutil

        from hive_io_experimental_spark.sources.formats import writer_options

        location = self.catalog.table_location(desc)
        fmt = self.catalog.table_format(desc)
        keys = list(schema.partition_keys)
        version = self.catalog.next_version(desc)
        prior = self.catalog.snapshot_manifest(desc)
        colliding = [
            s for s in specs if any(p.values == s for p in prior)
        ]
        if colliding and not drop_partitions:
            raise PartitionExistsError(
                f"partitions already exist in {desc}@v{version - 1}: "
                f"{colliding} (set drop_partitions=True to supersede)"
            )
        # ONE Spark job writes all partitions into a staging dir; the
        # per-partition dirs are then renamed into their snap locations —
        # driver-side metadata moves, no data rewrite.
        staging = os.path.join(location, f"_staging-{self._snap_name(version)}")
        (
            body.write.mode("errorifexists")
            .options(**writer_options(fmt))
            .partitionBy(*keys)
            .format(fmt)
            .save(staging)
        )
        if on_written is not None:
            on_written()
        written = set()
        manifest = self._manifest_dicts(
            [p for p in prior if p.values not in specs]
        )
        for s in specs:
            src = Catalog.partition_path(staging, s)
            dst = os.path.join(
                Catalog.partition_path(location, s), self._snap_name(version)
            )
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            written.add(tuple(sorted(s.items())))
            manifest.append(
                {
                    "values": dict(s),
                    "location": dst,
                    "stats": vars(self._stats_for(
                        dst, fmt, schema,
                        num_rows=(row_counts or {}).get(
                            tuple(sorted(s.items()))
                        ),
                    )),
                }
            )
        shutil.rmtree(staging, ignore_errors=True)
        self.catalog.commit_snapshot(
            desc, version, manifest, note=f"write_dynamic {len(specs)} parts"
        )
        return specs

    # -- policy checks -------------------------------------------------------

    @staticmethod
    def _check_expectations(df: DataFrame, spec: WriteSpec) -> None:
        """Run the declared data contract; abort the write on violations."""
        from hive_io_experimental_spark.errors import ExpectationsFailedError
        from hive_io_experimental_spark.operators.expectations import (
            check_expectations,
        )

        from pyspark.sql import functions as F

        failures = [
            r.asDict()
            for r in check_expectations(df, list(spec.expectations))
            .filter(~F.col("passed"))
            .collect()
        ]
        if failures:
            raise ExpectationsFailedError(failures)

    @staticmethod
    def _check_partition_spec(schema: HiveTableSchema, spec: WriteSpec) -> None:
        keys = set(schema.partition_keys)
        given = set(spec.partition_values)
        if keys and keys != given:
            # Reference checks partition-spec arity vs table partition keys
            # (HiveApiOutputFormat.java:307-318).
            raise PartitionSpecError(
                f"partition spec {sorted(given)} does not match table "
                f"partition keys {sorted(keys)}"
            )
        if not keys and given:
            raise PartitionSpecError(
                "partition values given for an unpartitioned table"
            )

    @staticmethod
    def _check_table_is_empty(location: str) -> None:
        # Reference: unpartitioned target must be empty
        # (HiveApiOutputFormat.java:332-342).
        if os.path.isdir(location):
            data = [
                f
                for f in os.listdir(location)
                if not f.startswith("_") and not f.startswith(".")
            ]
            if data:
                raise TableNotEmptyError(
                    f"unpartitioned table at {location} is not empty"
                )

    def _conform(
        self,
        df: DataFrame,
        schema: HiveTableSchema,
        extra_cols: tuple[str, ...] | list[str] = (),
    ) -> DataFrame:
        """Align incoming columns to the table schema with widening-only
        casts. ``extra_cols`` (the dynamic write's partition keys) ride
        along untouched except for a cast to string — partition values are
        always strings (reference data model)."""
        expected = [n for n, _ in schema.data_fields]
        extras = list(extra_cols)
        if set(df.columns) - set(extras) != set(expected):
            raise PartitionSpecError(
                f"incoming columns {sorted(set(df.columns) - set(extras))} "
                f"do not match table data columns {sorted(expected)}"
            )
        cols = []
        for name, target_dt in schema.data_fields:
            src = df[name]
            source_dt = df.schema[name].dataType
            if source_dt != target_dt:
                # Widening-only: narrower numeric -> wider is cast; anything
                # else raises, where Spark's own cast would silently narrow.
                check_and_upgrade(
                    from_spark_type(target_dt), from_spark_type(source_dt)
                )
                src = src.cast(target_dt)
            cols.append(src.alias(name))
        return df.select(
            *cols, *[df[k].cast("string").alias(k) for k in extras]
        )

    def _stats_for(
        self, path: str, fmt: str = "parquet",
        schema: HiveTableSchema | None = None,
        num_rows: int | None = None,
    ) -> HiveStats:
        from hive_io_experimental_spark.sources.formats import reader_options

        size = 0
        n_files = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                # skip markers AND hidden sidecars (.part-*.crc checksums),
                # same convention as _check_table_is_empty
                if not f.startswith(("_", ".")):
                    size += os.path.getsize(os.path.join(root, f))
                    n_files += 1
        if num_rows is not None:
            # dynamic writes already counted every partition in one
            # aggregation job — no per-partition re-read
            return HiveStats(
                num_rows=num_rows, raw_size=size, total_size=size,
                num_files=n_files,
            )
        reader = self.spark.read.options(**reader_options(fmt))
        if schema is not None:
            # data columns only: the partition dir itself has no key cols
            reader = reader.schema(
                T.StructType(
                    [T.StructField(n, dt, True) for n, dt in schema.data_fields]
                )
            )
        rows = reader.format(fmt).load(path).count()
        return HiveStats(
            num_rows=rows, raw_size=size, total_size=size, num_files=n_files
        )
