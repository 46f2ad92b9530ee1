"""Engine error hierarchy.

The reference signals misuse with IllegalArgumentException / IOException
(e.g. narrowing writes, missing tables, existing partitions). We keep a small
typed hierarchy so tests can assert on precise failure modes, mirroring the
reference's failure-path tests (CheckOutputSpecsTest, TypeUpgradeTest).
"""

from __future__ import annotations


class HiveIOError(Exception):
    """Base class for all engine errors."""


class TypeMismatchError(HiveIOError, TypeError):
    """Strict typed accessor used with the wrong type, or a narrowing write.

    Reference: strict getters throw (input/parser/Records.java:85-90);
    HiveType.checkAndUpgrade throws on narrowing (common/HiveType.java:242-249).
    """


class TableNotFoundError(HiveIOError):
    """Table missing from the catalog.

    Reference: checkOutputSpecs raises for a nonexistent table
    (output/CheckOutputSpecsTest.java:48-67).
    """


class PartitionExistsError(HiveIOError):
    """Write target partition already exists and drop_partition not set.

    Reference: output/HiveApiOutputFormat.java:305-323.
    """


class PartitionSpecError(HiveIOError):
    """Partition spec missing/extra vs the table's partition keys.

    Reference: output/HiveApiOutputFormat.java:307-318 (arity must match).
    """


class TableNotEmptyError(HiveIOError):
    """Unpartitioned write target table is not empty.

    Reference: output/HiveApiOutputFormat.java:332-342.
    """


class SnapshotError(HiveIOError):
    """Snapshot/time-travel misuse: unknown version, a snapshot operation on
    an unversioned table, or an optimistic-commit conflict (two writers
    reserved the same version — the loser must retry).

    No reference analog (the reference's metastore has no snapshots); the
    semantics follow the public Iceberg/Delta model: immutable per-version
    file sets + optimistic concurrency on the version counter.
    """


class PartitionFilterError(HiveIOError):
    """Partition filter references non-partition columns or fails to parse.

    Reference: the filter is evaluated by the metastore over partition keys
    only (input/HiveApiInputFormat.java:290-309), so data columns are illegal.
    """


class ExpectationsFailedError(HiveIOError):
    """A write's declared data-quality expectations found violations.

    Engine extension (no reference analog — its write preconditions stop
    at schema/partition policy): carries the per-rule report rows so the
    caller can log or quarantine without re-running the audit."""

    def __init__(self, failures: list) -> None:
        self.failures = failures
        detail = "; ".join(
            f"{f['column']} {f['rule']}: {f['n_violations']} violations"
            for f in failures
        )
        super().__init__(f"write expectations failed: {detail}")
