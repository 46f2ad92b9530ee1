"""SCD1 merge (upsert) into a partitioned catalog table.

The reference's write surface is insert-only with a partition-overwrite
escape hatch (drop_partition, output/OutputConf.java:58-59 /
HiveApiOutputFormat.java:417-442); a real warehouse also needs MERGE:
update matching keys, insert new ones. This operator composes it from the
engine's own policy-checked primitives, with cost independent of the
partition count:

  1. affected partitions = DISTINCT partition values of the updates
     (driver-sized metadata — partition VALUES, never rows);
  2. current rows of ONLY those partitions are read back with a pruning
     partition filter, anti-joined against the update keys (one key-only
     shuffle for ALL partitions at once), and unioned with the updates;
  3. the merged frame lands in a STAGING table via one dynamic-partition
     job, then replaces the affected target partitions via a second
     dynamic job with drop_partitions=True. The staging hop exists
     because a partition cannot be overwritten from a plan that lazily
     reads the same files (the classic read-overwrite hazard); production
     engines do the same dance with a directory swap — a staging table
     through the public API keeps the semantics identical and every write
     policy-checked.

Scale: two Spark jobs and one anti join total — not per partition; work
is proportional to AFFECTED partitions only (the usual merge contract).

CONTRACT: the partition value must be a stable function of the merge key
(a key never moves between partitions). That is what makes touching only
the updates' partitions sound — an update whose key lived in a different,
un-touched partition would otherwise leave the stale row behind. This is
the standard partition-local merge contract (engines that allow moves
make you put the partition column in the merge condition and pay a full
scan); it is asserted here only by partition-scoped anti-join semantics.

Restartability: a crash between staging and swap leaves the staging
table behind; the next merge drops and recreates it before writing, so a
failed merge is safely re-runnable. Concurrent merges into the SAME
table are not supported (they would race on the shared staging name and
on the target partitions) — the catalog serializes metadata mutations,
not whole-merge transactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hive_io_experimental_spark.catalog import Catalog, TableDesc
from hive_io_experimental_spark.input import HiveInput, ScanSpec
from hive_io_experimental_spark.output import HiveOutput


def _quote(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def _distinct_partition_values(
    spark: SparkSession, df: DataFrame, partition_col: str
) -> set[str | None]:
    """Collect DISTINCT partition values with a conf-registered cap.

    Merge planning is driver-sized by design (partition VALUES, never
    rows), but the bound is only as good as the partitioning scheme — cap
    it (hiveio.merge.max_partitions) so a degenerate high-cardinality
    partition column fails fast with a clear message instead of OOMing
    the driver mid-collect.
    """
    from hive_io_experimental_spark import conf

    cap = conf.MERGE_MAX_PARTITIONS.get(spark)
    distinct = df.select(F.col(partition_col).cast("string")).distinct()
    rows = distinct.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"merge touches more than {cap} distinct {partition_col!r} "
            f"partition values (cap {conf.MERGE_MAX_PARTITIONS.key}); "
            "repartition the table on a coarser key or raise the cap"
        )
    return {r[0] for r in rows}


def scd1_merge_full(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> None:
    """Full-scan MERGE variant: keys MAY move between partitions.

    ``scd1_merge`` above assumes the partition value is a stable function of
    the key and only touches the updates' partitions. When an update can
    reassign a row's partition (the key "moves"), the superseded row lives
    in a partition the updates never name — it must be found and deleted.
    That is inherently a key-lookup over the WHOLE table, so this variant
    pays one full scan, shaped to be as cheap as a full scan can be:

      1. ONE projection-pruned scan of (key_cols, partition_col) only —
         columnar readers never touch payload columns — left-semi joined
         against the (broadcastable) update keys finds every partition
         holding a row that is being superseded, anywhere in the table;
      2. affected partitions = those ∪ the partitions the updates land in;
         everything else proceeds exactly like the partition-local merge
         (read affected only, one anti join, staging hop, dynamic swap);
      3. a partition whose every row moved away ends EMPTY: the dynamic
         swap never writes it (no rows), so its stale directory is dropped
         explicitly afterwards — without this, old rows would survive in
         partitions the rewrite never touched.

    Engines with MERGE make the same trade: a merge condition on the
    partition column gets partition-local cost, one without it pays the
    scan (this module's docstring, "engines that allow moves ... pay a
    full scan").
    """
    import os
    import shutil

    inp = HiveInput(spark, catalog)
    out = HiveOutput(spark, catalog)
    desc = TableDesc.parse(table)

    upd_parts = _distinct_partition_values(spark, updates, partition_col)
    if any(pv is None for pv in upd_parts):
        raise ValueError(
            f"updates contain NULL {partition_col} values — null partitions "
            f"are not supported"
        )
    # key-location scan: key + partition columns only, semi vs update keys
    key_locations = inp.read_table(
        ScanSpec(table=table, columns=(*key_cols, partition_col))
    )
    hit_parts = _distinct_partition_values(
        spark,
        key_locations.join(
            F.broadcast(updates.select(*key_cols).distinct()),
            list(key_cols),
            "left_semi",
        ),
        partition_col,
    )
    affected_existing = sorted(
        pv
        for pv in (upd_parts | hit_parts)
        if catalog.partition_exists(desc, {partition_col: pv})
    )

    staging_name = f"{desc.database}.{desc.table}_merge_staging"
    if affected_existing:
        in_list = ", ".join(_quote(pv) for pv in affected_existing)
        current = inp.read_table(
            ScanSpec(
                table=table,
                partition_filter=f"{partition_col} IN ({in_list})",
            )
        )
        merged = current.join(
            updates.select(*key_cols), list(key_cols), "left_anti"
        ).unionByName(updates.select(*current.columns))
    else:
        merged = updates

    if catalog.table_exists(staging_name):
        catalog.drop_table(staging_name, delete_data=True)
    catalog.create_table(
        staging_name, catalog.get_schema(desc),
        storage_format=catalog.table_format(desc),
    )
    try:
        out.write_dynamic(staging_name, merged)
        staged = inp.read_table(ScanSpec(table=staging_name))
        written = {
            s[partition_col]
            for s in out.write_dynamic(table, staged, drop_partitions=True)
        }
    finally:
        catalog.drop_table(staging_name, delete_data=True)

    # partitions fully drained by key moves: drop registration + directory
    for pv in affected_existing:
        if pv not in written:
            values = {partition_col: pv}
            location = Catalog.partition_path(
                catalog.table_location(desc), values
            )
            catalog.drop_partition(desc, values)
            if os.path.isdir(location):
                shutil.rmtree(location, ignore_errors=True)


def scd1_merge(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    updates: DataFrame,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> None:
    """Upsert ``updates`` (which carry ``partition_col``) into ``table``."""
    inp = HiveInput(spark, catalog)
    out = HiveOutput(spark, catalog)
    desc = TableDesc.parse(table)
    staging_name = f"{desc.database}.{desc.table}_merge_staging"

    part_values = sorted(
        _distinct_partition_values(spark, updates, partition_col),
        key=lambda pv: (pv is None, pv),
    )
    if any(pv is None for pv in part_values):
        raise ValueError(
            f"updates contain NULL {partition_col} values — null partitions "
            f"are not supported"
        )
    existing = [
        pv
        for pv in part_values
        if catalog.partition_exists(desc, {partition_col: pv})
    ]
    if existing:
        in_list = ", ".join(_quote(pv) for pv in existing)
        current = inp.read_table(
            ScanSpec(
                table=table,
                partition_filter=f"{partition_col} IN ({in_list})",
            )
        )
        merged = current.join(
            updates.select(*key_cols), list(key_cols), "left_anti"
        ).unionByName(updates.select(*current.columns))
    else:
        merged = updates

    # drop any stale staging table from a crashed previous merge BEFORE
    # writing — makes a failed merge safely re-runnable
    if catalog.table_exists(staging_name):
        catalog.drop_table(staging_name, delete_data=True)
    catalog.create_table(
        staging_name, catalog.get_schema(desc),
        storage_format=catalog.table_format(desc),
    )
    try:
        out.write_dynamic(staging_name, merged)
        staged = inp.read_table(ScanSpec(table=staging_name))
        out.write_dynamic(table, staged, drop_partitions=True)
    finally:
        catalog.drop_table(staging_name, delete_data=True)


def erase_keys(
    spark: SparkSession,
    catalog: Catalog,
    table: str,
    keys: DataFrame,
    key_cols: tuple[str, ...],
    partition_col: str,
) -> dict:
    """Right-to-be-forgotten DELETE: remove every row of ``table`` whose
    ``key_cols`` tuple appears in ``keys``, wherever it lives.

    The erasure request names keys, never partitions — finding the rows
    is the operator's job, shaped like scd1_merge_full's key lookup:

      1. ONE projection-pruned scan of (key_cols, partition_col) only,
         left-semi joined against the broadcast key set, yields the hit
         partitions (cap-guarded driver metadata);
      2. only those partitions are read back and anti-joined against the
         keys; survivors swap in via the staging hop + dynamic overwrite
         (the same read-overwrite hazard dance as merge);
      3. a partition whose every row is erased ends EMPTY — the dynamic
         swap never writes it, so its registration and directory are
         dropped explicitly (the scd1_merge_full drained-partition rule;
         without it erased rows would survive in untouched directories).

    Cost: one projected full scan + one rewrite of affected partitions —
    the floor for key-addressed deletes without a key index. WITH a key
    index (analyze_partition_blooms stamped on the single key column and
    a driver-sized key set), the location scan itself is pre-pruned: the
    per-partition blooms are probed driver-side and only partitions that
    MAY hold a key are read — a small erasure batch then touches a
    handful of directories instead of scanning the table. Bloom false
    positives only widen the scan, never the delete (the exact anti-join
    decides rows). Returns {"n_partitions": affected, "n_erased": rows
    removed, "skipped_orphans": partition values holding key rows in
    UNREGISTERED directories} — the audit record an erasure workflow must
    retain. Orphan-dir hits cannot be erased by a partition-scoped rewrite
    (there is no registration to swap); they are reported, never silently
    dropped — run catalog_fsck/vacuum_orphans (or register the dirs) and
    re-run the erasure. When any orphan dir exists under the table, the
    bloom fast path is bypassed (orphan dirs carry no bloom stamps, so
    pruning by the index could skip their rows unscanned).
    """
    import os
    import shutil

    inp = HiveInput(spark, catalog)
    out = HiveOutput(spark, catalog)
    desc = TableDesc.parse(table)

    key_set = keys.select(*key_cols).distinct()
    loc_spec = ScanSpec(table=table, columns=(*key_cols, partition_col))
    # The orphan-dir walk (a full-tree driver listdir) gates ONLY the
    # bloom fast path — orphan dirs carry no bloom stamps, so pruning by
    # the index could skip their rows unscanned. Probe the index first
    # (catalog metadata, no filesystem): when no bloom applies anyway,
    # the exact location scan runs and the walk is skipped entirely, so
    # the common unindexed erase pays no per-call tree listing.
    bloom_parts = _bloom_candidate_partitions(
        spark, catalog, desc, key_set, key_cols, partition_col
    )
    if bloom_parts is not None and _orphan_partition_dirs(catalog, desc):
        bloom_parts = None
    if bloom_parts is not None:
        if not bloom_parts:
            return {"n_partitions": 0, "n_erased": 0, "skipped_orphans": []}
        in_list = ", ".join(_quote(pv) for pv in bloom_parts)
        loc_spec = ScanSpec(
            table=table,
            columns=(*key_cols, partition_col),
            partition_filter=f"{partition_col} IN ({in_list})",
        )
    key_locations = inp.read_table(loc_spec)
    all_hits = sorted(
        pv
        for pv in _distinct_partition_values(
            spark,
            key_locations.join(
                F.broadcast(key_set), list(key_cols), "left_semi"
            ),
            partition_col,
        )
        if pv is not None
    )
    hit_parts = [
        pv
        for pv in all_hits
        if catalog.partition_exists(desc, {partition_col: pv})
    ]
    # Keys living in UNREGISTERED (orphan) directories cannot be erased by
    # a partition-scoped rewrite — the catalog has no registration to swap.
    # An RTBF operator must never drop those silently: they ride out in the
    # audit record so the caller can catalog_fsck/vacuum_orphans and re-run.
    skipped_orphans = [pv for pv in all_hits if pv not in set(hit_parts)]
    if not hit_parts:
        return {
            "n_partitions": 0,
            "n_erased": 0,
            "skipped_orphans": skipped_orphans,
        }

    in_list = ", ".join(_quote(pv) for pv in hit_parts)
    current = inp.read_table(
        ScanSpec(
            table=table,
            partition_filter=f"{partition_col} IN ({in_list})",
        )
    )
    survivors = current.join(F.broadcast(key_set), list(key_cols), "left_anti")
    n_before = current.count()

    staging_name = f"{desc.database}.{desc.table}_erase_staging"
    if catalog.table_exists(staging_name):
        catalog.drop_table(staging_name, delete_data=True)
    catalog.create_table(
        staging_name, catalog.get_schema(desc),
        storage_format=catalog.table_format(desc),
    )
    try:
        out.write_dynamic(staging_name, survivors)
        staged = inp.read_table(ScanSpec(table=staging_name))
        n_after = staged.count()
        written = {
            s[partition_col]
            for s in out.write_dynamic(table, staged, drop_partitions=True)
        }
    finally:
        catalog.drop_table(staging_name, delete_data=True)

    for pv in hit_parts:
        if pv not in written:
            values = {partition_col: pv}
            location = Catalog.partition_path(
                catalog.table_location(desc), values
            )
            catalog.drop_partition(desc, values)
            if os.path.isdir(location):
                shutil.rmtree(location, ignore_errors=True)

    return {
        "n_partitions": len(hit_parts),
        "n_erased": n_before - n_after,
        "skipped_orphans": skipped_orphans,
    }


def _orphan_partition_dirs(catalog: Catalog, desc: TableDesc) -> list[str]:
    """Partition-depth directories under the table location that no
    catalog registration references (catalog_fsck's orphan walk, scoped to
    one table). Driver-sized metadata walk, no Spark job.

    SCOPE: partition-DEPTH dirs only. On a versioned table, an orphan
    snap-attempt dir nested INSIDE a registered partition dir (a lost
    writer's attempt at a partition that also has a committed snapshot)
    is invisible here and to erase_keys' skipped_orphans audit — but it
    is also invisible to every read (scans resolve the committed snap
    location, never siblings), so it holds no reachable rows to erase;
    expire_snapshots(clean_orphans=True) reclaims it."""
    import os

    location = catalog.table_location(desc)
    schema = catalog.get_schema(desc)
    depth = len(schema.partition_keys)
    if not depth or not os.path.isdir(location):
        return []
    # versioned tables register snap-dir locations one level BELOW the
    # partition dir — a partition dir counts as registered when it equals
    # a registered location or contains one
    registered = {
        os.path.normpath(p.location) for p in catalog.list_partitions(desc)
    }
    covered = set(registered)
    for loc in registered:
        covered.add(os.path.dirname(loc))
    orphans: list[str] = []
    stack = [(location, 0)]
    while stack:
        d, lvl = stack.pop()
        for name in sorted(os.listdir(d)):
            sub = os.path.join(d, name)
            if not os.path.isdir(sub) or name.startswith(("_", ".")):
                continue
            if lvl + 1 == depth:
                if os.path.normpath(sub) not in covered:
                    orphans.append(sub)
            else:
                stack.append((sub, lvl + 1))
    return orphans


# driver-side key budget for the bloom-index fast path: above this the
# full projected location scan is cheaper than materializing keys on the
# driver (erasure batches are normally tiny)
_BLOOM_PRUNE_MAX_KEYS = 1000


def _bloom_candidate_partitions(
    spark, catalog, desc, key_set, key_cols, partition_col
):
    """Partitions that MAY hold any of the keys, per the stamped bloom
    index — or None when the fast path doesn't apply (multi-column key,
    key set over budget, or no partition carries a bloom for the key).

    Probe positions are computed once per key (k md5s), then tested
    against each partition's words — O(keys x partitions) bit tests on
    the driver, no Spark job. A partition without a bloom for the column
    is always a candidate (staleness costs a read, never a missed
    delete).
    """
    import hashlib

    if len(key_cols) != 1:
        return None
    parts = catalog.list_partitions(desc)
    with_bloom = [
        p for p in parts if (p.blooms or {}).get(key_cols[0])
    ]
    if not with_bloom:
        return None
    rows = key_set.limit(_BLOOM_PRUNE_MAX_KEYS + 1).collect()
    if len(rows) > _BLOOM_PRUNE_MAX_KEYS:
        return None
    keys = [r[0] for r in rows if r[0] is not None]
    # int/str keys only: str(key) must equal the Spark string cast the
    # stamp hashed (input._bloom_excludes convention); anything else
    # falls back to the exact location scan
    if any(isinstance(v, bool) or not isinstance(v, (int, str)) for v in keys):
        return None

    def probes(bloom, v):
        m, k = bloom["m"], bloom["k"]
        out = []
        for i in range(k):
            digest = hashlib.md5(f"bloom{i}:{v}".encode()).hexdigest()
            out.append(divmod(int(digest[:15], 16) % m, 32))
        return out

    candidates = []
    for p in parts:
        bloom = (p.blooms or {}).get(key_cols[0])
        if not bloom:
            candidates.append(p.values[partition_col])
            continue
        words = bloom["words"]
        for v in keys:
            if all(
                (int(words.get(str(w), 0)) >> b) & 1
                for w, b in probes(bloom, v)
            ):
                candidates.append(p.values[partition_col])
                break
    return sorted(candidates)
