"""Metadata-only join planning advisor.

Catalyst/AQE pick the physical join at runtime from size estimates; at
100 TB you want the answer BEFORE the job ships — is the dimension side
broadcastable, will the probe key skew, should the pipeline salt? This
advisor answers from catalog metadata alone (partition HiveStats for
bytes/rows, ANALYZE column stats for key cardinality — see analyze.py):
zero Spark jobs, so it can run in a scheduler or a CLI preflight.

Pure heuristics with the same thresholds the engine's session uses:
broadcast when the smaller side fits the autoBroadcastJoinThreshold,
otherwise shuffle, and recommend salting when the key's rows-per-distinct
ratio says single-reducer hot keys (the condition AQE's skew-join
mitigates at runtime — the advisory lets you fix the layout instead).
"""

from __future__ import annotations

from dataclasses import dataclass

from hive_io_experimental_spark.catalog import Catalog, TableDesc

# mirrors session.py's spark.sql.autoBroadcastJoinThreshold default
DEFAULT_BROADCAST_BYTES = 64 * 1024 * 1024
# rows-per-distinct-key beyond which a shuffle join sees hot reducers
DEFAULT_SKEW_RATIO = 1000.0


@dataclass(frozen=True)
class JoinAdvice:
    """One recommendation: strategy + the numbers that led to it."""

    strategy: str  # 'broadcast_left' | 'broadcast_right' | 'shuffle'
    salt_recommended: bool
    left_bytes: int
    right_bytes: int
    left_rows: int
    right_rows: int
    rows_per_key: float | None  # probe-side rows / key ndv (None = unknown)
    reason: str


def _table_totals(catalog: Catalog, table: str) -> tuple[int, int]:
    """(total_bytes, total_rows) from partition stats; unpartitioned
    tables (no partition entries) are sized from their data files, with
    rows taken from ANALYZE column stats when available. Never-written
    tables come back (0, 0) and the advice degrades to 'shuffle'."""
    import os

    desc = TableDesc.parse(table)
    rows = bytes_ = 0
    for p in catalog.list_partitions(desc):
        rows += p.stats.num_rows
        bytes_ += p.stats.total_size
    if bytes_ == 0:
        location = catalog.table_location(desc)
        if os.path.isdir(location):
            for root, _dirs, files in os.walk(location):
                for f in files:
                    if not f.startswith(("_", ".")):
                        bytes_ += os.path.getsize(os.path.join(root, f))
        if rows == 0:
            cstats = catalog.get_column_stats(desc)
            if cstats:
                rows = max(s.get("n_nonnull", 0) for s in cstats.values())
    return bytes_, rows


def suggest_join_strategy(
    catalog: Catalog,
    left_table: str,
    right_table: str,
    key: str,
    broadcast_bytes: int = DEFAULT_BROADCAST_BYTES,
    skew_ratio: float = DEFAULT_SKEW_RATIO,
) -> JoinAdvice:
    """Recommend a physical strategy for ``left JOIN right ON key``.

    Broadcast whichever side fits under ``broadcast_bytes`` (smaller side
    wins ties); otherwise a shuffle join, with ``salt_recommended`` when
    the probe (larger) side's ANALYZE stats show more than ``skew_ratio``
    rows per distinct key value. Run analyze_table on the larger side
    first for the skew signal — without column stats the advisor still
    sizes the broadcast decision from partition stats alone.
    """
    lb, lr = _table_totals(catalog, left_table)
    rb, rr = _table_totals(catalog, right_table)

    if 0 < lb <= broadcast_bytes or 0 < rb <= broadcast_bytes:
        side = "left" if (lb or float("inf")) <= (rb or float("inf")) else "right"
        return JoinAdvice(
            strategy=f"broadcast_{side}",
            salt_recommended=False,
            left_bytes=lb, right_bytes=rb, left_rows=lr, right_rows=rr,
            rows_per_key=None,
            reason=(
                f"{side} side is {min(x for x in (lb, rb) if x):,} bytes "
                f"<= broadcast threshold {broadcast_bytes:,}"
            ),
        )

    probe_table, probe_rows = (
        (left_table, lr) if lr >= rr else (right_table, rr)
    )
    stats = catalog.get_column_stats(probe_table).get(key)
    rows_per_key = None
    salt = False
    if stats and stats.get("n_distinct"):
        rows_per_key = probe_rows / stats["n_distinct"]
        salt = rows_per_key > skew_ratio
    return JoinAdvice(
        strategy="shuffle",
        salt_recommended=salt,
        left_bytes=lb, right_bytes=rb, left_rows=lr, right_rows=rr,
        rows_per_key=rows_per_key,
        reason=(
            "both sides exceed the broadcast threshold"
            + (
                f"; probe side averages {rows_per_key:,.0f} rows per "
                f"'{key}' value -> salt"
                if salt
                else (
                    f"; {rows_per_key:,.1f} rows per '{key}' value is "
                    "shuffle-friendly"
                    if rows_per_key is not None
                    else "; run analyze_table on the probe side for a "
                         "skew verdict"
                )
            )
        ),
    )
