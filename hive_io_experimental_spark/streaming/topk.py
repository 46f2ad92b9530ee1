"""Custom stateful streaming operator: bounded top-k heavy hitters.

applyInPandasWithState keyed by hash SHARD (not by item key — state must
stay bounded, and per-item keys would grow state with cardinality): state
per shard is the same bounded summary as the batch tier
(operators/incremental.py topk_sketch_state) — up to k (key, lo, hi)
triples plus the residual bound dm, O(k) per shard FOREVER, however many
distinct keys stream through. Each micro-batch folds its exact in-batch
counts into the state with the identical merge-and-truncate math as
merge_topk_sketches, so streaming-fold == repeated batch merge by
construction, and every emitted key carries exact [lo, hi] bounds on its
true count so far.

Update-mode output: every batch emits the shard's current kept set tagged
with a monotonically increasing ``seq`` — downstream takes max(seq) per
shard for the freshest view (the same read a compacted changelog topic
gets). No timeouts: a running aggregate never expires.

Batch twin: topk_sketch_state + merge_topk_sketches (equivalence is the
point — tests fold the same files both ways).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_OUT_SCHEMA = "shard long, seq long, key long, lo long, hi long"
TOPK_STATE_SCHEMA = (
    "keys array<long>, los array<long>, his array<long>, dm long, seq long"
)


def make_topk_fn(k: int = 32):
    """Build the stateful fold (closure carries the capacity)."""

    def topk_fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            keys, los, his, dm, seq = state.get
            d = {kk: [lo, hi] for kk, lo, hi in zip(keys, los, his)}
        else:
            d, dm, seq = {}, 0, 0

        for pdf in batches:
            # exact in-batch counts, folded with the batch-merge math:
            # a key absent from the kept set may have been truncated
            # earlier with at most dm occurrences unseen -> hi += dm once
            for kk, c in pdf["key"].value_counts().items():
                kk, c = int(kk), int(c)
                if kk in d:
                    d[kk][0] += c
                    d[kk][1] += c
                else:
                    d[kk] = [c, c + dm]

        # re-truncate to capacity: top-k by (lo desc, key asc); every
        # dropped key's hi folds into the residual bound
        ordered = sorted(d.items(), key=lambda it: (-it[1][0], it[0]))
        kept, dropped = ordered[:k], ordered[k:]
        if dropped:
            dm = max(dm, max(h for _, (_, h) in dropped))
        seq += 1
        state.update(
            (
                [kk for kk, _ in kept],
                [lo for _, (lo, _) in kept],
                [hi for _, (_, hi) in kept],
                dm,
                seq,
            )
        )
        yield pd.DataFrame(
            {
                "shard": [shard] * len(kept),
                "seq": [seq] * len(kept),
                "key": [kk for kk, _ in kept],
                "lo": [lo for _, (lo, _) in kept],
                "hi": [hi for _, (_, hi) in kept],
            }
        )

    return topk_fn


def topk_stateful(
    stream: DataFrame,
    key_col: str = "user_id",
    k: int = 32,
    n_shards: int = 8,
) -> DataFrame:
    """Streaming bounded top-k: keyed stream -> per-shard kept sets.

    ``key_col`` must be a non-negative integer column (same shard rule as
    the batch tier: key mod n_shards). Update-mode emission; pair with
    ``latest_topk`` to reduce a sink to the freshest per-shard view.
    """
    prepared = stream.select(
        F.pmod(F.col(key_col), F.lit(n_shards)).alias("shard"),
        F.col(key_col).alias("key"),
    )
    return (
        prepared.groupBy("shard")
        .applyInPandasWithState(
            make_topk_fn(k),
            outputStructType=TOPK_OUT_SCHEMA,
            stateStructType=TOPK_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def latest_topk(sink: DataFrame) -> DataFrame:
    """Reduce an update-mode top-k sink to the freshest per-shard rows."""
    from pyspark.sql import Window as W

    w = W.partitionBy("shard")
    return (
        sink.withColumn("_mx", F.max("seq").over(w))
        .filter(F.col("seq") == F.col("_mx"))
        .drop("_mx")
    )
