"""Custom stateful streaming operator: cross-batch key dedup.

The reference achieves idempotency by probing the catalog before every
insert (J4/J5 anti-joins,
/root/reference/src/scicat_offline_ingestor.py:67-125). Inside one
long-running stream, re-probing the sink every micro-batch is an
ever-growing read; Spark's stateful processing keeps the seen-key set in
the state store instead — partitioned by key, checkpointed with the
query, restored on restart.

``dedup_across_batches`` is the engine's `applyInPandasWithState`
carrier: first occurrence of a key passes through, repeats are dropped
for as long as the state's TTL keeps the key. The sink-level anti-join
(streaming.pipeline.idempotent_append) stays as the durable outer guard;
this operator cuts the per-batch probe volume to only state-store
misses. State size is bounded by TTL (processing-time timeout) — at
100 TB stream scale the seen-set shards across executors by key, no
driver state.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_across_batches(
    stream_df: DataFrame,
    key_col: str,
    ttl_minutes: int = 0,
) -> DataFrame:
    """Keep only the first row ever seen per key across micro-batches.

    Grouped on ``key_col`` so state shards with the natural shuffle; the
    state per key is a single marker. ``ttl_minutes`` > 0 expires
    remembered keys after that processing-time interval (bounded state);
    0 keeps them for the stream's lifetime.
    """
    out_schema = stream_df.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes > 0
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, rows: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        if not seen:
            for pdf in rows:
                if len(pdf):
                    yield pdf.head(1)
                    break
            state.update((True,))
            if ttl_minutes > 0:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        else:
            for _ in rows:  # drain
                pass

    return stream_df.groupBy(F.col(key_col)).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
