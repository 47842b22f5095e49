"""Custom stateful streaming operators: cross-batch key dedup, the
order-insensitive streaming funnel, and cohort-retention snapshots —
the `applyInPandasWithState` carriers (state shards by key with the
natural shuffle, checkpointed with the query, restored on restart).

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


def funnel_stage_times(
    stream_df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_long",
    stages: tuple = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming twin of the batch sequential funnel (queries.
    q_events_funnel): per-user earliest stage-completion times under
    the IN-ORDER rule — stage k's time is the earliest stage-k event
    at/after the user's stage-(k-1) time.

    The update rule is ORDER-INSENSITIVE, so arrival order (across and
    within micro-batches) cannot change the converged answer — the
    stream==batch property tests/test_streaming.py pins:

    - t_view = running min of view times (a min only decreases).
    - a click qualifies when c >= t_view; since t_view only decreases,
      the qualifying set only GROWS — t_click (min over it) only
      decreases too. Clicks below the current t_view park in a pending
      list and are re-examined whenever t_view drops; pending is pruned
      to c < min(t_view, t_click) (anything else can never become the
      answer), so its size is bounded by the events that precede the
      user's first view — not the stream.
    - purchases: the same promotion against t_click.

    Emits the user's current (t_view, t_click, t_purchase) with a
    monotone per-user ``version`` each time state changes; downstream
    keeps the max-version row per user (a tiny dim-style compaction).
    Timestamps ride as LONGs and the encoding must be INJECTIVE as
    well as monotone (micros/nanos — ``F.unix_micros(ts)``); a
    seconds cast collapses sub-second ordering and can admit a click
    that batch semantics reject."""
    s1, s2, s3 = stages

    def upd(key, rows: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            v, c, p, pend_c, pend_p, version = state.get
            pend_c, pend_p = list(pend_c), list(pend_p)
        else:
            v = c = p = None
            pend_c, pend_p, version = [], [], 0
        for pdf in rows:
            for t, ts in zip(pdf[type_col], pdf[ts_col]):
                ts = int(ts)
                if t == s1:
                    v = ts if v is None else min(v, ts)
                elif t == s2:
                    pend_c.append(ts)
                elif t == s3:
                    pend_p.append(ts)
        if v is not None and pend_c:
            qual = [x for x in pend_c if x >= v]
            if qual:
                c = min(qual) if c is None else min(c, min(qual))
            pend_c = [x for x in pend_c if x < v and (c is None or x < c)]
        if c is not None and pend_p:
            qual = [x for x in pend_p if x >= c]
            if qual:
                p = min(qual) if p is None else min(p, min(qual))
            pend_p = [x for x in pend_p if x < c and (p is None or x < p)]
        version += 1
        state.update((v, c, p, pend_c, pend_p, version))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "t_view": pd.array([v], dtype="Int64"),
                "t_click": pd.array([c], dtype="Int64"),
                "t_purchase": pd.array([p], dtype="Int64"),
                "version": [version],
            }
        )

    return stream_df.groupBy(F.col(user_col)).applyInPandasWithState(
        upd,
        outputStructType=(
            f"{user_col} long, t_view long, t_click long,"
            " t_purchase long, version long"
        ),
        stateStructType=(
            "v long, c long, p long,"
            " pend_c array<long>, pend_p array<long>, version long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def retention_first_seen(
    stream_df: DataFrame,
    user_col: str = "user_id",
    week_col: str = "week_long",
) -> DataFrame:
    """Streaming twin of the batch cohort retention (queries.
    q_retention_cohorts): per-user (cohort = min week, active week set)
    maintained statefully. Late arrival of an EARLIER week re-assigns
    the user's cohort — which silently invalidates every previously
    emitted row for that user — so each emission is a full corrected
    snapshot (cohort + distinct weeks array) with a monotone
    ``version``; downstream keeps the max-version row per user and
    builds the (cohort, week) matrix from those, a tiny aggregate over
    one row per user. Weeks ride as LONG epoch seconds
    (date_trunc('week') cast long)."""

    def upd(key, rows: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            weeks, version = state.get
            weeks = set(weeks)
        else:
            weeks, version = set(), 0
        for pdf in rows:
            weeks.update(int(w) for w in pdf[week_col])
        version += 1
        ordered = sorted(weeks)
        state.update((ordered, version))
        yield pd.DataFrame(
            {
                user_col: [key[0]],
                "cohort": [ordered[0]],
                "weeks": [ordered],
                "version": [version],
            }
        )

    return stream_df.groupBy(F.col(user_col)).applyInPandasWithState(
        upd,
        outputStructType=f"{user_col} long, cohort long, weeks array<long>, version long",
        stateStructType="weeks array<long>, version long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
