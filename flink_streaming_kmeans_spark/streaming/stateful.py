"""Custom stateful streaming operator (per-key state, Arrow-batched).

Reference analog: the Flink demo's stateful co-operator
(KMeansClustering.java, expected — SURVEY.md §3.1 [PK]; checkout was
empty) holds per-key state (cluster membership, running means) that
every arriving record reads and updates. Spark's equivalents for
arbitrary per-key streaming state are `transformWithStateInPandas`
(Spark 4 StatefulProcessor) and `applyInPandasWithState` (GroupState).
This module uses **applyInPandasWithState**: the newer
transformWithStateInPandas runner requires protobuf, which is broken
in this container (`ImportError: cannot import name 'descriptor' from
'google.protobuf'` — verified 2026-08-13); the GroupState API is the
documented fallback (SURVEY.md §7 hard-part 5) with identical
semantics for value-state use.

`running_user_stats` keeps (n_events, total_value) per user and emits
the updated running aggregate every micro-batch — the same running
per-key mean shape the reference maintains per cluster (MacQueen-style
c' = (c*n + x)/(n+1) is derivable from exactly this state).

Scale: state lives in the executor-local state store keyed by the
shuffle partitioning (one shuffle per batch on user_id); state size is
O(distinct keys), not O(events). This is the 100 TB-stream shape:
partition-parallel, incremental, no replay.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _running_stats(key, pdf_iter, state: GroupState):
    """Per-user running (count, sum(value)): read state, fold the
    batch's rows in, write state back, emit one updated row."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events_stream):
    """Apply the stateful running-stats operator to a streaming events
    DataFrame (must carry user_id and value columns)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_stats,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="Update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
