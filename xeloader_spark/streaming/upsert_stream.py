"""Streaming latest-per-key state (the MERGE/upsert sink as a stream).

The streaming twin of `queries.temporal.q_upsert_latest`: maintain, per
key, the row with the greatest (ts, event_id) seen so far, emitting the
new champion whenever it changes. State per key is ONE row (the current
champion) — bounded by the number of distinct keys, not by stream
length — and because max is commutative/associative, micro-batch
boundaries cannot change the final answer: the last emission per key
equals the batch max-of-struct aggregate exactly (pinned by test).

This is how a 100 TB "current state" table stays fresh without
reprocessing history: the stream folds each event into O(1) state per
key; the batch operator exists for backfill, and both produce the same
rows by construction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

LATEST_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _latest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    best = state.get if state.exists else None
    for pdf in pdfs:
        for r in pdf.itertuples():
            cand = (
                int(r.ts.value // 1000),
                int(r.event_id),
                r.event_type,
                float(r.value),
            )
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
    if best is not None:
        state.update(best)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "ts": [pd.Timestamp(best[0], unit="us")],
                "event_id": [best[1]],
                "event_type": [best[2]],
                "value": [best[3]],
            }
        )


def streaming_upsert_latest(events: DataFrame) -> DataFrame:
    """events stream → per-key champion emissions. Declared append-mode
    (each emission is an immutable fact: "champion as of this batch", so
    it composes with append-only sinks like parquet); the current state
    per key is the latest emission — take max (ts, event_id) downstream,
    which is exactly the batch upsert's aggregate."""
    return events.groupBy("user_id").applyInPandasWithState(
        _latest,
        outputStructType=LATEST_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
