"""Streaming first-order transition counting (the Markov matrix live).

Unlike the count/max/register twins, transitions are NOT a per-row
commutative aggregate: a (prev → next) pair can SPAN a micro-batch
boundary, so a naive per-batch lag() would drop exactly one transition
per key per batch. The operator therefore keeps one row of state per
key — the last (ts, seq, state) seen — and stitches each batch's first
event to it before emitting that batch's transition pairs. Emitted pairs
then feed the ordinary streaming count aggregate, and the drained
stream's (prev, next, n) table equals the batch
`operators.temporal.markov_transitions` counts exactly (pinned by test).

Caveat shared with every event-time stitcher: within-key order is
guaranteed by processing batches in order with per-batch sorting; late
(out-of-order ACROSS batches) events would need a watermark + reorder
buffer — the file-source tests replay in order, which is also the
deployment shape for log-shipped event files.

State: one (ts_us, seq, state) row per key, bounded by key cardinality.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAIR_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("prev_state", T.StringType()),
        T.StructField("next_state", T.StringType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("state", T.StringType()),
    ]
)


def _stitch(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last = state.get if state.exists else None  # (ts_us, seq, state)
    rows = []
    # concat ALL Arrow chunks before sorting: a key whose micro-batch
    # spans multiple chunks (> maxRecordsPerBatch) has no cross-chunk
    # order guarantee, so per-chunk sorting would mis-order transitions
    # (same discipline as funnel_stream / sessionize)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        batch = pd.concat(chunks).sort_values(["ts", "event_id"])
        for r in batch.itertuples():
            cur = (int(r.ts.value // 1000), int(r.event_id), r.event_type)
            if last is not None:
                rows.append((user_id, last[2], cur[2]))
            last = cur
    if last is not None:
        state.update(last)
    if rows:
        yield pd.DataFrame(rows, columns=["user_id", "prev_state", "next_state"])


def streaming_transition_pairs(events: DataFrame) -> DataFrame:
    """Event stream → (user, prev, next) transition-pair emissions with
    cross-batch stitching."""
    return events.groupBy("user_id").applyInPandasWithState(
        _stitch,
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_transition_counts(
    events: DataFrame,
    checkpoint_path: str,
    table: str = "markov_counts",
    trigger_once: bool = True,
):
    """Pairs → running (prev, next, n) matrix in complete mode — the
    output is states²-sized, never corpus-sized."""
    counts = (
        streaming_transition_pairs(events)
        .groupBy("prev_state", "next_state")
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )
    writer = (
        counts.writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_path)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
