"""Streaming CDC merge-apply (the I/U/D MERGE sink as a stream).

The streaming twin of `operators.temporal.cdc_apply`: per key, fold each
change row into O(1) state — the latest-by-(ts, seq) op with its payload,
plus running op-mix counters — and emit the post-batch snapshot row
whenever the key is touched. Deletes are TOMBSTONE emissions
(`is_deleted = True`) rather than silence, so a downstream sink can
retract; the live set (`is_deleted = False`, last emission per key)
equals the batch `cdc_apply` output exactly (pinned by test), because
max-of-(ts, seq) is commutative and the counters are sums — micro-batch
boundaries cannot change either.

State per key is one row + three counters, bounded by distinct keys,
not stream length — the same bound as the batch shuffle's aggregate
state, which is what makes replaying a 100 TB change history and
tailing it live produce the same table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CDC_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("last_op", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_ops", T.LongType()),
        T.StructField("n_inserts", T.LongType()),
        T.StructField("n_updates", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
        T.StructField("is_deleted", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ts_us", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("n_ops", T.LongType()),
        T.StructField("n_inserts", T.LongType()),
        T.StructField("n_deletes", T.LongType()),
    ]
)


def _apply(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        ts_us, event_id, op, value, n_ops, n_ins, n_del = state.get
    else:
        ts_us, event_id, op, value, n_ops, n_ins, n_del = (
            None, None, None, None, 0, 0, 0,
        )
    touched = False
    for pdf in pdfs:
        for r in pdf.itertuples():
            touched = True
            n_ops += 1
            if r.op == "I":
                n_ins += 1
            elif r.op == "D":
                n_del += 1
            cand_key = (int(r.ts.value // 1000), int(r.event_id))
            if ts_us is None or cand_key > (ts_us, event_id):
                ts_us, event_id = cand_key
                op = r.op
                # pandas delivers SQL nulls as NaN, which `is None` never
                # matches — pd.isna keeps null payloads null, matching
                # batch cdc_apply
                value = None if pd.isna(r.value) else float(r.value)
    if touched:
        state.update((ts_us, event_id, op, value, n_ops, n_ins, n_del))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "ts": [pd.Timestamp(ts_us, unit="us")],
                "event_id": [event_id],
                "last_op": [op],
                "value": [value],
                "n_ops": [n_ops],
                "n_inserts": [n_ins],
                "n_updates": [n_ops - n_ins - n_del],
                "n_deletes": [n_del],
                "is_deleted": [op == "D"],
            }
        )


def streaming_cdc_apply(changes: DataFrame) -> DataFrame:
    """Change stream (user_id, ts, event_id, op, value) → per-key
    snapshot emissions (append-mode immutable facts; the current table
    is the last emission per key, tombstones included)."""
    return changes.groupBy("user_id").applyInPandasWithState(
        _apply,
        outputStructType=CDC_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
