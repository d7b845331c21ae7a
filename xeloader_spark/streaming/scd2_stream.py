"""Streaming twin of `operators.temporal.scd2_history` (SCD type 2).

The batch operator compresses a complete mutation log into versioned
validity ranges; here the log is a stream and each key's CURRENT run is
the operator state — (attribute, version counter, run start, run
length), one fixed-size row per key regardless of event volume. A
version becomes an immutable fact exactly when the next value arrives
and closes it, so closed versions are emitted in append mode as they
happen; the still-open run stays in state (the batch analogue of the
`effective_to IS NULL` row).

Parity contract (pinned in `tests/test_streaming.py`): under ordered
file arrival, the union of streamed emissions equals the batch
operator's output restricted to CLOSED versions (`effective_to IS NOT
NULL`), including version numbers and run lengths — the same
batch-equivalence shape as the funnel / upsert / dedup twins.

At 100 TB-of-log scale the state store carries one row per ACTIVE key
(users, sessions, devices — dimension-sized, not event-sized), which is
precisely the working set a warehouse SCD2 merge holds; RocksDB state in
production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SCD2_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("effective_from", T.TimestampType()),
        T.StructField("effective_to", T.TimestampType()),
        T.StructField("version", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# current run per key: attribute value, version number, run start
# (epoch micros — timestamps are kept integral in state), run length
SCD2_STATE_SCHEMA = T.StructType(
    [
        T.StructField("attr", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("run_len", T.LongType()),
    ]
)


def _scd2_fold(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"], kind="mergesort")

    if state.exists:
        attr, version, start_us, run_len = state.get
    else:
        attr, version, start_us, run_len = None, 0, 0, 0

    out: dict[str, list] = {k: [] for k in (
        "event_type", "effective_from", "effective_to", "version", "n_events"
    )}
    for ts, ev_attr in zip(
        batch["ts"].astype("datetime64[us]").astype("int64"),
        batch["event_type"],
    ):
        if attr is None:
            attr, version, start_us, run_len = ev_attr, 1, int(ts), 1
        elif ev_attr == attr:
            run_len += 1
        else:
            out["event_type"].append(attr)
            out["effective_from"].append(start_us)
            out["effective_to"].append(int(ts))
            out["version"].append(version)
            out["n_events"].append(run_len)
            attr, version, start_us, run_len = (
                ev_attr, version + 1, int(ts), 1,
            )
    state.update((attr, int(version), int(start_us), int(run_len)))
    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(out["version"]),
            "event_type": out["event_type"],
            "effective_from": pd.to_datetime(out["effective_from"], unit="us"),
            "effective_to": pd.to_datetime(out["effective_to"], unit="us"),
            "version": out["version"],
            "n_events": out["n_events"],
        }
    )


def streaming_scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> DataFrame:
    """event stream → closed SCD2 version rows, O(1) state per key."""
    keyed = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(attr_col).alias("event_type"),
        F.col(ts_col).alias("ts"),
        F.col(seq_col).cast("long").alias("event_id"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _scd2_fold,
        outputStructType=SCD2_OUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
