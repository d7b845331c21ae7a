"""Streaming gap-aware EWMA — the streaming twin of
`queries/temporal.q_ewma_smooth`.

State is keyed by user and holds the OPEN hour bucket (count still
accumulating) plus the trailing ≤7 CLOSED hour buckets — O(1) per key,
the same 8-bucket horizon as the batch operator's explode window. A
bucket's smoothed value is emitted when the bucket CLOSES (a later hour
arrives for that user): under time-ordered arrival the count is final at
that point, so the emission equals the batch row bit-for-bit (integer
`1 << (7 - gap)` weights, one IEEE division — identical arithmetic).

Emission contract (same discipline as the SCD2 twin's closed versions):
each user's LAST bucket never closes inside a finite stream, so parity
is pinned on the CLOSED buckets; the batch operator is the
reconciliation path for the open tail. `tests/test_streaming.py` pins
closed-bucket parity against `q_ewma_smooth` under time-ordered file
arrival.

Late-data policy (hours arriving BELOW the open bucket across
micro-batches): merged into the matching retained bucket when one is
still in the `_LAGS` horizon — the already-emitted row for that bucket
stands (append mode), but future closings smooth over the corrected
count — otherwise counted in the per-user `late_dropped` state field.
Either way the `hours` array stays strictly increasing, which the
gap/weight arithmetic requires.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_LAGS = 8  # keep in sync with queries/temporal._EWMA_LAGS

EWMA_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("hour_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("num", T.LongType()),
        T.StructField("den", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

# trailing closed buckets + the open bucket, as parallel arrays; the
# LAST element is the open bucket. `hours` is strictly increasing — the
# late-data policy below maintains that invariant. `late_dropped` counts
# events that arrived too late to place (observable in the state store).
EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("hours", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("late_dropped", T.LongType()),
    ]
)


def _smooth(hours: list[int], counts: list[int], idx: int) -> tuple[int, int]:
    """num/den of bucket `idx` over the buckets at or before it within
    the `_LAGS`-hour horizon — the batch operator's exact arithmetic."""
    h = hours[idx]
    num = den = 0
    for j in range(idx + 1):
        gap = h - hours[j]
        if 0 <= gap < _LAGS:
            w = 1 << (_LAGS - 1 - gap)
            num += counts[j] * w
            den += w
    return num, den


def _user_buckets(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    batch: dict[int, int] = {}
    for pdf in pdfs:
        for h, c in pdf.groupby("h").size().items():
            batch[int(h)] = batch.get(int(h), 0) + int(c)
    if state.exists:
        hours, counts, late_dropped = state.get
        hours, counts = list(hours), list(counts)
        late_dropped = int(late_dropped or 0)
    else:
        hours, counts, late_dropped = [], [], 0
    out_rows: list[tuple[int, int, int, int, float]] = []
    for h in sorted(batch):
        c = batch[h]
        if hours and h == hours[-1]:
            counts[-1] += c
            continue
        if hours and h < hours[-1]:
            # LATE data across micro-batches (an earlier hour after a
            # later one already opened). Appending would make `hours`
            # non-monotonic and corrupt every subsequent gap/weight
            # computation, so: merge into the matching retained bucket
            # if one exists (improves the smoothing inputs of FUTURE
            # closings; the already-emitted row for that bucket stands,
            # same append-mode discipline as any late-data stream), else
            # count it as dropped — the batch operator is the
            # reconciliation path, exactly as for the open tail.
            try:
                counts[hours.index(h)] += c
            except ValueError:
                late_dropped += c
            continue
        if hours:
            # a later hour arrived: the open bucket is now final — emit
            num, den = _smooth(hours, counts, len(hours) - 1)
            out_rows.append(
                (hours[-1], counts[-1], num, den, num / den)
            )
        hours.append(h)
        counts.append(c)
        if len(hours) > _LAGS:
            hours, counts = hours[-_LAGS:], counts[-_LAGS:]
    state.update((hours, counts, late_dropped))
    if not out_rows:
        return
    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(out_rows),
            "hour_idx": [r[0] for r in out_rows],
            "n_events": [r[1] for r in out_rows],
            "num": [r[2] for r in out_rows],
            "den": [r[3] for r in out_rows],
            "ewma": [r[4] for r in out_rows],
        }
    )


def streaming_ewma(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """events stream → one immutable smoothed row per CLOSED (user,
    hour) bucket; each user's open tail stays in state."""
    keyed = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        # cast first: streaming parquet sources surface TIMESTAMP_NTZ,
        # which unix_micros rejects; the session is pinned to UTC so the
        # cast is value-identical to the batch operator's hour index
        F.expr(f"unix_micros(cast({ts_col} as timestamp)) div 3600000000")
        .cast("long")
        .alias("h"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _user_buckets,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
