"""Streaming retention cohorts — the streaming twin of
`operators.temporal.retention_cohorts`.

State is keyed by user: the cohort day (first day ever seen) plus the
set of days already emitted — bounded by the DATE SPAN, not event
volume, the same cardinality bound as the batch operator's
`collect_set(day)` rows. Each micro-batch emits one immutable row per
NEWLY seen (user, day): ``(user_id, cohort_day, age_days)``; the
cohort matrix is then a plain aggregate over the emission stream, and
because every (user, day) pair is emitted exactly once, that aggregate
equals the batch operator's output row for row.

Arrival-order contract (same as the dedup/funnel twins): cohort is
fixed at first sighting, so parity holds under time-ordered file
arrival. A pipeline with late cross-batch data earlier than a user's
recorded cohort must rebase downstream (the batch operator, which sees
everything, is the reconciliation path); `tests/test_streaming.py` pins
the ordered-arrival parity.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RETENTION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("cohort_day", T.StringType()),
        T.StructField("age_days", T.LongType()),
    ]
)

# per-user: cohort day + already-emitted days, both as days-since-epoch
RETENTION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cohort", T.LongType()),
        T.StructField("seen", T.ArrayType(T.LongType())),
    ]
)

_EPOCH = pd.Timestamp("1970-01-01")


def _user_days(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    days: set[int] = set()
    for pdf in pdfs:
        days.update(int(d) for d in pdf["day_num"])
    if state.exists:
        cohort, seen = state.get
        seen = set(seen)
    else:
        cohort, seen = min(days), set()
    new = sorted(days - seen)
    state.update((cohort, sorted(seen | days)))
    if not new:
        return
    yield pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(new),
            "cohort_day": [
                (_EPOCH + pd.Timedelta(days=cohort)).strftime("%Y-%m-%d")
            ]
            * len(new),
            "age_days": [d - cohort for d in new],
        }
    )


def streaming_retention(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """events stream → one immutable (user, cohort_day, age_days) fact
    per newly active day; aggregate downstream for the cohort matrix."""
    keyed = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.datediff(F.to_date(ts_col), F.lit("1970-01-01")).alias("day_num"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _user_days,
        outputStructType=RETENTION_OUT_SCHEMA,
        stateStructType=RETENTION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
