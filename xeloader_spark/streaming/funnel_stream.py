"""Streaming ordered-sequence funnel (the batch `temporal.funnel`'s
stateful twin).

State per user is one tiny tuple — the first time each step was reached
in strict order (t_1 … t_k as epoch micros) — updated by folding each
event in timestamp order. Emission: the user's current step vector
whenever it changes; the LAST emission per user equals the batch funnel
row exactly (pinned by test).

Why the fold is micro-batch-safe here: within a batch we sort the
user's events by (ts, event_id) before folding, and the fold only ever
*fills* steps forward in time — a later batch can never contain an event
earlier than an already-consumed one IF the source respects event-time
ordering per key up to the watermark. For out-of-order sources, pair
this with a watermark + `sort_within` on the ingest side (the gap
sessionizer takes the same stance). State stays O(k) per user forever —
bounded by distinct users, not stream length.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEFAULT_STEPS: tuple[str, ...] = ("view", "click", "purchase")


def _schemas(k: int):
    out = T.StructType(
        [T.StructField("user_id", T.LongType())]
        + [T.StructField(f"t_{i}", T.TimestampType()) for i in range(1, k + 1)]
    )
    state = T.StructType(
        [T.StructField(f"us_{i}", T.LongType()) for i in range(1, k + 1)]
    )
    return out, state


def make_funnel_fold(steps: Sequence[str] = DEFAULT_STEPS):
    """(key, batches, state) -> frames for applyInPandasWithState."""
    k = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def fold(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us = list(state.get) if state.exists else [None] * k
        changed = False
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values(["ts", "event_id"])
        for r in rows.itertuples():
            i = step_idx.get(r.event_type)
            if i is None or ts_us[i] is not None:
                continue
            t = int(r.ts.value // 1000)
            if i == 0 or (ts_us[i - 1] is not None and t > ts_us[i - 1]):
                ts_us[i] = t
                changed = True
        if changed:
            state.update(tuple(ts_us))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    **{
                        f"t_{i + 1}": [
                            pd.Timestamp(ts_us[i], unit="us")
                            if ts_us[i] is not None
                            else pd.NaT
                        ]
                        for i in range(k)
                    },
                }
            )

    return fold, _schemas(k)


def streaming_funnel(
    events: DataFrame, steps: Sequence[str] = DEFAULT_STEPS
) -> DataFrame:
    """events stream → per-user funnel-step emissions; latest emission
    per user is the current funnel state."""
    fold, (out_schema, state_schema) = make_funnel_fold(steps)
    return events.groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
