"""Streaming robots-cache policy — the streaming twin of
`operators/crawl.robots_cache_policy` (r13, VERDICT r12 #6: the third
ops rail gets the twin the other two already have).

robots.txt fetch attempts stream in from the fetcher fleet, and the
frontier wants each host's CURRENT access class (use_robots /
allow_all / use_cached / disallow_all) and freshness verdict without
replaying the attempt log: state per host is exactly the batch
operator's sufficient statistic — (last_success_at, last_definitive_at,
last_status, last_fetched_at), four slim fields — folded per arriving
row. A 2xx or 304 advances the success clock (304 is the
conditional-GET revalidation: the server confirming the cached copy
refreshes the cache clock without a body); a 4xx advances only the
definitive clock (RFC 9309 §2.3.1.3 "unavailable" is cacheable
knowledge); 5xx/0 and unfollowed 3xx advance nothing (non-answers).
The emitted classification applies the SAME CASE ladder as the batch
operator against the caller's fixed ``now_s`` (no engine clock — the
determinism rule), so the twin's output for a host after its k-th
attempt is bit-identical to batch `robots_cache_policy` over those k
log rows.

Parity contract (the `backoff_stream` discipline): a host's attempts
must arrive in fetched_at order ACROSS micro-batches (a fetch log is
naturally append-ordered); within a micro-batch rows are sorted by
fetched_at before folding, mirroring the batch operator's conditional
max aggregates + max_by. pytest pins the two-slice replay equality.

At 100 TB: state is 4 integers per ACTIVE host (host-dimension, like
the backoff store); robots.txt bodies never enter the state store —
only (host, fetched_at_s, status) reaches the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ROBOTS_CACHE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("last_status", T.IntegerType()),
        T.StructField("last_success_at", T.LongType()),
        T.StructField("age_s", T.LongType()),
        T.StructField("access_class", T.StringType()),
        T.StructField("refetch_due", T.BooleanType()),
    ]
)

ROBOTS_CACHE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_success", T.LongType()),
        T.StructField("last_definitive", T.LongType()),
        T.StructField("last_status", T.LongType()),
        T.StructField("last_fetched", T.LongType()),
    ]
)


def _classify(
    last_status: int | None,
    last_success: int | None,
    last_definitive: int | None,
    now_s: int,
    max_age_s: int,
) -> tuple[str, bool, int | None]:
    """The batch CASE ladder in Python — shared by every emission so
    the twin can't drift from itself (the batch twin is pinned by the
    parity test)."""
    if last_status is not None and (
        200 <= last_status < 300 or last_status == 304
    ):
        cls = "use_robots"
    elif last_status is not None and 400 <= last_status < 500:
        cls = "allow_all"
    elif last_success is not None:
        cls = "use_cached"
    else:
        cls = "disallow_all"
    due = last_definitive is None or now_s - last_definitive > max_age_s
    age = None if last_definitive is None else now_s - last_definitive
    return cls, due, age


def _make_update(now_s: int, max_age_s: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        rows: list[tuple[int, int]] = []
        for pdf in pdfs:
            if len(pdf):
                rows.extend(
                    (int(t), int(st))
                    for t, st in zip(pdf["fetched_at_s"], pdf["status"])
                )
        if not rows:
            return
        if state.exists:
            last_success, last_definitive, last_status, last_fetched = (
                state.get
            )
        else:
            last_success = last_definitive = last_status = None
            last_fetched = None
        # every clock folds as a conditional MAX (not a bare assign), so
        # the state matches the batch aggregates even if a row arrives
        # late relative to state already folded in an earlier batch —
        # the in-order contract is for EMISSION equivalence, the clocks
        # themselves are order-insensitive
        for t, status in sorted(rows):
            success = 200 <= status < 300 or status == 304
            definitive = success or 400 <= status < 500
            if success and (last_success is None or t > last_success):
                last_success = t
            if definitive and (last_definitive is None or t > last_definitive):
                last_definitive = t
            if last_fetched is None or t > last_fetched:
                last_fetched, last_status = t, status
        state.update((last_success, last_definitive, last_status, last_fetched))
        cls, due, age = _classify(
            last_status, last_success, last_definitive, now_s, max_age_s
        )
        yield pd.DataFrame(
            {
                "host": [host],
                "last_status": pd.array([last_status], dtype="Int32"),
                "last_success_at": pd.array([last_success], dtype="Int64"),
                "age_s": pd.array([age], dtype="Int64"),
                "access_class": [cls],
                "refetch_due": [due],
            }
        )

    return _update


def robots_cache_stream(
    robots_fetches: DataFrame,
    now_s: int,
    host_col: str = "host",
    fetched_col: str = "fetched_at_s",
    status_col: str = "status",
    max_age_s: int = 86_400,
) -> DataFrame:
    """Maintain each host's robots-cache policy online: one cumulative
    (host, last_status, last_success_at, age_s, access_class,
    refetch_due) row per host per micro-batch that observed it
    (append mode)."""
    slim = robots_fetches.select(
        F.col(host_col).alias("host"),
        F.col(fetched_col).cast("long").alias("fetched_at_s"),
        F.col(status_col).cast("int").alias("status"),
    )
    return slim.groupBy("host").applyInPandasWithState(
        _make_update(int(now_s), int(max_age_s)),
        outputStructType=ROBOTS_CACHE_OUT_SCHEMA,
        stateStructType=ROBOTS_CACHE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
