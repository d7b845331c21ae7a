"""Streaming host backoff — the streaming twin of
`operators/crawl.host_backoff` (r12).

Fetch results stream in from the fetcher fleet, and the politeness
scheduler wants each host's CURRENT backoff factor without replaying the
log: state per host is exactly the batch operator's sufficient
statistic — (n_fetches, n_errors, trailing_failures, retry_after_s),
four slim fields — folded per arriving row (an error extends the
trailing run, a success resets it AND spends any pending Retry-After
mandate; 429/503 responses raise the running Retry-After max until the
next success clears it). The emitted factor applies the SAME bounded
power-of-two ladder as the batch operator
(`operators/crawl.backoff_factor_sql`'s semantics in Python:
2^min(trailing, max_level) — integer-exact), so the twin's output for a
host after its k-th fetch is bit-identical to batch `host_backoff` over
those k log rows.

Parity contract (the `revisit_stream` discipline): a host's fetches
must arrive in fetch order ACROSS micro-batches (a fetch log is
naturally append-ordered); within a micro-batch rows are sorted by
fetch_idx before folding, mirroring the batch operator's
max-idx-where-ok aggregate. pytest pins the two-slice replay equality.

At 100 TB: state is 4 counters per ACTIVE host (host-dimension, like
the frontier's admission store); response bodies never enter the state
store — only (host, idx, status, retry_after) reaches the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

BACKOFF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("trailing_failures", T.LongType()),
        T.StructField("backoff_factor", T.LongType()),
        T.StructField("retry_after_s", T.LongType()),
    ]
)

BACKOFF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("trailing", T.LongType()),
        T.StructField("retry_after", T.LongType()),
    ]
)


def _make_update(max_level: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        rows: list[tuple[int, int, int | None]] = []
        for pdf in pdfs:
            if len(pdf):
                rows.extend(
                    (
                        int(i),
                        int(st),
                        None if pd.isna(ra) else int(ra),
                    )
                    for i, st, ra in zip(
                        pdf["fetch_idx"], pdf["status"], pdf["retry_after"]
                    )
                )
        if not rows:
            return
        if state.exists:
            n, errors, trailing, retry_after = state.get
        else:
            n, errors, trailing, retry_after = 0, 0, 0, None
        for _, status, ra in sorted(rows, key=lambda r: r[0]):
            err = status == 429 or status >= 500
            n += 1
            if err:
                errors += 1
                trailing += 1
            else:
                # a success both ends the trailing run AND spends any
                # pending Retry-After mandate (RFC 9110: it governs the
                # next request, not the host forever) — batch parity
                trailing = 0
                retry_after = None
            if status in (429, 503) and ra is not None:
                retry_after = ra if retry_after is None else max(retry_after, ra)
        state.update((n, errors, trailing, retry_after))
        factor = 2 ** min(trailing, max_level)
        yield pd.DataFrame(
            {
                "host": [host],
                "n_fetches": [n],
                "n_errors": [errors],
                "trailing_failures": [trailing],
                "backoff_factor": [factor],
                "retry_after_s": [retry_after],
            }
        )

    return _update


def backoff_stream(
    fetch_log: DataFrame,
    host_col: str = "host",
    order_col: str = "fetch_idx",
    status_col: str = "status",
    retry_after_col: str = "retry_after",
    max_level: int = 3,
) -> DataFrame:
    """Maintain each host's backoff state online: one cumulative
    (host, counters, factor, retry_after_s) row per host per
    micro-batch that observed it (append mode)."""
    slim = fetch_log.select(
        F.col(host_col).alias("host"),
        F.col(order_col).cast("long").alias("fetch_idx"),
        F.col(status_col).cast("int").alias("status"),
        F.col(retry_after_col).cast("long").alias("retry_after"),
    )
    return slim.groupBy("host").applyInPandasWithState(
        _make_update(int(max_level)),
        outputStructType=BACKOFF_OUT_SCHEMA,
        stateStructType=BACKOFF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
