"""Streaming revisit policy (per-URL change-rate state, r11).

The streaming twin of `operators/crawl.revisit_policy`: visit
observations (url, visit_idx, fp) arrive continuously from the fetch
pipeline, and the crawler wants each URL's CURRENT revisit interval
without replaying its history. State per URL is exactly the batch
aggregate's sufficient statistic — (last_fp, n_visits, n_changes),
three slim fields — updated by comparing each arriving fingerprint to
the stored one; the emitted interval applies the SAME integer formula
as the batch operator (base·(n_visits−1) DIV max(n_changes,1), clamped
into [min_s, max_s]; Python's // equals Spark's DIV on the non-negative
counters involved), so the twin's output for a URL after its k-th visit
is bit-identical to batch `revisit_policy` over those k visits —
including NULL fingerprints, which follow the batch window's SQL
three-valued comparison (a NULL on either side of ``fp != lag`` is
never a counted change; the visit still counts toward n_visits).

Parity contract (the `frontier_stream`/`dedup_stream` discipline):
visits for a URL must arrive in visit order ACROSS micro-batches (a
fetch log is naturally append-ordered); within a micro-batch rows are
sorted by visit_idx before folding, mirroring the batch lag window's
ORDER BY. Out-of-order cross-batch arrival would need a
watermark+buffer variant — a different operator contract, same
reasoning as the frontier twin's documented NoTimeout decision.

Each micro-batch emits ONE row per URL it touched (append mode), with
cumulative counters — the latest emission per URL (max n_visits) IS the
batch result over the visits seen so far; pytest pins that equality
across a two-slice replay.

At 100 TB: state is ~3 fields per TRACKED URL (RocksDB-sized like the
frontier's admission store); fingerprints are whatever ingest already
computed (`doc_fingerprint`), so page content never enters the state
store or the shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

REVISIT_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_visits", T.LongType()),
        T.StructField("n_changes", T.LongType()),
        T.StructField("revisit_interval_s", T.LongType()),
    ]
)

REVISIT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_fp", T.StringType()),
        T.StructField("n_visits", T.LongType()),
        T.StructField("n_changes", T.LongType()),
    ]
)


def _make_update(base_s: int, min_s: int, max_s: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (url,) = key
        rows: list[tuple[int, str | None]] = []
        for pdf in pdfs:
            if len(pdf):
                rows.extend(
                    (int(i), None if pd.isna(f) else str(f))
                    for i, f in zip(pdf["visit_idx"], pdf["fp"])
                )
        if not rows:
            return
        if state.exists:
            last_fp, nv, nc = state.get
        else:
            last_fp, nv, nc = None, 0, 0
        # in-batch sort mirrors the batch lag window's ORDER BY (key
        # only — fp is not a tie-break and may be None)
        for _, fp in sorted(rows, key=lambda r: r[0]):
            # batch parity on NULL fps (ADVICE r11 #2): the batch
            # (fp != lag) is SQL three-valued — a NULL on EITHER side
            # yields NULL, which SUM skips — so a NULL fingerprint
            # never counts as a change here either (the r11 str(f)
            # coercion made it the literal 'None' and counted it)
            if nv > 0 and fp is not None and last_fp is not None and fp != last_fp:
                nc += 1
            nv += 1
            last_fp = fp
        state.update((last_fp, nv, nc))
        if nv < 2:
            interval = base_s
        else:
            interval = min(max_s, max(min_s, base_s * (nv - 1) // max(nc, 1)))
        yield pd.DataFrame(
            {
                "url": [url],
                "n_visits": [nv],
                "n_changes": [nc],
                "revisit_interval_s": [interval],
            }
        )

    return _update


def revisit_stream(
    visits: DataFrame,
    url_col: str = "url",
    order_col: str = "visit_idx",
    fp_col: str = "fp",
    base_s: int = 86_400,
    min_s: int = 3_600,
    max_s: int = 2_592_000,
) -> DataFrame:
    """Maintain each URL's change-rate revisit interval online: one
    cumulative (url, n_visits, n_changes, revisit_interval_s) row per
    URL per micro-batch that observed it."""
    slim = visits.select(
        F.col(url_col).alias("url"),
        F.col(order_col).cast("long").alias("visit_idx"),
        F.col(fp_col).alias("fp"),
    )
    return slim.groupBy("url").applyInPandasWithState(
        _make_update(int(base_s), int(min_s), int(max_s)),
        outputStructType=REVISIT_OUT_SCHEMA,
        stateStructType=REVISIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
