"""Streaming crawl-state merge — the streaming twin of
`operators/crawl.crawl_state_merge` (r13): the cycle's WRITE half as a
continuously-maintained state store instead of a per-cycle full-outer
join.

Fetch results stream in from the fetcher fleet; the crawl state (url →
last_crawled, fingerprint) lives in the state store, keyed by URL, and
each arriving result folds in under the batch operator's exact rules:

- fetched ok (non-NULL date) → the state row advances (``updated``, or
  ``inserted`` when the URL had none);
- fetch failed / ok-with-NULL-date → the state row carries UNCHANGED
  (``carried``; a malformed log row must not destroy bookkeeping);
- failed FIRST fetch → no state row is created and nothing is emitted
  (the URL was never crawled — inventing a row would mask it from the
  next delta's ``new`` classification).

One emission per observed (url, fetch) with the post-merge row and its
``merge_action`` — the same audit column the batch operator emits.
State URLs the stream never observes simply stay in the store (batch
``carried``); they produce no emission because nothing happened to
them.

Bootstrap contract: the state snapshot is streamed IN ahead of the
fetch results as ``kind = 0`` seed rows (PySpark's
`applyInPandasWithState` has no initial-state hook), and a seed row
only installs state when none exists — in production the store is
simply the surviving state of the previous cycle and seeds are a
first-cycle backfill. Within a micro-batch rows fold in (kind, order)
order, seeds first, so parity with the batch merge is exact across any
slice boundary (pinned by the two-slice pytest replay).

At 100 TB: state is (date, fingerprint) per URL — the same frame the
batch merge materializes as a table, held by the store; page bodies
never enter the shuffle, and the URL key matches `recrawl_delta`'s
join key, so the store IS the bucketed state table of the batch cycle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_MERGE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("last_crawled", T.StringType()),
        T.StructField("fp", T.StringType()),
        T.StructField("merge_action", T.StringType()),
    ]
)

STATE_MERGE_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_crawled", T.StringType()),
        T.StructField("fp", T.StringType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (url,) = key
    rows: list[tuple[int, int, str | None, str | None, bool | None]] = []
    for pdf in pdfs:
        if len(pdf):
            rows.extend(
                (
                    int(k),
                    int(o),
                    None if d is None or pd.isna(d) else str(d),
                    None if fp is None or pd.isna(fp) else str(fp),
                    None if ok is None or pd.isna(ok) else bool(ok),
                )
                for k, o, d, fp, ok in zip(
                    pdf["kind"], pdf["order"], pdf["fetch_date"],
                    pdf["fp"], pdf["ok"],
                )
            )
    if not rows:
        return
    cur = state.get if state.exists else None
    out: list[tuple[str, str | None, str | None, str]] = []
    for kind, _, date, fp, ok in sorted(rows, key=lambda r: (r[0], r[1])):
        if kind == 0:
            # state-snapshot seed: installs only when no state exists.
            # A NULL-date seed is skipped — the batch merge's final
            # `last_crawled IS NOT NULL` filter means no merge-produced
            # state table can carry one, and installing it would emit
            # NULL-date 'carried' rows batch parity filters out
            if cur is None and date is not None:
                cur = (date, fp)
            continue
        ok_eff = bool(ok) and date is not None
        if cur is None:
            if not ok_eff:
                continue  # failed first fetch: no row, no emission
            cur = (date, fp)
            out.append((url, date, fp, "inserted"))
        elif ok_eff:
            cur = (date, fp)
            out.append((url, date, fp, "updated"))
        else:
            out.append((url, cur[0], cur[1], "carried"))
    if cur is not None:
        state.update(tuple(cur))
    if out:
        yield pd.DataFrame(
            out, columns=["url", "last_crawled", "fp", "merge_action"]
        )


def state_merge_stream(
    merged_stream: DataFrame,
    url_col: str = "url",
    kind_col: str = "kind",
    order_col: str = "order",
    date_col: str = "fetch_date",
    fp_col: str = "fp",
    ok_col: str = "ok",
) -> DataFrame:
    """Maintain the crawl-state store online from a stream of seed
    (kind 0) and fetch-result (kind 1) rows: one (url, post-merge row,
    merge_action) emission per observed fetch (append mode)."""
    slim = merged_stream.select(
        F.col(url_col).alias("url"),
        F.col(kind_col).cast("int").alias("kind"),
        F.col(order_col).cast("long").alias("order"),
        F.col(date_col).cast("string").alias("fetch_date"),
        F.col(fp_col).cast("string").alias("fp"),
        F.col(ok_col).cast("boolean").alias("ok"),
    )
    return slim.groupBy("url").applyInPandasWithState(
        _update,
        outputStructType=STATE_MERGE_OUT_SCHEMA,
        stateStructType=STATE_MERGE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
