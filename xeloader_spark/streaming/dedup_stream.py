"""Streaming incremental dedup (the lineage-digest snapshot as state).

The streaming twin of `operators.dedup.incremental_dedup` (VERDICT r2
next-round #6): the batch operator checks a new ingest batch digest-only
against a snapshot table; here the snapshot IS the operator state. The
stream is keyed by content digest, so per-key state is a single row (the
keeper's doc id) — exactly one state row per distinct document content,
the same cardinality as the batch snapshot side-table, and only digests
ever enter the shuffle (documents are reduced to md5 before the groupBy).

Status semantics mirror the batch operator row for row:
- ``dup_in_snapshot``: this digest was kept in an EARLIER micro-batch
  (batch analogue: digest present in the snapshot table);
- ``dup_in_batch``: a smaller doc_id in the SAME micro-batch has this
  content (batch analogue: in-batch keeper window rank > 1);
- ``keep``: first sighting — the row whose digest the snapshot absorbs.

Because the keeper rule (min id, first batch wins) is deterministic and
state transitions commute with micro-batch boundaries ONLY through the
arrival order, parity with the batch operator is pinned under ordered
file arrival (`tests/test_streaming.py`), the same contract shape as the
funnel and upsert twins.

Bootstrapping an existing snapshot: feed the snapshot's (doc_id, text)
keepers through the stream first (or a digest-bearing seed file) — their
emissions are 'keep' rows that load the state; subsequent batches then
dedup against them. At 100 TB the state store holds one digest row per
distinct content — RocksDB-backed state in production, identical to the
snapshot table the batch path maintains.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("keeper_doc_id", T.LongType()),
    ]
)

# one row per distinct digest: the keeper's id
DEDUP_STATE_SCHEMA = T.StructType([T.StructField("keeper_id", T.LongType())])


def _dedup_digest(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (digest,) = key
    ids: list[int] = []
    for pdf in pdfs:
        ids.extend(int(v) for v in pdf["doc_id"])
    ids.sort()
    if state.exists:
        (keeper,) = state.get
        statuses = ["dup_in_snapshot"] * len(ids)
    else:
        keeper = ids[0]
        state.update((keeper,))
        statuses = ["keep"] + ["dup_in_batch"] * (len(ids) - 1)
    yield pd.DataFrame(
        {
            "doc_id": ids,
            "digest": [digest] * len(ids),
            "status": statuses,
            "keeper_doc_id": [keeper] * len(ids),
        }
    )


def streaming_incremental_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """documents stream → per-doc dedup verdicts with O(1) state per
    distinct digest. Append mode: each verdict is an immutable fact about
    the batch it arrived in."""
    keyed = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.col(text_col)).alias("digest"),
    )
    return keyed.groupBy("digest").applyInPandasWithState(
        _dedup_digest,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
