"""Streaming boilerplate (hot header digest) detection — the streaming
twin of `operators.text.boilerplate_prefix`'s df counting.

A corpus-cleaning service that ingests documents continuously cannot
re-scan the corpus to learn which headers are boilerplate; the document
frequency per prefix digest IS natural stream state. The stream is keyed
by the prefix digest, so per-key state is a single running count — one
row per DISTINCT header, the same cardinality as the batch df aggregate,
and only 32-byte digests enter the shuffle (documents collapse to their
digest in a projection before the groupBy).

Each micro-batch emits one row per digest it touched:
``(prefix_digest, df_total, n_in_batch)`` — the cumulative document
frequency after the batch and the batch's contribution. Because counting
is additive, the LAST emission per digest equals the batch operator's
``prefix_df`` regardless of how arrival slices the corpus; parity is
pinned on exactly that reduction in `tests/test_streaming.py`. A
downstream cleaner flags a digest the moment ``df_total >= min_df`` and
starts stripping that header from subsequent arrivals — the streaming
analogue of the batch flag.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.text import _tok_array

BOILER_OUT_SCHEMA = T.StructType(
    [
        T.StructField("prefix_digest", T.StringType()),
        T.StructField("df_total", T.LongType()),
        T.StructField("n_in_batch", T.LongType()),
    ]
)

# one row per distinct prefix digest: the running document frequency
BOILER_STATE_SCHEMA = T.StructType([T.StructField("n", T.LongType())])


def _digest_count(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (digest,) = key
    n_new = sum(len(pdf) for pdf in pdfs)
    total = (state.get[0] if state.exists else 0) + n_new
    state.update((total,))
    yield pd.DataFrame(
        {
            "prefix_digest": [digest],
            "df_total": [total],
            "n_in_batch": [n_new],
        }
    )


def streaming_boilerplate_counts(
    docs: DataFrame,
    prefix_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """documents stream → running df per prefix digest with O(1) state
    per distinct header. Append mode: every emission is an immutable
    fact about the batch that produced it."""
    toks = _tok_array(text_col)
    keyed = docs.select(
        F.md5(
            F.expr(f"array_join(slice({toks}, 1, {prefix_len}), ' ')")
        ).alias("prefix_digest")
    )
    return keyed.groupBy("prefix_digest").applyInPandasWithState(
        _digest_count,
        outputStructType=BOILER_OUT_SCHEMA,
        stateStructType=BOILER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
