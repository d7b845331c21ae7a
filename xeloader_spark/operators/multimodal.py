"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched `mapInPandas`.

The Spark-side contract (schemas, partitioning, batch shapes, UDF
signatures) is real and tested; the codec step itself is STUBBED — the
runtime has no image/audio libraries — behind `_decode_image_real`, which
raises NotImplementedError unless a decoder import succeeds. The
deterministic fake keeps the pipeline end-to-end testable: features derive
from the payload bytes, so results are reproducible.

Scale notes: payloads never hit the driver; `mapInPandas` streams Arrow
batches through Python with bounded memory
(`spark.sql.execution.arrow.maxRecordsPerBatch` is the batch-size knob —
lower it for multi-MB payloads); frame sampling is a generator, so one
input row → N output rows without materializing all frames in memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from the documents fixture: payload bytes are
    md5-derived (deterministic fake of an encoded image), metadata typed."""
    payload = F.unhex(F.concat(F.md5(F.col(text_col)), F.md5(F.concat(F.lit("x"), F.col(text_col)))))
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("fake/png").alias("format"),
            (F.length(text_col) % 640 + 16).cast("int").alias("width"),
            (F.length(text_col) % 480 + 16).cast("int").alias("height"),
            (F.length(text_col) % 8 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def _decode_image_real(payload: bytes) -> list[float]:
    """The real decode path — requires an image library, absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires Pillow/opencv; not available in this "
            "runtime — use deterministic_features (fake) or install a codec"
        ) from exc
    raise NotImplementedError("real decoder wiring goes here")


def deterministic_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'embedding' of a payload: byte-windowed means.
    Stands in for decode→resize→model-forward so the distributed plumbing
    is exercised with stable outputs."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    step = max(len(payload) // dim, 1)
    feats = []
    for i in range(dim):
        window = payload[i * step : (i + 1) * step] or payload[-step:]
        feats.append(sum(window) / (255.0 * len(window)))
    return feats


def extract_features(media_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Image feature extraction over `mapInPandas`: one Arrow batch in,
    one out; columns pruned to what the UDF needs before the Python
    boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_real(p) if use_real_decoder else deterministic_features(p)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": [m["format"] for m in pdf["meta"]],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return media_df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(media_df: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one input row expands to ceil(n_frames/every)
    frame rows; frame payloads are byte slices of the source payload
    (stub for a real demuxer). Generator-based — no full-frame-list
    materialization per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_payload = [], [], []
            for _, row in pdf.iterrows():
                n = int(row["meta"]["n_frames"])
                payload = row["payload"] or b""
                for fi in range(0, n, every):
                    sl = payload[fi % max(len(payload), 1) :][:8]
                    out_ids.append(row["media_id"])
                    out_idx.append(fi)
                    out_payload.append(sl)
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_index": out_idx,
                    "frame_payload": out_payload,
                }
            )

    return media_df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )
