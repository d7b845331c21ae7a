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
from pyspark.sql import DataFrame, Window
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

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
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
    """Compressed-format decode path — requires an image library, absent
    here (kept as the honest stub for png/jpeg payloads)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "image decoding requires Pillow/opencv; not available in this "
            "runtime — use deterministic_features (fake) or install a codec"
        ) from exc
    raise NotImplementedError("real decoder wiring goes here")


# ------------------------------------------------ pluggable codecs
#
# Decoders are a registry keyed by `meta.format`: each takes the payload
# bytes and returns the feature vector. Compressed formats (png/jpeg)
# dispatch to the library-backed stub above; `image/ppm` is a REAL codec —
# a pure-python parse of the binary NetPBM P6 format (public spec:
# magic, whitespace-separated width/height/maxval header, raw RGB
# samples) — so `use_real_decoder=True` has a fully tested path with no
# external libraries.


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """Binary PPM (P6) encoder — test/builder inverse of `decode_ppm`."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"P6 {width}x{height} needs {width * height * 3} RGB bytes, "
            f"got {len(pixels)}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(payload: bytes) -> dict:
    """Parse a binary PPM (P6) image → {width, height, maxval, pixels}.
    Strict: bad magic, short pixel data, or maxval > 255 raise ValueError
    (a codec that guesses is worse than one that fails)."""
    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = magic + 3 whitespace-separated ints; comments (#) allowed
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval, then raw samples
    width, height, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    pixels = payload[i : i + width * height * 3]
    if len(pixels) != width * height * 3:
        raise ValueError("PPM pixel data shorter than header promises")
    return {"width": width, "height": height, "maxval": maxval, "pixels": pixels}


def _ppm_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real-decode features: parse the P6 container, then byte-window
    means over the DECODED pixel buffer (not the container bytes — the
    header must be stripped by a real parse for these to come out right).
    """
    return deterministic_features(decode_ppm(payload)["pixels"], dim)


def encode_wav(samples: bytes, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE encoder: mono 16-bit PCM (public container spec:
    RIFF size header, `fmt ` chunk, `data` chunk). Test/builder inverse
    of `decode_wav`; `samples` is raw little-endian int16 PCM."""
    import struct

    if len(samples) % 2:
        raise ValueError("16-bit PCM needs an even byte count")
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(samples))
        + b"WAVE"
        + b"fmt "
        + fmt
        + b"data"
        + struct.pack("<I", len(samples))
        + samples
    )


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container → {sample_rate, n_channels, bits,
    samples}. A REAL chunk-walking parse (word-aligned chunk sizes,
    fmt/data located by id, not offset) restricted to mono/stereo 16-bit
    PCM; anything else raises ValueError — a codec that guesses is worse
    than one that fails."""
    import struct

    if (
        payload is None
        or len(payload) < 44
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = None
    i = 12
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAVE chunk")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt /data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError("only 16-bit PCM WAVE is supported")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {
        "sample_rate": rate,
        "n_channels": channels,
        "bits": bits,
        "samples": samples,
    }


def _wav_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real-decode audio features over the DECODED int16 samples (header
    must be chunk-walked off for these to come out right): count, rate,
    mean, min, max, peak, zero-crossings, mean energy — all exact integer
    sums + one IEEE division each, so an SQL oracle can replay them from
    the payload hex."""
    w = decode_wav(payload)
    s = w["samples"]
    if not s:
        return [0.0] * dim
    n = len(s)
    zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
    return [
        float(n),
        float(w["sample_rate"]),
        sum(s) / n,
        float(min(s)),
        float(max(s)),
        float(max(abs(x) for x in s)),
        float(zc),
        sum(x * x for x in s) / n,
    ][:dim]


DECODERS: dict[str, object] = {
    "image/ppm": _ppm_features,
    "audio/wav": _wav_features,
    "image/png": _decode_image_real,
    "image/jpeg": _decode_image_real,
}


def register_decoder(fmt: str, fn) -> None:
    """Plug in a decoder for a format: fn(payload: bytes) -> list[float]."""
    DECODERS[fmt] = fn


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


def attach_ppm_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table of REAL encoded images: a 4×2 binary PPM whose
    24 RGB bytes derive from md5(text) — a valid image any PPM reader
    decodes, yet fully replayable in SQL (header is a fixed 11-byte
    prefix, pixels are hex-derived). Exercises the real-codec path
    end-to-end with exact oracles."""
    pixels_hex = F.concat(
        F.md5(F.col(text_col)),
        F.substring(F.md5(F.concat(F.lit("x"), F.col(text_col))), 1, 16),
    )
    payload = F.concat(
        F.encode(F.lit("P6\n4 2\n255\n"), "UTF-8"), F.unhex(pixels_hex)
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/ppm").alias("format"),
            F.lit(4).cast("int").alias("width"),
            F.lit(2).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def attach_ppm_media_wide(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """8×2 variant of `attach_ppm_media` (48 RGB bytes from three
    md5 draws) — 16 pixels so the perceptual hash has 16 bits, enough
    for pigeonhole Hamming blocking to be a real (2×8-bit block) join
    rather than a degenerate one."""
    pixels_hex = F.concat(
        F.md5(F.col(text_col)),
        F.md5(F.concat(F.lit("x"), F.col(text_col))),
        F.md5(F.concat(F.lit("y"), F.col(text_col))),
    )
    payload = F.concat(
        F.encode(F.lit("P6\n8 2\n255\n"), "UTF-8"), F.unhex(pixels_hex)
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/ppm").alias("format"),
            F.lit(8).cast("int").alias("width"),
            F.lit(2).cast("int").alias("height"),
            F.lit(1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


_WAV_RATE = 8000


def attach_wav_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table of REAL encoded audio: a RIFF/WAVE mono 16-bit
    PCM clip whose 8 samples (16 data bytes) derive from md5(text) — a
    valid file any WAV reader decodes, yet fully replayable in SQL (the
    44-byte header is a constant for fixed length/rate, samples are
    hex-derived int16 LE). meta reuses the typed fields: width=sample
    rate, height=bits, n_frames=samples."""
    header_hex = encode_wav(b"\x00" * 16, _WAV_RATE)[:44].hex()
    payload = F.concat(
        F.unhex(F.lit(header_hex)), F.unhex(F.md5(F.col(text_col)))
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("format"),
            F.lit(_WAV_RATE).cast("int").alias("width"),
            F.lit(16).cast("int").alias("height"),
            F.lit(8).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def extract_features(media_df: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Image feature extraction over `mapInPandas`: one Arrow batch in,
    one out; columns pruned to what the UDF needs before the Python
    boundary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode(payload: bytes, fmt: str) -> list[float]:
            if not use_real_decoder:
                return deterministic_features(payload)
            dec = DECODERS.get(fmt)
            if dec is None:
                raise NotImplementedError(f"no decoder registered for {fmt!r}")
            return dec(payload)

        for pdf in batches:
            feats = [
                decode(p, m["format"])
                for p, m in zip(pdf["payload"], pdf["meta"])
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


def resize_media(media_df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL image resize: decode the PPM container, nearest-neighbor
    sample the pixel grid (src index = floor(dst·src_dim/dst_dim) — the
    standard NN mapping), re-encode. Decode→transform→encode is the whole
    multimodal hot path in one operator; pixel gathers are numpy index
    ops (`np.ix_` fancy indexing), not per-pixel python. Payloads stream
    through Arrow batches; nothing touches the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        xi_cache: dict[tuple[int, int], np.ndarray] = {}

        def grid(src: int, dst: int) -> "np.ndarray":
            key = (src, dst)
            if key not in xi_cache:
                xi_cache[key] = (np.arange(dst) * src) // dst
            return xi_cache[key]

        for pdf in batches:
            out = []
            for payload in pdf["payload"]:
                img = decode_ppm(payload)
                w, h = img["width"], img["height"]
                arr = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(
                    h, w, 3
                )
                resized = arr[np.ix_(grid(h, out_h), grid(w, out_w))]
                out.append(encode_ppm(out_w, out_h, resized.tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "payload": out,
                }
            )

    return media_df.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def sample_frames(media_df: DataFrame, every: int = 2) -> DataFrame:
    """Video frame sampling: one input row expands to ceil(n_frames/every)
    frame rows; frame payloads are byte slices of the source payload
    (stub for a real demuxer). Generator-based — no full-frame-list
    materialization per row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized row→frames explosion: frame counts → np.repeat for
            # ids, concatenated aranges for indices (frame explosion is the
            # hot loop for video — no per-row python iteration)
            ids = pdf["media_id"].to_numpy()
            counts = np.array(
                [(int(m["n_frames"]) + every - 1) // every for m in pdf["meta"]],
                dtype=np.int64,
            )
            out_ids = np.repeat(ids, counts)
            out_idx = (
                np.concatenate([np.arange(c) * every for c in counts])
                if len(counts)
                else np.array([], dtype=np.int64)
            )
            payloads = pdf["payload"].to_numpy()
            row_of = np.repeat(np.arange(len(ids)), counts)
            out_payload = [
                (payloads[r] or b"")[fi % max(len(payloads[r] or b""), 1):][:8]
                for r, fi in zip(row_of, out_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": out_ids,
                    "frame_index": out_idx.astype("int32"),
                    "frame_payload": out_payload,
                }
            )

    return media_df.select("media_id", "payload", "meta").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


def shot_boundaries(frames_df: DataFrame, threshold: int = 256) -> DataFrame:
    """Shot-boundary detection over demuxed frames: per-frame intensity
    (byte sum of the frame payload) compared against the previous
    sampled frame of the same media; a jump of at least `threshold`
    marks a cut, and the first frame always opens a shot. Output:
    (media_id, frame_index, intensity, delta, is_boundary).

    The intensity metric here is the byte sum of the fake demuxer's
    frame slices; with a real codec, register a decoder and swap the
    intensity expression for a luma histogram distance — the windowed
    comparison (the actual Spark operator) is unchanged. Scale shape:
    frames collapse to slim (media, index, intensity) rows in a
    projection, then ONE window shuffle keyed by media_id; payload
    bytes never enter the exchange."""
    slim = frames_df.select(
        "media_id",
        "frame_index",
        F.lower(F.hex("frame_payload")).alias("fh"),
    ).select(
        "media_id",
        "frame_index",
        F.expr(
            "aggregate(transform("
            "sequence(0, CAST(length(fh) / 2 AS INT) - 1), "
            "j -> CAST(conv(substring(fh, j * 2 + 1, 2), 16, 10) AS BIGINT)"
            "), 0L, (a, v) -> a + v)"
        ).alias("intensity"),
    )
    w = Window.partitionBy("media_id").orderBy("frame_index")
    prev = F.lag("intensity").over(w)
    delta = F.abs(F.col("intensity") - prev)
    return slim.select(
        "media_id",
        "frame_index",
        "intensity",
        delta.alias("delta"),
        (prev.isNull() | (delta >= threshold)).alias("is_boundary"),
    )


def decimate_audio(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio downsample: chunk-walk the RIFF/WAVE container, keep
    every `factor`-th PCM sample (decimation — the resample strategy
    that needs no filter arithmetic, so it stays byte-exact), re-encode
    at rate/factor. The audio twin of `resize_media`'s
    decode→transform→encode path; payloads stream through Arrow
    batches, nothing touches the driver. Returns (media_id,
    sample_rate, n_samples, payload)."""
    import struct

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, rates, counts = [], [], []
            for payload in pdf["payload"]:
                w = decode_wav(bytes(payload))
                s = w["samples"][::factor]
                rate = w["sample_rate"] // factor
                payloads.append(
                    encode_wav(struct.pack(f"<{len(s)}h", *s), rate)
                )
                rates.append(rate)
                counts.append(len(s))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rates,
                    "n_samples": counts,
                    "payload": payloads,
                }
            )

    return media_df.select("media_id", "payload").mapInPandas(
        run, schema=out_schema
    )


# ------------------------------------------------- perceptual hashing

_LUMA_R, _LUMA_G, _LUMA_B = 299, 587, 114  # ITU-R BT.601 × 1000


def ahash_core(pixels: bytes, n_px: int) -> tuple[int, int]:
    """Average-hash over decoded RGB pixels: integer BT.601 luma per
    pixel (299r+587g+114b — the real aHash recipe kept in integers so
    the threshold is exact), bit i set iff luma_i · n > Σ luma (strict
    cross-multiplied mean compare, no division), packed MSB-first in
    pixel order. Returns (hash, luma_total)."""
    lumas = [
        _LUMA_R * pixels[3 * i]
        + _LUMA_G * pixels[3 * i + 1]
        + _LUMA_B * pixels[3 * i + 2]
        for i in range(n_px)
    ]
    total = sum(lumas)
    h = 0
    for i, lum in enumerate(lumas):
        if lum * n_px > total:
            h |= 1 << (n_px - 1 - i)
    return h, total


def perceptual_hash(media_df: DataFrame) -> DataFrame:
    """Per-image average-hash (aHash — the classic perceptual-dedup
    fingerprint: near-identical images differ in few bits, so Hamming
    blocking finds visual near-dups without pairwise pixel compares).

    Real-decode path like `extract_features(use_real_decoder=True)`:
    the P6 container is PARSED (header stripped by the strict codec),
    then hashed over decoded pixels — all integer, so a SQL oracle
    replays luma, threshold, and packing bit-for-bit from the pixel hex.

    Scale shape: one `mapInPandas` pass over pruned (media_id, payload)
    Arrow batches — payloads never shuffle, output is one (id, int)
    row per image. Downstream near-dup via `dedup.hamming_neardup`
    pigeonhole blocking on the hash column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes, totals, npx = [], [], []
            for payload in pdf["payload"]:
                img = decode_ppm(bytes(payload))
                n = img["width"] * img["height"]
                h, total = ahash_core(img["pixels"], n)
                hashes.append(h)
                totals.append(total)
                npx.append(n)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_px": npx,
                    "luma_total": totals,
                    "phash": hashes,
                }
            )

    return media_df.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id long, n_px long, luma_total long, phash long",
    )
