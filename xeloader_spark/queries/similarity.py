"""Similarity-search operators as driver queries over `embeddings`, plus
the multimodal plumbing as a rows-only entry.

`q_ann_topk_dot` is the exact-checked baseline (integer-quantized dot
products). The float-cosine brute force and LSH-ANN variants are
engine-side APIs (operators/similarity.py) validated against numpy in
tests; `q_ann_topk_cosine_lsh` is registered rows-only because its
hyperplane-aggregate float reductions have no stable cross-engine SQL
equivalent (summation order differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import multimodal as mm
from ..operators import similarity as sim

_QUERY_IDS = [0, 1, 2, 3, 4]
_K = 5


def q_ann_topk_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors for query vectors 0-4 by quantized dot
    product (deterministic tie-break on candidate id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.dot_topk_quantized(emb, _QUERY_IDS, k=_K)


def q_ann_topk_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 by random-hyperplane LSH bucketing + exact cosine
    re-rank of in-bucket candidates (rows-only check; float path)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.lsh_ann_topk(emb, _QUERY_IDS, k=_K, n_planes=6)


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: trained KMeans coarse quantizer, n_probe nearest lists,
    exact cosine re-rank (rows-only check: KMeans training + float
    reductions have no cross-engine SQL equivalent)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.ivf_topk(emb, _QUERY_IDS, k=_K, n_centroids=16, n_probe=3)


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids in long form (label, dim, centroid) —
    the vector-aggregate behind IVF codebooks and class prototypes.
    Quantized-integer sums keep the reduction order-independent and
    engine-exact; the final long/long division is one deterministic
    double op. Long form shuffles (label × dim) partial aggregates —
    no per-row vector materialization on the driver."""
    emb = load_table(spark, sf_dir, "embeddings")
    longf = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("v").cast("double") * 1_000_000).cast("long").alias("qv"),
    )
    return longf.groupBy("label", "dim").agg(
        (F.sum("qv") / (F.count(F.lit(1)) * 1_000_000)).alias("centroid"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents → fake binary payloads
    with typed metadata → Arrow `mapInPandas` feature extraction
    (rows-only check; the decode step is a deterministic stub — real
    codecs are absent in this runtime)."""
    docs = load_table(spark, sf_dir, "documents")
    media = mm.attach_fake_media(docs)
    return mm.extract_features(media)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling through mapInPandas (every 2nd frame;
    payload slices stand in for demuxed frames). Exact-checked: the fake
    payload is md5-derived, so DuckDB replays the byte slicing on the hex
    string and the BINARY frame payloads hash-match."""
    docs = load_table(spark, sf_dir, "documents")
    frames = mm.sample_frames(mm.attach_fake_media(docs), every=2)
    # frame bytes surfaced as lowercase hex: BINARY cells canonicalize
    # differently across drivers (bytes vs bytearray), hex strings don't
    return frames.select(
        "media_id",
        "frame_index",
        F.lower(F.hex("frame_payload")).alias("frame_hex"),
    )


def q_multimodal_feature_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal feature pipeline, exploded to (media_id, dim,
    feature) long form so the Arrow mapInPandas boundary is EXACT-checked:
    the fake decoder is md5-byte-window means, which DuckDB replays
    bit-for-bit (integer byte sums, one double division, float32 round)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = mm.extract_features(mm.attach_fake_media(docs))
    return feats.select(
        "media_id", "n_bytes", F.posexplode("features").alias("dim", "feature")
    ).select(
        "media_id",
        "n_bytes",
        F.col("dim").cast("long").alias("dim"),
        F.col("feature").cast("double").alias("feature"),
    )


ORACLES: dict[str, str] = {
    "q_frame_sample": """
        WITH h AS (
            SELECT doc_id AS media_id,
                   md5(text) || md5('x' || text) AS hx,
                   length(text) % 8 + 1 AS n_frames
            FROM documents
        ),
        fr AS (
            SELECT media_id, hx,
                   unnest(generate_series(0, n_frames - 1)) AS fi
            FROM h
        )
        SELECT media_id,
               CAST(fi AS INT) AS frame_index,
               substr(hx, 2 * (fi % 32) + 1, 16) AS frame_hex
        FROM fr WHERE fi % 2 = 0
    """,
    "q_multimodal_feature_values": """
        WITH h AS (
            SELECT doc_id AS media_id, md5(text) || md5('x' || text) AS hx
            FROM documents
        ),
        d AS (SELECT media_id, hx, unnest(generate_series(0, 7)) AS dim FROM h),
        f AS (
            SELECT media_id, dim,
                   (  ('0x' || substr(hx, 8*dim + 1, 2))::BIGINT
                    + ('0x' || substr(hx, 8*dim + 3, 2))::BIGINT
                    + ('0x' || substr(hx, 8*dim + 5, 2))::BIGINT
                    + ('0x' || substr(hx, 8*dim + 7, 2))::BIGINT) / 1020.0 AS v
            FROM d
        )
        SELECT media_id,
               CAST(32 AS BIGINT) AS n_bytes,
               CAST(dim AS BIGINT) AS dim,
               CAST(CAST(v AS REAL) AS DOUBLE) AS feature
        FROM f
    """,
    "q_label_centroids": """
        WITH longf AS (
            SELECT label,
                   CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS dim,
                   CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS qv
            FROM embeddings
        )
        SELECT label, dim,
               CAST(SUM(qv) AS BIGINT) / (COUNT(*) * 1000000) AS centroid,
               COUNT(*) AS n_vecs
        FROM longf
        GROUP BY 1, 2
    """,
    "q_ann_topk_dot": f"""
        WITH q AS (
            SELECT vec_id AS id, ord AS pos,
                   CAST(round(CAST(val AS DOUBLE) * 1000) AS BIGINT) AS qv
            FROM (SELECT vec_id, unnest(embedding) AS val,
                         generate_subscripts(embedding, 1) AS ord
                  FROM embeddings)
        ),
        queries AS (
            SELECT id AS query_id, pos, qv AS q_qv FROM q
            WHERE id IN ({", ".join(str(i) for i in _QUERY_IDS)})
        ),
        dots AS (
            SELECT qu.query_id, c.id AS candidate_id,
                   CAST(SUM(qu.q_qv * c.qv) AS BIGINT) AS dot
            FROM queries qu JOIN q c ON qu.pos = c.pos AND c.id <> qu.query_id
            GROUP BY 1, 2
        )
        SELECT query_id, candidate_id, dot, rk FROM (
            SELECT query_id, candidate_id, dot,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY dot DESC, candidate_id ASC) AS rk
            FROM dots
        ) WHERE rk <= {_K}
    """,
}
