"""Golden end-to-end (SURVEY §5.5): the ingest of the seed-42 fixture is
bit-deterministic — two independent runs produce identical canonical
content — and schema evolution across loads merges instead of breaking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xeloader_spark.catalog import load_table
from xeloader_spark.operators.ingest import IngestConfig, ingest

SF = "/root/testdata/sf0.001"


def _content_hash(spark, path: str) -> str:
    """Order-insensitive content hash: xor-free stable aggregate of per-row
    md5 over a canonical string projection."""
    df = spark.read.parquet(path)
    canon = df.select(
        F.md5(
            F.concat_ws(
                "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in sorted(df.columns)]
            )
        ).alias("h")
    )
    return canon.agg(
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("h")))).alias("H")
    ).first().H


@pytest.fixture()
def xel_dir(spark, tmp_path):
    root = str(tmp_path / "in")
    ev = load_table(spark, SF, "events")
    ev.coalesce(1).write.mode("overwrite").parquet(root)
    return root


def test_golden_ingest_deterministic(spark, xel_dir, tmp_path):
    cfg = IngestConfig(write_mode="overwrite")
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    rep1 = ingest(spark, xel_dir, out1, cfg)
    rep2 = ingest(spark, xel_dir, out2, cfg)
    assert rep1.as_dict() == rep2.as_dict()
    assert _content_hash(spark, out1) == _content_hash(spark, out2)


def test_schema_evolution_merge(spark, tmp_path):
    """S6/§1.2 schema evolution: a later load with extra columns merges
    (the EnsureTableSchemaMatches ALTER TABLE path,
    EventMetadata.cs:400-455, as parquet mergeSchema)."""
    out = str(tmp_path / "evolving")
    ev = load_table(spark, SF, "events").limit(100)
    ev.write.mode("overwrite").parquet(out)
    ev.withColumn("c_new_field", F.lit("x")).write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "c_new_field" in merged.columns
    assert merged.count() == 200
    # rows from the first load read the evolved column as null
    assert merged.filter(F.col("c_new_field").isNull()).count() == 100


def test_partition_count_invariance(spark):
    """The exactness contract behind every oracle hash: results must be
    BIT-identical under different shuffle partitioning (decimal
    accumulators, integer kernels, total tie-breaks — no
    order-dependent float folds). Representative queries across the
    float-agg / window / dedup / LM families, run at 3 partition
    counts."""
    from xeloader_spark.queries import dedup as qd
    from xeloader_spark.queries import relational as qr
    from xeloader_spark.queries import text as qt

    sf = "/root/testdata/sf0.001"
    cases = {
        "pricing": lambda: qr.q_pricing_summary(spark, sf),
        "mkt_share": lambda: qr.q_market_share(spark, sf),
        "mix_weights": lambda: qt.q_mix_weights(spark, sf),
        "minhash": lambda: qd.q_dedup_minhash_lsh(spark, sf),
        "unigram": lambda: qt.q_unigram_doc_prob(spark, sf),
    }

    def canon(df):
        cols = sorted(df.columns)
        return sorted(
            tuple(repr(r[c]) for c in cols) for r in df.collect()
        )

    base = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("3", "8", "17"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results[n] = {k: canon(mk()) for k, mk in cases.items()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", base)
    for k in cases:
        assert results["3"][k] == results["8"][k] == results["17"][k], k
