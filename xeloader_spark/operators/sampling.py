"""Deterministic sampling / splitting for training-data pipelines.

Everything here is HASH-based, never RNG-based: a row's fate depends only
on its key (+ salt), so samples are reproducible across runs, engines,
partitionings, and retries — the property a 100 TB pipeline needs so a
re-run (or a different engine checking the run) selects the identical
subset. `rand()`-based sampling can't promise that (Spark seeds are
per-partition, so the selected SET changes with the partitioning).

The hash is the first 8 hex chars of md5(salt || key) read as an integer
— engine-portable (DuckDB: `('0x' || substr(md5(..),1,8))::BIGINT`), and
uniform enough for bucketing. All operators are pure narrow projections /
filters: no shuffle, fully pushdown-friendly, trivially parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000  # fraction resolution = 0.01%


def hash_bucket(key: Column | str, salt: str = "", buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from md5(salt || key)."""
    c = F.col(key) if isinstance(key, str) else key
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
    return (h.cast("bigint") % buckets).alias("bucket")


def bernoulli_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~`fraction` of rows, chosen deterministically by key hash."""
    return df.filter(hash_bucket(key_col, salt) < int(fraction * BUCKETS))


def split_train_test(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, salt: str = "split"
) -> DataFrame:
    """Add a `split` column ('train' | 'test') by key hash. Keyed on a
    stable id so the assignment survives re-runs and joins — no row is
    ever on both sides, even across engines."""
    return df.withColumn(
        "split",
        F.when(
            hash_bucket(key_col, salt) < int(test_fraction * BUCKETS), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    part_col: str,
    order_col: str,
) -> DataFrame:
    """Contiguous sequence packing for training-batch assembly: documents
    are laid end-to-end in deterministic (`part_col`, `order_col`) order
    and cut into fixed token-budget sequences. Each row gets `seq_id`
    (which packed sequence its FIRST token lands in) and `seq_offset`
    (position within it) — the downstream tokenizer uses these to emit
    fixed-length samples, splitting a doc that straddles a boundary.

    Pure window arithmetic (exclusive running sum, integer div/mod), so
    it is engine-exact and shuffles once on `part_col`. Partitions pack
    independently — at 100 TB `part_col` is the shard key (source, date,
    …), giving per-shard determinism with full cluster parallelism."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    return (
        df.withColumn("_cum_before", cum_before)
        .withColumn("seq_id", F.expr(f"_cum_before div {budget}"))
        .withColumn("seq_offset", F.col("_cum_before") % budget)
        .drop("_cum_before")
    )


def per_group_cap(
    df: DataFrame,
    cap: int,
    part_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Domain/source capping (the CC-pipeline "domain cap": no single
    site may contribute more than `cap` documents). Priority is the
    deterministic key hash, so the surviving subset is independent of
    engine, partitioning, and run — a re-run keeps the SAME documents.

    Adds `grp_rank` (1-based position in hash order within the group) and
    `kept` (rank <= cap). One shuffle on `part_col`; call on a slim
    (key, group) projection and semi-join survivors back if the payload
    is wide. Skew note: a hot domain serializes into one window task —
    at 100 TB prefilter with an approximate per-group hash-quantile
    threshold (margin >= 3x cap/n, then verify count >= cap) before the
    exact window so the window input is O(cap) per group, not O(n)."""
    w = Window.partitionBy(part_col).orderBy(
        hash_bucket(key_col, salt), F.col(key_col)
    )
    return df.withColumn(
        "grp_rank", F.row_number().over(w).cast("long")
    ).withColumn("kept", F.col("grp_rank") <= cap)


def token_budget_take(
    df: DataFrame,
    tokens_col: str,
    budget_col: Column | str,
    part_col,
    key_col: str = "doc_id",
    salt: str = "budget",
) -> DataFrame:
    """Greedy token-budget selection per group: documents are considered
    in deterministic key-hash order and a document is KEPT iff the running
    token total BEFORE it is still under the group's budget (so the take
    may overshoot by at most one document — the standard greedy-prefix
    contract). `budget_col` may be a literal or a per-group column (e.g.
    floor(mix_weight * total_budget) from temperature mixing weights).

    Adds `cum_before` (exclusive running sum, engine-exact integer
    arithmetic) and `kept`. One shuffle on `part_col`; same skew note as
    `per_group_cap`."""
    b = F.col(budget_col) if isinstance(budget_col, str) else budget_col
    w = (
        Window.partitionBy(part_col)
        .orderBy(hash_bucket(key_col, salt), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
    return df.withColumn("cum_before", cum_before).withColumn(
        "kept", F.col("cum_before") < b
    )


def length_bucket_batches(
    df: DataFrame,
    tokens_col: str,
    key_col: str = "doc_id",
    bucket_width: int = 8,
    batch_size: int = 16,
) -> DataFrame:
    """Length-bucketed batch assembly: documents are grouped into
    fixed-width length buckets (bucket = tokens DIV width), ordered by
    (tokens, key) inside each bucket, and cut into `batch_size`-document
    batches — the standard padding-minimizing batching for variable-length
    training samples (each batch pads to ITS max, not the corpus max).

    Returns one row per batch: (bucket, batch_id, n_docs, pad_len,
    real_tokens, padded_tokens, waste) — all integer window/aggregate
    arithmetic, engine-exact. padded_tokens = pad_len * n_docs is the
    cost the accelerator actually pays; waste is what bucketing saved
    you from paying at a coarser granularity.

    Shape: one shuffle for the per-bucket ranking window + the map-side-
    combinable batch aggregate, over a slim (key, tokens) projection.
    Buckets are few, so each bucket's ranking serializes into one task —
    at 100 TB rank within (bucket, shard) instead, exactly like
    `pack_sequences` partitions by the shard key, and batches stay
    shard-local (a property training-data loaders want anyway)."""
    width, bsz = int(bucket_width), int(batch_size)
    w = Window.partitionBy("bucket").orderBy(F.col(tokens_col), F.col(key_col))
    return (
        df.select(
            F.col(key_col),
            F.col(tokens_col),
            F.expr(f"CAST({tokens_col} DIV {width} AS BIGINT)").alias("bucket"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("batch_id", F.expr(f"CAST((_rn - 1) DIV {bsz} AS BIGINT)"))
        .groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max(tokens_col).cast("bigint").alias("pad_len"),
            F.sum(tokens_col).cast("bigint").alias("real_tokens"),
        )
        .withColumn("padded_tokens", F.col("pad_len") * F.col("n_docs"))
        .withColumn("waste", F.col("padded_tokens") - F.col("real_tokens"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix operator
    ("50% of src0, 10% of the web crawl, drop the rest"). The per-stratum
    thresholds compile to a CASE expression evaluated row-side: no join,
    no shuffle, any number of strata."""
    thr = F.lit(int(default_fraction * BUCKETS))
    expr = None
    for value, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == value
        branch = F.lit(int(frac * BUCKETS))
        expr = F.when(cond, branch) if expr is None else expr.when(cond, branch)
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.filter(hash_bucket(key_col, salt) < thr)


def shard_by_tokens(
    df: DataFrame,
    n_shards: int,
    tokens_col: str,
    id_col: str = "doc_id",
    bucket_width: int = 64,
) -> DataFrame:
    """Balanced output sharding: assign documents to `n_shards` shards so
    per-shard token totals come out near-equal — the write-side partner
    of `pack_sequences` (training corpora ship as N equal shard files so
    every data-loader worker streams the same byte budget).

    Deterministic and PARALLEL: documents group into length buckets
    (``tokens div bucket_width``); within each bucket they rank by
    (tokens DESC, id) — a total order, so engine-exact — and deal
    round-robin to ``(bucket + rank) mod n_shards``. Within a bucket all
    documents are within `bucket_width` tokens of each other, so
    round-robin is near-optimal there; the per-bucket rotation stops
    every bucket's first card landing on shard 0. Global imbalance is
    bounded by ~n_buckets · bucket_width tokens, independent of corpus
    size.

    A GLOBAL ranking would balance marginally better but costs a
    single-task sort — the 100 TB killer. Per-bucket windows shuffle a
    slim (id, tokens) projection and every bucket ranks in parallel;
    documents never move (the assignment joins back by id, or the write
    repartitions by `shard` — a shuffle the sink pays anyway)."""
    bucket = F.expr(f"CAST({tokens_col} DIV {bucket_width} AS BIGINT)")
    w = Window.partitionBy(bucket).orderBy(F.desc(tokens_col), F.asc(id_col))
    r = F.row_number().over(w) - 1
    shard = (bucket + r) % n_shards
    return df.select(
        F.col(id_col),
        F.col(tokens_col),
        shard.cast("int").alias("shard"),
    )


def weighted_sample(
    df: DataFrame, key_col: str, weight_col, salt: str = "wsample"
) -> DataFrame:
    """Importance-weighted deterministic sampling: keep a row iff its
    md5 bucket falls below weight·BUCKETS, so each row's keep
    probability equals its weight in [0, 1] — quality- or
    length-weighted corpus thinning with the same re-run / cross-engine
    stability as `bernoulli_sample` (no RNG state; the selected SET is a
    pure function of keys and weights). The comparison stays in double
    space (bucket < w·BUCKETS) — no float→int cast, whose
    truncate-vs-round semantics differ across engines. Zero shuffle."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    return df.filter(
        hash_bucket(key_col, salt) < w * F.lit(float(BUCKETS))
    )
