"""Skew- and co-location-aware join helpers — the knobs a 100 TB
deployment turns when AQE's automatic skew splitting isn't enough.

- `salted_join`: classic key salting for a skewed equi-join: the big
  side's hot keys are split across `salt_n` sub-keys; the small side is
  replicated `salt_n`× (explode) so every sub-key finds its match. Turns
  one straggler task into `salt_n` even tasks.
- `bucketed_table` / co-located join: persist both sides bucketed by the
  join key so repeated joins shuffle neither side (SortMergeJoin with no
  Exchange). This is the Spark-native analog of the reference's
  clustered-index layout choice (EventMetadata.cs:203-244): pay the
  layout cost once at write, win on every query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salting: big side gets a uniform random salt in
    [0, salt_n); small side is exploded across all salts. Result equals
    `big.join(small, key, how)` exactly; the shuffle key becomes
    (key, salt) so one hot key spreads over salt_n partitions.

    Keep `salt_n` ≈ (hot-key rows / average-partition rows); oversalting
    multiplies the small side needlessly. For left/inner joins only (the
    replicated small side would duplicate right-outer null rows).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_n).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 32_768,
    k: int = 3,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit Bloom runtime filter on the fact side —
    the semi-join reduction Spark's own `spark.sql.optimizer.
    runtimeFilter.bloomFilter.enabled` injects, made explicit and
    engine-deterministic: the dim side's keys compress to a fixed m-bit
    word-packed bitset (two tiny aggregates, same build as
    `dedup.bloom_decontaminate`) that broadcasts via a single-row cross
    join; the fact side is pre-filtered by k O(1) mask tests per row
    inside whole-stage codegen BEFORE it reaches the join's exchange.

    Result equals `fact.join(dim, fact_key == dim_key, how)` EXACTLY —
    a Bloom filter has no false negatives, and the join itself removes
    the false positives — which is precisely what makes the operator
    oracle-checkable with a plain-join oracle. The win at 100 TB: when
    the dim side is selective (a filtered date range, a sampled cohort),
    the fact rows that would die in the join die before the shuffle
    instead, cutting the join's exchange by the selectivity factor at
    the cost of one broadcast m-bit array.

    Only `how` values that never emit unmatched fact rows are accepted
    (inner / left_semi): for outer joins the prune would have to keep
    non-matching rows and nothing is saved.
    """
    if how not in ("inner", "left_semi", "leftsemi", "semi"):
        raise ValueError(
            f"bloom_prune_join: how={how!r} would emit unmatched fact "
            "rows; the prune only composes with inner/left_semi"
        )
    pruned = bloom_prune(fact, dim, fact_key, dim_key, m=m, k=k)
    return pruned.join(
        dim,
        pruned[fact_key] == dim[dim_key],
        "inner" if how == "inner" else "left_semi",
    )


def bloom_pos_exprs(var: str, m: int, k: int) -> list[str]:
    """The k md5-derived bit positions for a join key — shared by the
    batch prune, its oracle, and the streaming twin so all three hash
    identically."""
    return [
        f"CAST(conv(substring(md5('{j}:' || CAST({var} AS STRING)), 1, 8),"
        f" 16, 10) AS BIGINT) % {int(m)}"
        for j in range(1, int(k) + 1)
    ]


def bloom_words_df(dim: DataFrame, dim_key: str, m: int, k: int) -> DataFrame:
    """The dim side's Bloom bitset as word-packed (widx, word) rows —
    two tiny aggregates over the key projection."""
    return (
        dim.select(
            F.explode(
                F.array(*[F.expr(p) for p in bloom_pos_exprs(dim_key, m, k)])
            ).alias("pos")
        )
        .select(
            F.expr("CAST(pos DIV 64 AS INT)").alias("widx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("widx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )


def bloom_hit_expr(fact_key: str, wmap_expr: str, m: int, k: int) -> str:
    """SQL predicate: all k bit positions of `fact_key` set in the
    word-packed map named/denoted by `wmap_expr`."""
    return " AND ".join(
        f"(coalesce(element_at({wmap_expr}, CAST(({p}) DIV 64 AS INT)), "
        f"CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST(({p}) % 64 AS INT))) != 0"
        for p in bloom_pos_exprs(fact_key, m, k)
    )


def bloom_prune(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m: int = 32_768,
    k: int = 3,
) -> DataFrame:
    """The filter half of `bloom_prune_join`, exposed so callers (and
    tests) can measure survivor counts: returns the fact rows whose key
    passes the dim side's m-bit Bloom filter — a superset of the true
    matches, usually a tiny one."""
    words = bloom_words_df(dim, dim_key, m, k).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("widx", "word")))
        ).alias("_bloom_wmap")
    )
    return (
        fact.crossJoin(F.broadcast(words))
        .filter(F.expr(bloom_hit_expr(fact_key, "_bloom_wmap", m, k)))
        .drop("_bloom_wmap")
    )


def make_skewed_corpus(
    spark,
    n_docs: int = 5000,
    boiler_tokens: int = 8,
    boiler_pct: int = 30,
    dup_every: int = 20,
    body_min: int = 10,
    body_span: int = 90,
) -> DataFrame:
    """Deterministic skewed dedup fixture — the boilerplate-header
    scenario that kills naive inverted-index joins at 100 TB:

    - every doc's BODY is globally unique (`u<id>t<j>` tokens, lengths
      `body_min`..`body_min+body_span-1`), so the corpus has zero
      accidental near-dups;
    - `boiler_pct`% of docs (id-gated) carry the same `boiler_tokens`-token
      header → its shingles reach df ≈ n_docs×pct — the hot keys;
    - every `dup_every`-th doc is duplicated (id + 10⁷, one appended
      token) → the TRUE near-dup pairs, jaccard ≈ (n-2)/(n-1). Copies are
      made AFTER the header gate, so both members of a pair share
      boilerplate status and the expected result set is identical with
      and without `max_df` — the cap removes the hot keys, not the signal.

    Callers must size boilerplate-only overlap under their threshold: two
    boiler docs share `boiler_tokens-2` 3-shingles, so the shortest pair
    has j = (bt-2) / (2*(bt+body_min-2) - (bt-2)). Defaults give j ≤ 0.23
    at threshold 0.5. All engine-side (sequence/transform) — no
    driver-side text building.
    """
    base = (
        spark.range(n_docs)
        .withColumn(
            "n_body", (F.col("id") % body_span + body_min).cast("int")
        )
        .withColumn(
            "body",
            F.expr(
                "concat_ws(' ', transform(sequence(1, n_body), "
                "j -> concat('u', CAST(id AS STRING), 't', CAST(j AS STRING))))"
            ),
        )
        .withColumn(
            "text",
            F.when(
                F.col("id") % 100 < boiler_pct,
                F.concat(
                    F.lit(
                        " ".join(f"boiler{i}" for i in range(boiler_tokens)) + " "
                    ),
                    F.col("body"),
                ),
            ).otherwise(F.col("body")),
        )
        .select(F.col("id").alias("doc_id"), "text")
    )
    dups = base.filter(F.col("doc_id") % dup_every == 0).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz")).alias("text"),
    )
    return base.unionByName(dups)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (+optionally sorted) managed table. Joins and
    aggregations on `key` between tables bucketed with the same bucket
    count read co-located partitions — no Exchange in the plan."""
    writer = df.write.bucketBy(n_buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.mode("overwrite").format("parquet").saveAsTable(table_name)


def z_value(c1, c2, bits: int = 16):
    """Morton (Z-order) interleaving of two non-negative integer columns
    into one locality-preserving sort key: bit i of `c1` lands at output
    bit 2i+1, bit i of `c2` at 2i. Pure bitwise arithmetic (shiftleft /
    AND / OR), identical in Spark and ANSI-ish SQL, so layouts built on
    it are oracle-checkable. Inputs must fit in `bits` bits — values are
    masked, so out-of-range inputs wrap rather than collide silently
    across the whole range."""
    a = (F.col(c1) if isinstance(c1, str) else c1).cast("long")
    b = (F.col(c2) if isinstance(c2, str) else c2).cast("long")
    mask = (1 << bits) - 1
    a, b = a.bitwiseAND(F.lit(mask)), b.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(
                F.shiftleft(a.bitwiseAND(F.lit(1 << i)), i + 1)
            ).bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(1 << i)), i))
        )
    return z


def z_value_sql(c1: str, c2: str, bits: int = 16) -> str:
    """DuckDB replay of `z_value` — same mask, same shifts."""
    mask = (1 << bits) - 1
    a, b = f"(CAST({c1} AS BIGINT) & {mask})", f"(CAST({c2} AS BIGINT) & {mask})"
    parts = []
    for i in range(bits):
        parts.append(f"(({a} & {1 << i}) << {i + 1})")
        parts.append(f"(({b} & {1 << i}) << {i})")
    return "(" + " | ".join(parts) + ")"


def zorder_write(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write `df` Z-order-clustered on (`c1`, `c2`): range-partition by
    the Morton key, sort within partitions, write parquet. Rows close in
    BOTH dimensions land in the same file, so parquet min/max footer
    stats prune scans filtered on EITHER column — the multi-dimensional
    generalization of the reference's clustered-index layout choice
    (EventMetadata.cs:203-244), and the layout trick Delta/Iceberg call
    OPTIMIZE ZORDER. Pay one range shuffle at write; every later scan
    with a selective c1/c2 predicate reads a file subset (pinned by
    `test_zorder_layout_prunes`)."""
    (
        df.withColumn("_z", z_value(c1, c2, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
