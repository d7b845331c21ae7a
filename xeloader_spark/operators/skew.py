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
