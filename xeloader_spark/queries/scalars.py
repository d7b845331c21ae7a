"""Scalar-function surface: string, datetime, and array functions as
oracle-checked projections — breadth evidence that the engine's scalar
layer (the reference's S10-S16 is its entire scalar surface; Spark's is
vastly larger) behaves identically to the oracle engine.

Functions chosen for exact cross-engine semantics: no locale-dependent
collation, no timezone-week conventions (dayofweek differs between
engines and is deliberately excluded), no float arithmetic."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar parity: case, trim, substring, replace, padding,
    concat, length, reverse, edit distance."""
    docs = load_table(spark, sf_dir, "documents")
    head = F.substring("text", 1, 20)
    return docs.select(
        "doc_id",
        F.upper(head).alias("s_upper"),
        F.lower(F.col("source")).alias("s_lower"),
        F.trim(head).alias("s_trim"),
        F.regexp_replace(head, "a", "_").alias("s_replace"),
        F.lpad(F.col("lang"), 5, ".").alias("s_lpad"),
        F.concat_ws("|", "lang", "source").alias("s_concat"),
        F.length("text").cast("long").alias("s_len"),
        F.expr("reverse(substring(text, 1, 20))").alias("s_rev"),
        F.levenshtein(F.col("lang"), F.lit("en")).cast("long").alias("s_lev"),
    )


def q_datetime_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar parity: part extraction + arithmetic on the precise
    event timestamp."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.year("ts").cast("long").alias("t_year"),
        F.month("ts").cast("long").alias("t_month"),
        F.dayofmonth("ts").cast("long").alias("t_day"),
        F.hour("ts").cast("long").alias("t_hour"),
        F.minute("ts").cast("long").alias("t_minute"),
        F.second("ts").cast("long").alias("t_second"),
        F.unix_micros(F.col("ts")).alias("t_epoch_us"),
        F.date_trunc("hour", F.col("ts")).alias("t_hour_trunc"),
        (F.col("ts") + F.expr("INTERVAL 7 DAYS")).alias("t_plus_week"),
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar parity over the embedding vectors: size, bounds,
    slicing, element access, containment count. Comparisons only — no
    float arithmetic, so values are engine-exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("a_size"),
        F.array_max("embedding").cast("double").alias("a_max"),
        F.array_min("embedding").cast("double").alias("a_min"),
        F.element_at("embedding", 1).cast("double").alias("a_first"),
        F.element_at("embedding", -1).cast("double").alias("a_last"),
        F.expr("size(filter(embedding, x -> x > 0))").cast("long").alias("a_n_pos"),
    )


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution window-function parity per event type:
    row_number / ntile over a total order (value, event_id); rank /
    dense_rank / percent_rank / cume_dist over value alone (tie
    semantics on the hook — their results don't depend on within-tie
    order); a bounded rows-frame max. percent_rank and cume_dist are
    integer-ratio doubles — one deterministic division in both engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    total = Window.partitionBy("event_type").orderBy("value", "event_id")
    byval = Window.partitionBy("event_type").orderBy("value")
    sliding = total.rowsBetween(-3, 0)
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(total).cast("long").alias("w_rownum"),
        F.ntile(7).over(total).cast("long").alias("w_ntile"),
        F.rank().over(byval).cast("long").alias("w_rank"),
        F.dense_rank().over(byval).cast("long").alias("w_dense_rank"),
        F.percent_rank().over(byval).alias("w_pct_rank"),
        F.cume_dist().over(byval).alias("w_cume_dist"),
        F.max("value").over(sliding).alias("w_roll_max"),
    )


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling parity battery: two derived nullable columns
    (value masked above different thresholds) exercised through
    COALESCE, aggregate null-skipping (COUNT(col) vs COUNT(*)), and
    null-safe equality (`<=>` vs IS NOT DISTINCT FROM — rows where BOTH
    are null must compare TRUE, the semantics plain `=` gets wrong).
    Sums go through the decimal accumulator."""
    ev = load_table(spark, sf_dir, "events")
    v1 = F.when(F.col("value") <= 150, F.col("value"))
    v2 = F.when(F.col("value") <= 200, F.col("value"))
    d = ev.select(
        "event_type",
        v1.alias("v1"),
        v2.alias("v2"),
    )
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("v1").cast("long").alias("n_v1_nonnull"),
        F.count("v2").cast("long").alias("n_v2_nonnull"),
        F.sum(F.col("v1").eqNullSafe(F.col("v2")).cast("long"))
        .cast("long")
        .alias("n_nullsafe_eq"),
        F.sum((F.col("v1") == F.col("v2")).cast("long"))
        .cast("long")
        .alias("n_plain_eq_true"),
        F.sum(F.coalesce(F.col("v1"), F.lit(0)).cast("decimal(25,6)"))
        .cast("double")
        .alias("sum_v1_coalesced"),
    )


def q_string_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic string aggregation: each event type's distinct
    user ids as ONE comma-joined string in ascending numeric order —
    `collect_set` is unordered by contract, so the pipeline pins the
    order explicitly (array_sort before join), matching the oracle's
    ORDER BY inside string_agg. A favorite cross-engine trap: unordered
    listagg results hash-differ run to run; ordered ones never do."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr(
            "concat_ws(',', transform(array_sort(collect_set(user_id)),"
            " x -> cast(x as string)))"
        ).alias("user_list"),
    )


def q_conditional_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean/conditional aggregate parity: bool_and / bool_or over
    predicates, count_if, and filtered conditional sums through the
    decimal accumulator — the aggregate-modifier surface a SQL user
    expects beyond plain SUM/COUNT."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.expr("bool_and(value > 0)").alias("all_positive"),
        F.expr("bool_or(value > 300)").alias("any_over_300"),
        F.expr("count_if(value > 100)").cast("long").alias("n_over_100"),
        F.sum(
            F.when(F.col("value") > 100, F.col("value")).cast(
                "decimal(25,6)"
            )
        )
        .cast("double")
        .alias("sum_over_100"),
        F.min(F.when(F.col("value") > 100, F.col("value")))
        .cast("double")
        .alias("min_over_100"),
    )


def q_id_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over each user's event_id sequence: contiguous
    id runs collapse via the rank-difference trick (id − row_number is
    constant within an island) — the classic sequence-integrity check a
    loader runs to find dropped batches. Island count, longest island,
    and covered-id span are all exact integers."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("event_id")
    grp = (F.col("event_id") - F.row_number().over(w)).alias("grp")
    islands = (
        ev.select("user_id", "event_id", grp)
        .groupBy("user_id", "grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("island_len"),
            F.min("event_id").cast("long").alias("island_start"),
        )
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.max("island_len").cast("long").alias("longest_island"),
        F.sum("island_len").cast("long").alias("n_ids"),
        F.min("island_start").cast("long").alias("first_id"),
    )


def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-vector norm diagnostics, engine-exact: components
    quantized to integers (the same ×1000 rounding as the ANN kernels),
    squared-norm as an exact bigint fold, L2 norm via one IEEE sqrt,
    plus the dominant dimension (argmax with smallest-index tie-break,
    via array position arithmetic) — the per-vector sanity profile run
    before any cosine pipeline (zero norms, dead dimensions)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000)"
        " as bigint))"
    ).alias("qv")
    d = emb.select("vec_id", q)
    norm2 = F.expr("aggregate(qv, 0L, (s, x) -> s + x * x)")
    max_abs = F.expr("array_max(transform(qv, x -> abs(x)))")
    argmax = F.expr(
        "array_position(transform(qv, x -> abs(x)),"
        " array_max(transform(qv, x -> abs(x))))"
    )
    return d.select(
        "vec_id",
        F.expr("size(qv)").cast("long").alias("dim"),
        norm2.cast("long").alias("norm2_q"),
        F.sqrt(norm2.cast("double")).alias("norm_q"),
        max_abs.cast("long").alias("max_abs_q"),
        argmax.cast("long").alias("argmax_dim"),
        (norm2 == 0).alias("is_zero_vector"),
    )


ORACLES: dict[str, str] = {
    "q_vector_norms": """
        WITH d AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000)
                                 AS BIGINT)) AS qv
            FROM embeddings
        ),
        s AS (
            SELECT vec_id, qv,
                   CAST(len(qv) AS BIGINT) AS dim,
                   CAST(list_sum(list_transform(qv, x -> x * x))
                        AS BIGINT) AS norm2_q,
                   list_transform(qv, x -> abs(x)) AS aq
            FROM d
        )
        SELECT vec_id, dim, norm2_q,
               sqrt(CAST(norm2_q AS DOUBLE)) AS norm_q,
               CAST(list_max(aq) AS BIGINT) AS max_abs_q,
               CAST(list_position(aq, list_max(aq)) AS BIGINT)
                   AS argmax_dim,
               norm2_q = 0 AS is_zero_vector
        FROM s
    """,
    "q_conditional_aggs": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               bool_and(value > 0) AS all_positive,
               bool_or(value > 300) AS any_over_300,
               CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT)
                   AS n_over_100,
               CAST(SUM(CAST(value AS DECIMAL(25,6)))
                        FILTER (WHERE value > 100) AS DOUBLE)
                   AS sum_over_100,
               CAST(MIN(value) FILTER (WHERE value > 100) AS DOUBLE)
                   AS min_over_100
        FROM events GROUP BY 1
    """,
    "q_id_islands": """
        WITH g AS (
            SELECT user_id, event_id,
                   event_id - ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY event_id
                   ) AS grp
            FROM events
        ),
        islands AS (
            SELECT user_id, grp,
                   CAST(COUNT(*) AS BIGINT) AS island_len,
                   CAST(MIN(event_id) AS BIGINT) AS island_start
            FROM g GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(MAX(island_len) AS BIGINT) AS longest_island,
               CAST(SUM(island_len) AS BIGINT) AS n_ids,
               CAST(MIN(island_start) AS BIGINT) AS first_id
        FROM islands GROUP BY 1
    """,
    "q_null_semantics": """
        WITH d AS (
            SELECT event_type,
                   CASE WHEN value <= 150 THEN value END AS v1,
                   CASE WHEN value <= 200 THEN value END AS v2
            FROM events
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(v1) AS BIGINT) AS n_v1_nonnull,
               CAST(COUNT(v2) AS BIGINT) AS n_v2_nonnull,
               CAST(SUM(CASE WHEN v1 IS NOT DISTINCT FROM v2
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nullsafe_eq,
               CAST(SUM(CASE WHEN v1 = v2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_plain_eq_true,
               CAST(SUM(CAST(COALESCE(v1, 0) AS DECIMAL(25,6))) AS DOUBLE)
                   AS sum_v1_coalesced
        FROM d GROUP BY 1
    """,
    "q_string_agg_ordered": """
        WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        c AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1
        ),
        s AS (
            SELECT event_type,
                   string_agg(CAST(user_id AS VARCHAR), ','
                              ORDER BY user_id) AS user_list
            FROM u GROUP BY 1
        )
        SELECT c.event_type, c.n_events, s.user_list
        FROM c JOIN s ON s.event_type = c.event_type
    """,
    "q_window_funcs": """
        SELECT event_id, event_type, value,
               CAST(ROW_NUMBER() OVER wt AS BIGINT) AS w_rownum,
               CAST(NTILE(7) OVER wt AS BIGINT) AS w_ntile,
               CAST(RANK() OVER wv AS BIGINT) AS w_rank,
               CAST(DENSE_RANK() OVER wv AS BIGINT) AS w_dense_rank,
               PERCENT_RANK() OVER wv AS w_pct_rank,
               CUME_DIST() OVER wv AS w_cume_dist,
               MAX(value) OVER (PARTITION BY event_type
                   ORDER BY value, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS w_roll_max
        FROM events
        WINDOW wt AS (PARTITION BY event_type ORDER BY value, event_id),
               wv AS (PARTITION BY event_type ORDER BY value)
    """,
    "q_string_funcs": """
        SELECT doc_id,
               upper(substr(text, 1, 20)) AS s_upper,
               lower(source) AS s_lower,
               trim(substr(text, 1, 20)) AS s_trim,
               regexp_replace(substr(text, 1, 20), 'a', '_', 'g') AS s_replace,
               lpad(lang, 5, '.') AS s_lpad,
               concat_ws('|', lang, source) AS s_concat,
               CAST(length(text) AS BIGINT) AS s_len,
               reverse(substr(text, 1, 20)) AS s_rev,
               CAST(levenshtein(lang, 'en') AS BIGINT) AS s_lev
        FROM documents
    """,
    "q_datetime_parts": """
        SELECT event_id,
               CAST(year(ts) AS BIGINT) AS t_year,
               CAST(month(ts) AS BIGINT) AS t_month,
               CAST(day(ts) AS BIGINT) AS t_day,
               CAST(hour(ts) AS BIGINT) AS t_hour,
               CAST(minute(ts) AS BIGINT) AS t_minute,
               CAST(CAST(extract(second FROM ts) AS INTEGER) AS BIGINT) AS t_second,
               epoch_us(ts) AS t_epoch_us,
               date_trunc('hour', ts) AS t_hour_trunc,
               ts + INTERVAL 7 DAY AS t_plus_week
        FROM events
    """,
    "q_array_funcs": """
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS a_size,
               CAST(list_max(embedding) AS DOUBLE) AS a_max,
               CAST(list_min(embedding) AS DOUBLE) AS a_min,
               CAST(embedding[1] AS DOUBLE) AS a_first,
               CAST(embedding[-1] AS DOUBLE) AS a_last,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS a_n_pos
        FROM embeddings
    """,
}
