"""Hyperlink extraction and the host-level link graph — the
cc-webgraph analogue, completing the crawl family (WARC container →
robots gate → URL frontier → LINK GRAPH): Common Crawl publishes
host/domain link graphs and centrality ranks as first-class crawl
products, and a training-data pipeline consumes them as domain-quality
priors and crawl-prioritization signals.

Reference parity note: the reference's whole ingest premise is opaque
container → typed rows (XELoader/FileProcessor.cs:203); this extends
the same premise to the crawl payload — HTML text → typed (src_host,
dst_host) edge rows — and then reuses the repo's integer PageRank
(`operators/graph.py:29`) for host ranking.

Extraction semantics (deterministic, oracle-replayable):
- anchors are `<a href="...">` double-quoted attributes, found with ONE
  `regexp_extract_all` (both engines ship the same function) — no HTML
  parser dependency, the documented simplification of every
  string-level link extractor;
- resolution follows the three cases a crawler cares about: absolute
  http(s) hrefs pass through; host-relative hrefs (leading '/') resolve
  against the source host; everything else (fragments, mailto:,
  javascript:, protocol-relative) resolves to NULL and is dropped
  before the edge ever exists.

Scale shape: extraction is one `regexp_extract_all` + one explode +
codegen string functions per anchor — zero shuffles, zero joins; the
host-graph aggregate shuffles slim (src_host, dst_host) pairs once;
ranking inherits PageRank's edges-shuffle-once / node-sized-rounds
shape. Page content never outlives its own task.

Shared-template discipline (the `sources/warc.py` pattern): one builder
renders the resolution CASE for both the Spark plan and the DuckDB
oracle, so the two engines cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# group 1 = the href value of a double-quoted anchor attribute
HREF_RE = '<a href="([^"]*)"'

_HOST_RE = "^[a-zA-Z]+://([^/:?#]+)"


def resolve_href_sql(href_sql: str, src_host_sql: str) -> str:
    """The href → absolute-URL resolution CASE (dialect-free: LIKE,
    substr, concat and lower behave identically in Spark SQL and
    DuckDB). NULL = not a crawlable http(s) link."""
    return (
        f"CASE WHEN {href_sql} LIKE 'http://%' "
        f"OR {href_sql} LIKE 'https://%' THEN {href_sql} "
        f"WHEN substr({href_sql}, 1, 2) = '//' THEN NULL "
        f"WHEN substr({href_sql}, 1, 1) = '/' "
        f"THEN concat('https://', {src_host_sql}, {href_sql}) "
        f"ELSE NULL END"
    )


def dst_host_sql(url_sql: str) -> str:
    return f"lower(regexp_extract({url_sql}, '{_HOST_RE}', 1))"


def extract_links(
    df: DataFrame, html_col: str = "html", src_host_col: str = "src_host"
) -> DataFrame:
    """Per-document link rows: (…, href, dst_url, dst_host), one row per
    resolvable anchor. Zero shuffles — regexp_extract_all + explode +
    string functions inside one codegen stage."""
    exploded = df.select(
        "*",
        F.explode(
            F.expr(f"regexp_extract_all({html_col}, '{HREF_RE}', 1)")
        ).alias("href"),
    ).drop(html_col)
    resolved = exploded.withColumn(
        "dst_url", F.expr(resolve_href_sql("href", src_host_col))
    )
    return resolved.filter(F.col("dst_url").isNotNull()).withColumn(
        "dst_host", F.expr(dst_host_sql("dst_url"))
    )


def html_to_text_sql(d: dict, html_sql: str) -> str:
    """HTML → visible text, as ONE dialect-parametric expression (the
    `sources/warc.py` template discipline — `d` is SPARK_DIALECT or
    DUCK_DIALECT, whose `re` hook handles string-literal escaping):

    1. drop <script>/<style> ELEMENTS with their contents ((?s) so the
       payload spans lines; non-greedy so adjacent blocks don't merge),
    2. strip remaining tags to a space (block boundaries become token
       boundaries, never word-joins),
    3. unescape the five core entities — &amp; LAST, so '&amp;lt;'
       correctly yields '&lt;' and never double-unescapes,
    4. collapse whitespace runs and trim.

    The string-level extractor every lightweight crawl pipeline starts
    from (the documented simplification: no DOM, no CSS visibility);
    deterministic, so the DuckDB oracle replays it exactly."""
    x = html_sql
    for blk in ("script", "style"):
        x = d["gsub"](x, d["re"](rf"(?s)<{blk}[^>]*>.*?</{blk}>"), " ")
    x = d["gsub"](x, d["re"]("<[^>]*>"), " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),  # SQL-escaped single quote
        ("&amp;", "&"),
    ):
        x = f"replace({x}, '{ent}', '{ch}')"
    return f"trim({d['gsub'](x, d['re'](chr(92) + 's+'), ' ')})"


def html_to_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Add `text_out` (the extracted visible text) to `df`. Zero-shuffle
    codegen projection; the page never moves."""
    from ..sources.warc import SPARK_DIALECT

    return df.withColumn(
        "text_out", F.expr(html_to_text_sql(SPARK_DIALECT, html_col))
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Aggregate link rows to the weighted host graph: (src_host,
    dst_host, n_links, n_docs). One shuffle over slim host-pair rows —
    the page-level frame collapses map-side before anything moves."""
    return links.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )
