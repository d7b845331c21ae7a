"""robots.txt prefix-rule evaluation — the crawl-compliance gate.

Completes the crawl-ingestion trio: `sources/warc.py` (the container),
`operators/text.url_canonicalize` (frontier dedup), and this — which
URLs a compliant crawler may fetch at all. Semantics are the public
REP rules as specified in RFC 9309 (and Google's documented
tie-breaks): per host, Allow/Disallow PATH-PREFIX rules; the longest
matching prefix wins; on a length tie, Allow wins; no matching rule
means allowed.

Two physical forms, one longest-match HOF:

- `robots_filter` — the ruleset is a caller-supplied literal (a parsed
  robots.txt is host-bounded and tiny — the classifier-weights /
  ADC-map case: a plan constant, rendered as ONE SQL string per the
  Py4J plan-construction rule). Evaluation is host extract + path
  extract + one filter/transform/sort HOF chain per URL — zero
  shuffles, zero joins, the URL column never moves. Correct for a
  BOUNDED host set only.
- `robots_filter_table` — rules as DATA, equi-joined on host: the
  web-scale form for frontiers whose host count grows with the crawl
  (broadcast under threshold, shuffle above). Parity-pinned against
  the literal form.

The matched path includes the query string (RFC 9309 matches rules
against path + '?' + query; '/' when the path is empty).

Longest-match via struct ordering: matches map to (len, allow)
structs; lexicographic struct sort puts the longest prefix last and,
within a length, Allow (true) above Disallow — so the array max IS the
winning rule in both engines, no reduce/fold dialect divergence.

Shared-template discipline (the `sources/warc.py` pattern): one
builder renders both the Spark plan and the DuckDB oracle from the
same rule list, so they cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Rule = tuple[str, str, bool]  # (host, path_prefix, allow)

SPARK_D = {
    "struct": lambda host, prefix, allow: (
        f"named_struct('host', '{host}', 'prefix', '{prefix}', "
        f"'allow', {'true' if allow else 'false'})"
    ),
    "arr": lambda items: "array(" + ", ".join(items) + ")",
    "mk_match": lambda r: (
        f"named_struct('len', length({r}.prefix), 'allow', {r}.allow)"
    ),
    "filter": lambda arr, lam: f"filter({arr}, {lam})",
    "transform": lambda arr, lam: f"transform({arr}, {lam})",
    "best": lambda arr: f"try_element_at(reverse(array_sort({arr})), 1)",
}
DUCK_D = {
    "struct": lambda host, prefix, allow: (
        f"{{'host': '{host}', 'prefix': '{prefix}', "
        f"'allow': {'true' if allow else 'false'}}}"
    ),
    "arr": lambda items: "[" + ", ".join(items) + "]",
    "mk_match": lambda r: (
        f"{{'len': length({r}.prefix), 'allow': {r}.allow}}"
    ),
    "filter": lambda arr, lam: f"list_filter({arr}, {lam})",
    "transform": lambda arr, lam: f"list_transform({arr}, {lam})",
    "best": lambda arr: f"(list_reverse(list_sort({arr})))[1]",
}

_HOST_RE = "^[a-zA-Z]+://([^/:?#]+)"
# group 2 = path, group 3 = ?query. RFC 9309 matches rules against the
# path INCLUDING the query string (r7 advice finding: '?'-anchored rules
# like ('host', '/search?q=', False) must fire). `[?]` not `\?`: the
# pattern is embedded in SQL string literals of BOTH dialects and Spark
# literals process backslashes while DuckDB's don't — a bracket class
# needs no escaping in either.
_PATH_RE = "^[a-zA-Z]+://[^/:?#]+(:[0-9]+)?(/[^?#]*)?([?][^#]*)?"


def _url_exprs(url_sql: str) -> tuple[str, str]:
    """(host_sql, path_sql) for the URL named by `url_sql` — shared by
    the literal-ruleset and rules-table variants. The matched path is
    path + query ('/' when the path is empty, per RFC 9309 §2.2.2)."""
    host = f"lower(regexp_extract({url_sql}, '{_HOST_RE}', 1))"
    raw_path = f"regexp_extract({url_sql}, '{_PATH_RE}', 2)"
    raw_q = f"regexp_extract({url_sql}, '{_PATH_RE}', 3)"
    path = (
        f"concat(CASE WHEN {raw_path} = '' THEN '/' ELSE {raw_path} END, "
        f"{raw_q})"
    )
    return host, path


def _check_rules(rules: list[Rule]) -> list[Rule]:
    """Validate and normalize: hosts are case-insensitive per RFC 9309,
    and the URL-side host expression lower-cases, so rule hosts are
    lower-cased here — a mixed-case rule host would otherwise silently
    never match and the whole host would default to allowed (r7 review
    finding)."""
    out: list[Rule] = []
    for host, prefix, allow in rules:
        for s in (host, prefix):
            if "'" in s or "\\" in s:
                raise ValueError(
                    f"rule parts must not contain quotes/backslashes: {s!r}"
                )
        out.append((host.lower(), prefix, allow))
    return out


def robots_exprs(d: dict, rules: list[Rule], url_sql: str) -> dict[str, str]:
    """Column expressions evaluating `rules` against the URL named by
    `url_sql`: host, path (default '/'), matched_len (longest matching
    prefix length, -1 when no rule matched) and allowed."""
    rules = _check_rules(rules)
    host, path = _url_exprs(url_sql)
    if not rules:
        # an empty ruleset allows everything; the HOF form would build
        # an untyped empty array literal (unresolvable lambda fields)
        return {
            "host": host,
            "path": path,
            "matched_len": "CAST(-1 AS BIGINT)",
            "allowed": "true",
        }
    rules_arr = d["arr"]([d["struct"](h, p, a) for h, p, a in rules])
    matches = d["filter"](
        rules_arr,
        f"r -> r.host = {host} AND left({path}, length(r.prefix)) = r.prefix",
    )
    best = d["best"](d["transform"](matches, "r -> " + d["mk_match"]("r")))
    return {
        "host": host,
        "path": path,
        "matched_len": f"CAST(coalesce(({best}).len, -1) AS BIGINT)",
        "allowed": f"coalesce(({best}).allow, true)",
    }


def robots_filter(
    df: DataFrame,
    rules: list[Rule],
    url_col: str = "url",
) -> DataFrame:
    """Annotate each row's URL with the REP verdict: (…, host, path,
    matched_len, allowed). Callers drop `allowed = false` rows before
    fetching; keeping the verdict columns makes the compliance decision
    auditable (and exactly oracle-checkable). Zero-shuffle projection —
    the ruleset is a plan literal, evaluation is per-row HOFs."""
    exprs = robots_exprs(SPARK_D, rules, url_col)
    out = df
    for name, sql in exprs.items():
        out = out.withColumn(name, F.expr(sql))
    return out


def robots_filter_table(
    df: DataFrame,
    rules_df: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Rules-as-DATA variant of `robots_filter` — the web-scale form
    (VERDICT r7 #2): a crawl frontier has 10⁶+ hosts, and a ruleset
    that grows with the crawl cannot be a plan literal (the literal is
    the classifier-weights pattern, correct only for a BOUNDED host
    set). `rules_df(host string, prefix string, allow boolean)` is a
    table: per-host rule arrays via ONE aggregate over the (tiny
    per-host) rules, then a LEFT equi-join on host — deliberately NO
    broadcast hint: under `autoBroadcastJoinThreshold` Spark broadcasts
    the aggregated ruleset (the local/fixture case), above it the join
    shuffles on host (the web-scale case) — the same policy the
    broadcast lint enforces repo-wide. The longest-match resolution is
    the SAME struct-ordering HOF as the literal variant; the two are
    parity-pinned in tests (identical verdicts on the fixture ruleset).

    Verdict columns match `robots_filter`: host, path, matched_len
    (-1 = no rule), allowed (no rules for host → allowed: filter/sort
    over the NULL rule array is NULL, coalesced to the RFC default)."""
    host_sql, path_sql = _url_exprs(url_col)
    host_rules = rules_df.groupBy(
        F.lower(F.col("host")).alias("_rhost")
    ).agg(
        F.expr(
            "collect_list(named_struct('prefix', prefix, 'allow', allow))"
        ).alias("_rules")
    )
    annotated = df.withColumn("host", F.expr(host_sql)).withColumn(
        "path", F.expr(path_sql)
    )
    joined = annotated.join(
        host_rules, annotated["host"] == host_rules["_rhost"], "left"
    ).drop("_rhost")
    matches = (
        "filter(_rules, r -> left(path, length(r.prefix)) = r.prefix)"
    )
    best = (
        f"try_element_at(reverse(array_sort(transform({matches}, "
        "r -> named_struct('len', length(r.prefix), 'allow', r.allow)))), 1)"
    )
    return joined.withColumn(
        "matched_len", F.expr(f"CAST(coalesce(({best}).len, -1) AS BIGINT)")
    ).withColumn(
        "allowed", F.expr(f"coalesce(({best}).allow, true)")
    ).drop("_rules")
