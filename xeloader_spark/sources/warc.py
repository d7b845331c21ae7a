"""WARC (ISO 28500) web-archive source — the native container format of
web-scale pretraining corpora (Common Crawl ships WARC; every public
crawl-ingestion pipeline starts by splitting WARC records and peeling
the HTTP envelope off response records).

Reference parity note: XELoader's ingest surface is "opaque container →
typed event rows" (FileProcessor.cs:203 drives a closed SDK the same
way); this source is the training-data analogue for the crawl
container, built the repo's way: a deterministic in-plan fixture
(records synthesized from the documents table — no binary fixture file
to ship), a pure string-function record parser, and a DuckDB oracle
that replays synthesis AND parsing exactly.

Three physical paths share ONE parser tail (`parse_warc_records`):
`read_warc` (records born as rows in the text source — the 100 TB
path), `parse_warc` (whole-file blob rows — fixture/stream twin), and
`read_warc_gz` (gzip-member archives via incremental inflate). See
SCALE.md §WARC ingestion at crawl scale for when each applies.

Format simplification, documented: record boundaries are found by
splitting on the version line `WARC/1.0` CRLF (the streaming
simplification every line-oriented WARC splitter uses); the spec's
Content-Length-driven offset walk is inherently sequential per file and
does not decompose into per-record data parallelism. The trade is
visible, not silent: every parsed record carries `len_ok` =
(declared Content-Length == reconstructed HTTP-block length), so a
payload that embedded a version line at line start — the one case the
split mis-handles — surfaces as a FALSE instead of silent corruption.

Both the synthesis template and the parser are emitted by ONE builder
parameterized over a tiny engine dialect (string-cast keyword, regex
split function, 1-based array indexing), so the Spark plan and the
DuckDB oracle cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Regex patterns are authored with SINGLE backslashes; the dialect's
# `re` hook handles string-literal escaping: Spark SQL literals process
# C-style escapes (pattern backslashes must be doubled in the SQL
# text), DuckDB standard-SQL literals keep backslashes verbatim.
SPARK_DIALECT = {
    "S": "STRING",
    "re": lambda p: p.replace("\\", "\\\\"),
    "split": lambda s, pat: f"split({s}, '{pat}')",
    # try_element_at: out-of-range → NULL (ANSI element_at throws), the
    # same semantics DuckDB bracket indexing gives — malformed records
    # must yield NULL fields, not a task crash on hostile crawl bytes
    "idx": lambda arr, i: f"try_element_at({arr}, {i})",  # 1-based
    # replace ALL matches: Spark's regexp_replace is global by default
    "gsub": lambda s, pat, rep: f"regexp_replace({s}, '{pat}', '{rep}')",
    # codepoint → character. Spark's chr() is mod-256 ASCII — WRONG for
    # anything past Latin-1 — so render the codepoint as one UTF-32BE
    # unit and decode it (exact for every Unicode scalar value; callers
    # guard out surrogates/overflow, where the engines diverge)
    "chr": lambda n: f"decode(unhex(lpad(hex({n}), 8, '0')), 'UTF-32')",
    # hex string → BIGINT (Spark can't cast '0x...' strings)
    "hex2int": lambda s: f"CAST(conv({s}, 16, 10) AS BIGINT)",
    # fold a split array: element 1 passes through verbatim, every
    # later element is rewritten by `body` (lambda var _e) and
    # concatenated — the shape of "rewrite every delimiter-suffixed
    # segment" decoders (numeric character references). NULL input
    # folds to NULL in both dialects (concat/|| are NULL-propagating
    # in Spark; list_reduce of NULL is NULL in DuckDB). The Spark form
    # references `arr` three times — whole-stage codegen's
    # subexpression elimination evaluates the split once.
    "fold_tail": lambda arr, body: (
        f"concat(try_element_at({arr}, 1), "
        f"array_join(transform(slice({arr}, 2, "
        f"greatest(size({arr}) - 1, 0)), _e -> {body}), ''))"
    ),
}
DUCK_DIALECT = {
    "S": "VARCHAR",
    "re": lambda p: p,
    "split": lambda s, pat: f"regexp_split_to_array({s}, '{pat}')",
    "idx": lambda arr, i: f"({arr})[{i}]",  # 1-based
    # DuckDB regexp_replace is FIRST-match-only without the 'g' flag
    "gsub": lambda s, pat, rep: f"regexp_replace({s}, '{pat}', '{rep}', 'g')",
    # chr() only accepts INTEGER; callers guard the range ≤ 0x10FFFF
    "chr": lambda n: f"chr(CAST({n} AS INTEGER))",
    "hex2int": lambda s: f"CAST(concat('0x', {s}) AS BIGINT)",
    # init-free fold: the first element seeds the accumulator (passes
    # through verbatim), so the split array is referenced ONCE (no CSE
    # assumption) and NULL input folds to NULL (|| is NULL-propagating)
    "fold_tail": lambda arr, body: (
        f"list_reduce({arr}, (_a, _e) -> _a || ({body}))"
    ),
}

_CRLF_RE = r"\r\n"
_CRLF2_RE = _CRLF_RE + _CRLF_RE
_HTTP_STATUS_RE = r"HTTP/1\.1 ([0-9]+)"


def _crlf(d: dict) -> str:
    return "chr(13), chr(10)"


def http_block_sql(d: dict, status_sql: str, body_sql: str) -> str:
    """The HTTP response envelope inside a WARC response record."""
    return (
        f"concat('HTTP/1.1 ', {status_sql}, "
        f"CASE WHEN {status_sql} = '200' THEN ' OK' ELSE ' Not Found' END, "
        f"{_crlf(d)}, 'Content-Type: text/plain', {_crlf(d)}, {_crlf(d)}, "
        f"{body_sql})"
    )


def warc_record_sql(d: dict, id_sql: str, uri_sql: str, http_sql: str) -> str:
    """One WARC/1.0 response record: version line, WARC named headers,
    blank line, HTTP block, record separator (two CRLF). Content-Length
    is the spec's: the byte length of the record block (the HTTP
    envelope + payload)."""
    S = d["S"]
    return (
        f"concat('WARC/1.0', {_crlf(d)}, "
        f"'WARC-Type: response', {_crlf(d)}, "
        f"'WARC-Target-URI: ', {uri_sql}, {_crlf(d)}, "
        f"'WARC-Record-ID: <urn:uuid:', md5(CAST({id_sql} AS {S})), '>', "
        f"{_crlf(d)}, "
        f"'Content-Length: ', CAST(length({http_sql}) AS {S}), {_crlf(d)}, "
        f"{_crlf(d)}, {http_sql}, {_crlf(d)}, {_crlf(d)})"
    )


def parse_warc_exprs(d: dict, rec_sql: str) -> dict[str, str]:
    """Column expressions parsing ONE record body (the text after the
    version line): WARC headers / HTTP status / payload / the len_ok
    Content-Length audit. Pure string functions — identical template
    for the Spark plan and the DuckDB oracle."""
    parts = d["split"](rec_sql, d["re"](_CRLF2_RE))
    warc_hdr = d["idx"](parts, 1)
    http_hdr = d["idx"](parts, 2)
    payload = d["idx"](parts, 3)

    def hdr(name: str) -> str:
        # nullif: a missing header extracts '' — CAST('' AS BIGINT)
        # throws in BOTH engines under strict typing, NULL casts fine
        return (
            f"nullif(regexp_extract({warc_hdr}, "
            f"'{name}: ([^' || chr(13) || chr(10) || ']+)', 1), '')"
        )

    return {
        "warc_type": hdr("WARC-Type"),
        "target_uri": hdr("WARC-Target-URI"),
        "record_id": hdr("WARC-Record-ID"),
        "content_length": f"CAST({hdr('Content-Length')} AS BIGINT)",
        "http_status": (
            f"CAST(nullif(regexp_extract({http_hdr}, "
            f"'{d['re'](_HTTP_STATUS_RE)}', 1), '') AS BIGINT)"
        ),
        "payload": payload,
        # declared length vs reconstructed http block (hdr + CRLFCRLF +
        # payload) — FALSE/NULL surfaces any record-boundary miscount
        # (NULL when the record is too malformed to even have the parts)
        "len_ok": (
            f"CAST({hdr('Content-Length')} AS BIGINT) = "
            f"length({http_hdr}) + 4 + length({payload})"
        ),
    }


# The record separator: every WARC record begins with its version line.
_RECORD_SEP = "WARC/1.0\r\n"


def parse_warc_records(
    df: DataFrame,
    rec_col: str = "_rec",
    file_col: str = "warc_file",
    extra_cols: tuple = (),
) -> DataFrame:
    """Parse already-split record bodies (the text AFTER each version
    line) into typed fields. This is the shared tail of every WARC
    path — blob split, record-level reader, gzip-member reader — so the
    field semantics (and the DuckDB oracle built from the same
    `parse_warc_exprs` template) cannot drift between them. Pure string
    functions in one codegen stage; zero shuffles, zero joins."""
    exprs = parse_warc_exprs(SPARK_DIALECT, rec_col)
    return df.select(
        F.col(file_col),
        *extra_cols,
        *[F.expr(sql).alias(name) for name, sql in exprs.items()],
    )


def parse_warc(
    df: DataFrame, blob_col: str = "warc_blob", file_col: str = "warc_file"
) -> DataFrame:
    """Parse whole-file WARC blobs into typed record rows: (warc_file,
    rec_seq, warc_type, target_uri, record_id, content_length,
    http_status, payload, len_ok).

    Scale shape: ONE posexplode of the per-file record array, then every
    field is a string function inside the same codegen stage — zero
    shuffles, zero joins. NOTE the 100 TB caveat: a blob row holds an
    entire file as one JVM string, so this path is for synthesized
    fixtures and small archives only — a real ~1 GB Common Crawl WARC
    as one row sits against the 2 GB string limit and concentrates a
    whole file's parse in one task. The scale path is `read_warc`
    below, where records are born as rows in the data source; the two
    are parity-pinned in tests/test_sources_plans.py."""
    d = SPARK_DIALECT
    recs = d["split"](blob_col, d["re"](r"WARC/1\.0" + _CRLF_RE))
    exploded = df.select(
        F.col(file_col),
        F.posexplode(F.expr(recs)).alias("_pos", "_rec"),
        # element 0 precedes the first version line: empty for
        # well-formed WARC and dropped; a NON-empty preamble (corrupt
        # file) is KEPT and parses to an all-NULL audit row at
        # rec_seq=-1 — the same loud-degradation contract `read_warc`
        # documents, so the two parity-pinned paths agree on corrupt
        # input too (ADVICE r8)
    ).filter((F.col("_pos") >= 1) | (F.col("_rec") != ""))
    return parse_warc_records(
        exploded,
        extra_cols=((F.col("_pos") - 1).cast("long").alias("rec_seq"),),
    )


def read_warc(spark, path: str) -> DataFrame:
    """Record-level WARC reader — the 100 TB ingest path: records are
    born as ROWS in the data source (`spark.read.text` with the WARC
    version line as the record separator), so a ~1 GB `.warc` file
    never materializes as a single JVM string (2 GB row/string hard
    limit) and one file's parse spreads across all of its splits'
    tasks instead of one. Columns: (warc_file, warc_type, target_uri,
    record_id, content_length, http_status, payload, len_ok).

    Deliberately NO `rec_seq`: a split-parallel reader yields an
    unordered bag of records — in-file sequence is a per-task notion
    that does not survive splitting, and the spec-unique
    WARC-Record-ID is the identity key a crawl pipeline joins on. The
    blob path (`parse_warc`) keeps rec_seq for fixtures where file
    order is meaningful; the parity pin compares the two record-keyed.

    Reference parity: this is the container→rows premise of
    XELoader/FileProcessor.cs:203 (opaque event file → typed rows) at
    crawl-file scale. Plan: scan + filter + codegen string functions,
    zero exchanges (pinned)."""
    raw = (
        spark.read.option("lineSep", _RECORD_SEP)
        .text(path)
        .select(
            F.input_file_name().alias("warc_file"),
            # a UTF-8 BOM attaches to the pre-first-record segment;
            # strip it so a BOM'd but otherwise well-formed file parses
            # identically to a clean one
            F.regexp_replace("value", "^\\uFEFF", "").alias("_rec"),
        )
        # the segment before the first version line is empty for
        # well-formed WARC (files START with 'WARC/1.0\r\n') and is
        # dropped; a file with a NON-empty preamble (not valid WARC —
        # warcinfo is itself a record, not a preamble) surfaces that
        # preamble as one all-NULL audit row, the same loud-degradation
        # contract the hostile-input parser test pins: corrupt bytes
        # yield NULL fields, never silent loss or a task crash
        .filter(F.col("_rec") != "")
    )
    return parse_warc_records(raw)


def read_warc_gz(spark, path: str, batch_records: int = 1000) -> DataFrame:
    """Gzip-member `.warc.gz` reader. Common Crawl compresses EACH
    record as its own gzip member and concatenates the members, which
    makes the file non-splittable (no codec boundary index), so the
    honest scale shape is per-FILE parallelism: `binaryFile` source →
    Arrow `mapInPandas` that inflates the member stream (stdlib zlib
    handles concatenated members) and yields record rows in bounded
    batches. Same output schema and shared `parse_warc_records` tail
    as `read_warc`.

    Memory bound, stated precisely (ADVICE r8): the `binaryFile`
    source materializes each COMPRESSED file as one row, so a task's
    peak is O(compressed file + largest record + inflate chunk) — the
    incremental inflate only removes the DECOMPRESSED-file copies
    (several × larger), not the compressed one — and the 2 GB row
    limit applies to the compressed bytes. See SCALE.md §WARC for when
    to pre-decompress to a landing zone instead (recommended above ~1
    file per task-slot, and mandatory for archives whose compressed
    size approaches 2 GB)."""
    def _inflate(batches):
        import zlib

        import pandas as pd

        sep = _RECORD_SEP.encode()

        def _records(content: bytes):
            # INCREMENTAL inflate: one zlib.decompressobj per gzip
            # member (wbits=47 accepts gzip framing; unused_data chains
            # to the next concatenated member), splitting records out of
            # a rolling buffer as bytes arrive — the DECOMPRESSED side
            # stays O(largest record + inflate chunk), never the whole
            # decompressed file (a ~1 GB .warc.gz inflates to several
            # GB; gzip.decompress + str.split held TWO full copies).
            # The COMPRESSED file is still fully resident (binaryFile
            # row) — see the docstring's stated bound.
            buf = b""
            pos = 0
            while pos < len(content):
                d = zlib.decompressobj(wbits=47)
                while pos < len(content) and not d.eof:
                    chunk = content[pos : pos + (1 << 20)]
                    pos += len(chunk)
                    buf += d.decompress(chunk)
                    while True:
                        i = buf.find(sep)
                        if i < 0:
                            break
                        if i > 0:
                            yield buf[:i]
                        buf = buf[i + len(sep):]
                buf += d.flush()
                if d.eof and d.unused_data:
                    # rewind to the start of the next member
                    pos -= len(d.unused_data)
            while True:
                i = buf.find(sep)
                if i < 0:
                    break
                if i > 0:
                    yield buf[:i]
                buf = buf[i + len(sep):]
            if buf:
                yield buf

        for pdf in batches:
            for fname, content in zip(pdf["path"], pdf["content"]):
                chunk_recs, n = [], 0
                for rb in _records(bytes(content)):
                    chunk_recs.append(rb.decode("utf-8", errors="replace"))
                    n += 1
                    if n >= batch_records:
                        yield pd.DataFrame(
                            {"warc_file": [fname] * n, "_rec": chunk_recs}
                        )
                        chunk_recs, n = [], 0
                if chunk_recs:
                    yield pd.DataFrame(
                        {"warc_file": [fname] * n, "_rec": chunk_recs}
                    )

    raw = (
        spark.read.format("binaryFile")
        .load(path)
        .select("path", "content")
        .mapInPandas(_inflate, "warc_file string, _rec string")
    )
    return parse_warc_records(raw)
