"""WARC (Web ARChive) record reading as PURE column expressions — the
ingestion format web crawls actually ship in (ISO 28500; Common Crawl's
container). A crawl file is a concatenation of records:

    WARC/1.0\\r\\n
    WARC-Type: response\\r\\n
    WARC-Target-URI: <url>\\r\\n
    Content-Length: <n>\\r\\n
    \\r\\n
    <payload>\\r\\n\\r\\n

Reference parity: the reference reads crawls with
StreamInputFormat/StreamXmlRecordReader-style record boundaries
(src/contrib/streaming/.../StreamXmlRecordReader.java); this is the
same fixed-delimiter record-splitting idea expressed as JVM-side
split/explode/regexp columns — no Python in the path, codegen end to
end, so a 100 TB crawl parse is scan-bound.

URL hygiene helpers (host extraction, query-string strip, path depth,
host blocklist) cover the curation pipeline's URL-filter stage; both
they and the record parser use ONE regex dialect shared with the
DuckDB oracles.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# record boundary: a record TERMINATOR (CRLFCRLF) immediately followed
# by the next record's version line. Requiring the full
# "\r\n\r\nWARC/1.0\r\n" sequence (not a bare "WARC/1.0") means a body
# that merely mentions WARC/1.0 — e.g. a page about the WARC format —
# no longer mis-splits; only a body containing the exact
# terminator+header byte sequence would, which ISO 28500 prevents in
# conforming writers (Content-Length delimits the payload; see
# parse_warc_record for the length-based body slice).
_RECORD_SPLIT = r"\r\n\r\n(?=WARC/1\.0\r\n)"
_URI_RE = r"WARC-Target-URI: ([^\r\n]+)"
_TYPE_RE = r"WARC-Type: ([^\r\n]+)"
_LEN_RE = r"Content-Length: ([0-9]+)"
# fallback ONLY for records with no parseable Content-Length: first
# blank line to the next blank line. This truncates bodies containing
# an embedded CRLFCRLF (HTTP-response payloads), which is exactly why
# conforming records are sliced by Content-Length instead.
_BODY_RE = r"\r\n\r\n([\s\S]*?)(?:\r\n\r\n|$)"
_HOST_RE = r"https?://([^/\s]+)"


def explode_warc_records(df: DataFrame, id_col: str, blob_col: str) -> DataFrame:
    """(id, record) stream: split a concatenated-WARC blob at record
    terminators (lookahead keeps each header with its record; the
    consumed CRLFCRLF is the PREVIOUS record's terminator, whose body
    is length-sliced anyway), drop empty fragments. Order within a
    blob is preserved by posexplode as `record_idx`."""
    parts = F.filter(
        F.split(F.col(blob_col), _RECORD_SPLIT), lambda p: p != ""
    )
    return df.select(
        F.col(id_col), F.posexplode(parts).alias("record_idx", "record")
    )


def parse_warc_record(record: Column) -> Column:
    """struct(warc_type, target_uri, content_length, body) from one
    record's text. Missing headers parse to empty string / null length
    (regexp_extract's no-match convention — identical in DuckDB).

    The body is sliced by the parsed Content-Length — substring
    starting right after the first header-terminating CRLFCRLF — so a
    payload containing its own blank lines (an HTTP response: status
    line + headers + CRLFCRLF + HTML) survives intact; ISO 28500
    defines Content-Length as the payload delimiter, and the ADVICE-r5
    review showed the old blank-line regex silently truncated such
    bodies. In this text-typed reader lengths count CHARACTERS (the
    fixture writer `response_record` emits len(body) chars); a
    byte-oriented crawl should decode after member splitting
    (explode_gzip_member_records) where lengths are still bytes.
    Records with no Content-Length fall back to the blank-line regex
    (documented truncation)."""
    hdr_end = F.instr(record, "\r\n\r\n")
    clen = F.regexp_extract(record, _LEN_RE, 1).try_cast("long")
    # try_cast the int narrowing too: a record declaring
    # Content-Length > 2^31-1 is legal WARC, and a hard cast raises
    # CAST_OVERFLOW under ANSI mode — killing the whole ingest job for
    # one record (ADVICE r6). Oversized records degrade to the
    # blank-line slice like length-less ones.
    clen_i = clen.try_cast("int")
    body = F.when(
        (hdr_end > 0) & clen_i.isNotNull(),
        record.substr(hdr_end + F.lit(4), clen_i),
    ).otherwise(F.regexp_extract(record, _BODY_RE, 1))
    return F.struct(
        F.regexp_extract(record, _TYPE_RE, 1).alias("warc_type"),
        F.regexp_extract(record, _URI_RE, 1).alias("target_uri"),
        clen.alias("content_length"),
        body.alias("body"),
    )


def response_record(uri: str, body: str) -> str:
    """One WARC/1.0 response record as text (CRLF framing,
    Content-Length = character length of the body) — the single
    fixture-side twin of `parse_warc_record`, so every test/query
    builder shares one record format and cannot drift from the
    parser's header/body expectations."""
    crlf = "\r\n"
    return (
        f"WARC/1.0{crlf}WARC-Type: response{crlf}"
        f"WARC-Target-URI: {uri}{crlf}"
        f"Content-Length: {len(body)}{crlf}{crlf}{body}{crlf}{crlf}"
    )


def gzip_member(payload: bytes) -> bytes:
    """One gzip MEMBER (RFC 1952) for `payload`, deterministic: fixed
    compression level, and zlib's gzip wrapper writes MTIME=0/OS=255
    (unlike gzip.compress, whose header embeds wall-clock mtime). Real
    Common Crawl WARC files are a concatenation of these — one member
    per record — so readers can split work at member boundaries."""
    c = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
    return c.compress(payload) + c.flush()


def split_gzip_members(blob: bytes) -> list[bytes]:
    """Inflate a concatenation of gzip members into the list of member
    payloads. zlib's decompressobj stops at each member's end and hands
    back the remainder in `unused_data`, which is exactly the member
    boundary walk; a truncated/corrupt tail yields the members before
    it (tolerant, like the multimodal malformed-payload paths)."""
    out: list[bytes] = []
    data = bytes(blob or b"")
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            payload = d.decompress(data)
        except zlib.error:
            break
        if not d.eof:  # truncated member
            break
        out.append(payload)
        data = d.unused_data
    return out


def explode_gzip_member_records(
    df: DataFrame, id_col: str, blob_col: str, encoding: str = "utf-8"
) -> DataFrame:
    """(id, member_idx, record) stream from per-record-gzipped WARC
    blobs — the layout Common Crawl actually ships (each record its own
    gzip member, members concatenated). Codec work is genuinely not
    expressible as Catalyst expressions, so this is the documented
    Python tier: Arrow-batched mapInPandas where the per-byte work
    (inflate) runs in zlib's C core, not the interpreter. At 100 TB the
    file set is read as whole-member splits (binaryFile / combine
    packing upstream), and this stage is decompression-bound and
    embarrassingly parallel — no shuffle is introduced here."""
    import pandas as pd

    id_field = df.schema[id_col].dataType.simpleString()

    def gen(it):
        for pdf in it:
            ids: list = []
            idxs: list[int] = []
            recs: list[str] = []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                for j, payload in enumerate(split_gzip_members(blob)):
                    ids.append(i)
                    idxs.append(j)
                    recs.append(payload.decode(encoding, errors="replace"))
            yield pd.DataFrame(
                {id_col: ids, "member_idx": idxs, "record": recs}
            )

    return df.select(id_col, blob_col).mapInPandas(
        gen, f"{id_col} {id_field}, member_idx int, record string"
    )


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, _HOST_RE, 1)


def strip_query(url: Column) -> Column:
    """Drop ?query and #fragment — the canonicalization step before
    URL-level dedup."""
    return F.regexp_replace(url, r"[?#].*$", "")


def path_depth(url: Column) -> Column:
    """Number of path segments after the host ('/a/b/c' -> 3)."""
    path = F.regexp_replace(url, r"^https?://[^/]*", "")
    clean = F.regexp_replace(path, r"[?#].*$", "")
    return F.size(
        F.filter(F.split(clean, "/"), lambda s: s != "")
    ).cast("long")


def url_filter(
    df: DataFrame,
    url_col: str,
    blocked_host_re: str | None = None,
    max_path_depth: int | None = None,
) -> DataFrame:
    """The curation URL gate: drop rows whose host matches the
    blocklist regex or whose path nests deeper than `max_path_depth`
    (deep paths correlate with calendars/faceted listings — the C4/
    CCNet-era crawl heuristics). Scan-local projection + filter."""
    out = df
    if blocked_host_re is not None:
        out = out.filter(
            ~url_host(F.col(url_col)).rlike(blocked_host_re)
        )
    if max_path_depth is not None:
        out = out.filter(path_depth(F.col(url_col)) <= max_path_depth)
    return out
