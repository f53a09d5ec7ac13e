"""WARC 1.1 archive sink + source (ISO 28500; IIPC WARC/1.1 spec).

The reference persists fetched pages as loose markdown/JSON files under
`downloads/` (reference: src/lib/crawler/checkpoint.ts, the per-page
write in src/sites/*/main.ts) — fine at 2.6k documents, unusable at
10^10. The standard web-archive answer is WARC: fetches are framed as
self-describing records, compressed one-gzip-member-per-record so a
reader can seek straight to any record (spec annex D.2), and indexed
by a sidecar table (the CDX analog — here parquet, so the index itself
is a Spark-joinable DataFrame).

Scale shape:
  * `write_warc` is MAP-ONLY — one `.warc.gz` file per input partition,
    no shuffle; size files by repartitioning upstream. Each task streams
    its partition through gzip without materializing the file in memory.
  * The manifest (file, offset, length, record id, digest) comes back as
    a DataFrame: record-level random access costs one ranged read, and
    dedup/replication audits are joins against the index, not archive
    scans.
  * `read_warc` distributes over files via Spark's `binaryFile` source
    and parses members inside `mapInPandas` — Arrow-batched, no per-row
    Python boundary crossings beyond the one decode pass.

Determinism: record IDs are content-derived (sha1 over type|uri|date|
payload rendered as a urn:uuid), gzip members carry mtime=0, and the
WARC-Date comes from the caller (a column or a pinned constant), so an
identical crawl produces byte-identical archives — which is what lets
tests pin bytes and lets a resumed crawl skip already-archived records
by digest.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CRLF = b"\r\n"
_VERSION = b"WARC/1.1"

#: A pinned default so tests and re-runs are byte-stable; real crawls
#: pass the fetch timestamp column instead.
DEFAULT_DATE = "2026-01-01T00:00:00Z"


# --------------------------------------------------------------------------
# record framing (pure python — unit-testable without Spark)
# --------------------------------------------------------------------------
def _b32_sha1(data: bytes) -> str:
    """Labelled digest in the spec's canonical form (§5.8): algorithm
    prefix + RFC 4648 Base32 of the raw digest."""
    return "sha1:" + base64.b32encode(hashlib.sha1(data).digest()).decode("ascii")


def _record_id(warc_type: str, uri: str, date: str, payload: bytes) -> str:
    h = hashlib.sha1(
        b"|".join([warc_type.encode(), uri.encode(), date.encode(), payload])
    ).hexdigest()
    return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def make_record(
    warc_type: str,
    payload: bytes,
    *,
    uri: str | None = None,
    date: str = DEFAULT_DATE,
    content_type: str = "application/octet-stream",
    extra: list[tuple[str, str]] | None = None,
    payload_digest: str | None = None,
) -> bytes:
    """One WARC record: version line, named fields, CRLF, block,
    CRLF CRLF trailer (spec §4). Field order follows the spec examples;
    Content-Length counts the block exactly."""
    fields: list[tuple[str, str]] = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", _record_id(warc_type, uri or "", date, payload)),
        ("WARC-Date", date),
    ]
    if uri is not None:
        fields.append(("WARC-Target-URI", uri))
    fields.append(("WARC-Block-Digest", _b32_sha1(payload)))
    if payload_digest is not None:
        fields.append(("WARC-Payload-Digest", payload_digest))
    fields.extend(extra or [])
    fields.append(("Content-Type", content_type))
    fields.append(("Content-Length", str(len(payload))))
    head = _VERSION + CRLF
    head += b"".join(f"{k}: {v}".encode("utf-8") + CRLF for k, v in fields)
    return head + CRLF + payload + CRLF + CRLF


def http_response_block(
    status: int, headers: list[tuple[str, str]], body: bytes
) -> bytes:
    """Render the stored HTTP/1.1 message for a response record
    (content-type application/http;msgtype=response)."""
    reason = {200: "OK", 304: "Not Modified", 404: "Not Found"}.get(status, "")
    line = f"HTTP/1.1 {status} {reason}".rstrip().encode("ascii")
    hdrs = b"".join(f"{k}: {v}".encode("utf-8") + CRLF for k, v in headers)
    return line + CRLF + hdrs + CRLF + body


def make_response_record(
    uri: str,
    status: int,
    body: bytes,
    *,
    date: str = DEFAULT_DATE,
    http_headers: list[tuple[str, str]] | None = None,
) -> bytes:
    headers = list(http_headers or [])
    if not any(k.lower() == "content-length" for k, _ in headers):
        headers.append(("Content-Length", str(len(body))))
    block = http_response_block(status, headers, body)
    return make_record(
        "response",
        block,
        uri=uri,
        date=date,
        content_type='application/http;msgtype=response',
        payload_digest=_b32_sha1(body),
    )


def make_warcinfo(filename: str, *, date: str = DEFAULT_DATE, software: str = "crawler-spark") -> bytes:
    body = (
        f"software: {software}\r\n"
        "format: WARC File Format 1.1\r\n"
    ).encode("utf-8")
    return make_record(
        "warcinfo",
        body,
        date=date,
        content_type="application/warc-fields",
        extra=[("WARC-Filename", filename)],
    )


def gzip_member(record: bytes) -> bytes:
    """One record per gzip member (spec annex D.2) with mtime pinned to
    0 so archives are byte-deterministic."""
    return gzip.compress(record, mtime=0)


# --------------------------------------------------------------------------
# parsing
# --------------------------------------------------------------------------
def _split_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, inflated_bytes) per gzip member of a
    concatenated-member .warc.gz, or the whole buffer for plain WARC."""
    if data[:2] != b"\x1f\x8b":
        yield 0, len(data), data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, consumed, out
        pos += consumed


def _parse_one(raw: bytes) -> dict:
    """Parse a single framed record (already inflated)."""
    head_end = raw.index(CRLF + CRLF)
    lines = raw[:head_end].split(CRLF)
    if not lines[0].startswith(b"WARC/"):
        raise ValueError(f"bad WARC version line: {lines[0][:20]!r}")
    fields: dict[str, str] = {}
    for ln in lines[1:]:
        k, _, v = ln.decode("utf-8").partition(":")
        fields[k.strip()] = v.strip()
    n = int(fields["Content-Length"])
    payload = raw[head_end + 4 : head_end + 4 + n]
    if _b32_sha1(payload) != fields.get("WARC-Block-Digest", _b32_sha1(payload)):
        raise ValueError(f"block digest mismatch in {fields.get('WARC-Record-ID')}")
    return {"fields": fields, "payload": payload}


def parse_warc(data: bytes) -> list[dict]:
    """All records in a .warc / .warc.gz buffer, each dict carrying
    `fields`, `payload`, and its member `offset`/`length` (the CDX
    coordinates for ranged re-reads)."""
    out = []
    for off, clen, chunk in _split_members(data):
        pos = 0
        while pos < len(chunk):
            # skip inter-record padding (plain-WARC concatenation)
            nxt = chunk.find(b"WARC/", pos)
            if nxt < 0:
                break
            rec = _parse_one(chunk[nxt:])
            body_len = int(rec["fields"]["Content-Length"])
            head_len = chunk.index(CRLF + CRLF, nxt) + 4 - nxt
            rec["offset"], rec["length"] = off, clen
            out.append(rec)
            pos = nxt + head_len + body_len + 4
    return out


def parse_http_response(block: bytes) -> tuple[int, list[tuple[str, str]], bytes]:
    head_end = block.index(CRLF + CRLF)
    lines = block[:head_end].split(CRLF)
    status = int(lines[0].split(b" ")[1])
    headers = []
    for ln in lines[1:]:
        k, _, v = ln.decode("utf-8").partition(":")
        headers.append((k.strip(), v.strip()))
    return status, headers, block[head_end + 4 :]


def read_member(path: str, offset: int, length: int) -> dict:
    """Record-level random access via the manifest coordinates: one
    ranged read + one member inflate — never a file scan."""
    with open(path, "rb") as f:
        f.seek(offset)
        buf = f.read(length)
    recs = parse_warc(buf)
    return recs[0]


# --------------------------------------------------------------------------
# distributed sink / source
# --------------------------------------------------------------------------
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("payload_digest", T.StringType()),
    ]
)


def write_warc(
    pages: DataFrame,
    out_dir: str,
    *,
    date: str = DEFAULT_DATE,
    date_col: str | None = None,
    software: str = "crawler-spark",
) -> DataFrame:
    """Archive a pages DataFrame (`url`, `status`, `body`; optional
    `date_col` for per-row WARC-Date) as one `.warc.gz` per partition,
    returning the manifest/index DataFrame.

    Map-only: no shuffle — control file count/size by repartitioning
    upstream (e.g. `.repartition(n_files, "host")` to co-locate a host's
    pages in one archive). `out_dir` must be a filesystem every executor
    can reach (shared store on a cluster; local path on local[N]).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    cols = ["url", "status", "body"] + ([date_col] if date_col else [])

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}.warc.gz"
        path = os.path.join(out_dir, fname)
        fh: io.BufferedWriter | None = None
        offset = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if fh is None:
                fh = open(path, "wb")
                info = gzip_member(
                    make_warcinfo(fname, date=date, software=software)
                )
                fh.write(info)
                offset = len(info)
            rows = []
            for r in pdf.itertuples(index=False):
                d = getattr(r, date_col) if date_col else date
                body = (r.body or "").encode("utf-8")
                rec = make_response_record(
                    r.url,
                    int(r.status),
                    body,
                    date=d,
                    http_headers=[("Content-Type", "text/html; charset=utf-8")],
                )
                member = gzip_member(rec)
                fh.write(member)
                parsed = _parse_one(rec)
                rows.append(
                    (
                        path,
                        offset,
                        len(member),
                        parsed["fields"]["WARC-Record-ID"],
                        r.url,
                        int(r.status),
                        _b32_sha1(body),
                    )
                )
                offset += len(member)
            yield pd.DataFrame(rows, columns=[f.name for f in MANIFEST_SCHEMA.fields])
        if fh is not None:
            fh.close()

    return pages.select(*cols).mapInPandas(_write, MANIFEST_SCHEMA)


READ_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("body", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def read_warc_selected(manifest: DataFrame) -> DataFrame:
    """Distributed RANGED read of chosen records: give it any filtered
    subset of the write manifest (or the `warc_index` store table) and
    each task seeks straight to its members — archives are never
    scanned. This is the scale path for replay/audit queries ("re-parse
    these 10^5 pages out of a 10^10-record archive"): the selection is
    a DataFrame filter/join on the parquet index, the I/O is
    O(selected bytes)."""
    cols = ["file", "offset", "length"]

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fh, cur = None, None
        for pdf in batches:
            rows = []
            # group by file so one handle serves consecutive rows
            for r in pdf.sort_values(["file", "offset"]).itertuples(index=False):
                if r.file != cur:
                    if fh is not None:
                        fh.close()
                    fh, cur = open(r.file, "rb"), r.file
                fh.seek(r.offset)
                rec = parse_warc(fh.read(r.length))[0]
                status, body = None, None
                if rec["fields"]["WARC-Type"] == "response":
                    status, _, raw = parse_http_response(rec["payload"])
                    body = raw.decode("utf-8", "replace")
                else:
                    body = rec["payload"].decode("utf-8", "replace")
                rows.append(
                    (
                        r.file,
                        rec["fields"]["WARC-Record-ID"],
                        rec["fields"]["WARC-Type"],
                        rec["fields"].get("WARC-Target-URI"),
                        rec["fields"]["WARC-Date"],
                        status,
                        body,
                        r.offset,
                        r.length,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in READ_SCHEMA.fields])
        if fh is not None:
            fh.close()

    return manifest.select(*cols).mapInPandas(_fetch, READ_SCHEMA)


def read_warc(
    spark: SparkSession, path_glob: str, *, include_warcinfo: bool = False
) -> DataFrame:
    """Distributed WARC read: files fan out via the binaryFile source,
    members parse Arrow-batched inside mapInPandas. Responses surface
    their HTTP status + decoded body; other record types keep the raw
    payload as the body."""
    files = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                for rec in parse_warc(bytes(r.content)):
                    wtype = rec["fields"]["WARC-Type"]
                    if wtype == "warcinfo" and not include_warcinfo:
                        continue
                    status, body = None, None
                    if wtype == "response":
                        status, _, raw = parse_http_response(rec["payload"])
                        body = raw.decode("utf-8", "replace")
                    else:
                        body = rec["payload"].decode("utf-8", "replace")
                    rows.append(
                        (
                            r.path,
                            rec["fields"]["WARC-Record-ID"],
                            wtype,
                            rec["fields"].get("WARC-Target-URI"),
                            rec["fields"]["WARC-Date"],
                            status,
                            body,
                            rec["offset"],
                            rec["length"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in READ_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(_parse, READ_SCHEMA)
