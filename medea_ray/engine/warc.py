"""WARC (ISO 28500 / WARC/1.0) source: read Common-Crawl-style web archive
files into the pages schema ``(url, warc_ts, html, text, lang)``.

The north-star input is "Common-Crawl-style web pages"; Common Crawl
publishes them as WARC files — one ~1 GB gzip file per crawl shard, each
``response`` record gzip-compressed as its OWN member so readers can
stream record-at-a-time.  This module provides

- :func:`make_warc` — a deterministic writer (fixtures, tests; both the
  per-record-gzip-member layout Common Crawl uses and plain uncompressed),
- :func:`iter_warc_records` — a tolerant record walker over raw bytes
  (truncated / garbage tails yield the complete prefix, never raise),
- :func:`read_warc` — the Ray Data source: a path-per-row dataset whose
  read task opens the RAW bytes itself (``read_binary_files`` is
  deliberately NOT used: it transparently gunzips ``.warc.gz`` by
  extension, so one corrupt member kills the whole task) and expands each
  file to one row per ``response`` record.

Scale shape: the parallel unit is one WARC FILE (gzip members cannot be
split without an external index; Common Crawl shards are ~1 GB, so 100 TB
is ~100k files → far more tasks than any cluster has slots).  Each read
task holds one decompressed file in memory at a time; the pages it emits
flow as Arrow blocks with ``large_binary`` html payloads.

Reference semantics: the reference validates JSON documents and has no
WARC notion; this source exists so its validation engine applies to the
north-rule input (BASELINE.json input_hint) end-to-end.
"""

from __future__ import annotations

import gzip
import io
import uuid
import zlib
from datetime import datetime, timezone

import pyarrow as pa

__all__ = [
    "make_warc",
    "iter_warc_records",
    "parse_http_response",
    "read_warc",
    "warc_records_to_table",
]

_CRLF = b"\r\n"
# Arrow schema of the rows read_warc emits (pages shape + provenance).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("http_status", pa.int32()),
        ("warc_path", pa.string()),
    ]
)


def _warc_date(ts: datetime) -> str:
    """WARC-Date format (ISO 8601 Zulu, second precision — the Common Crawl
    convention)."""
    return ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def _parse_warc_date(s: str) -> datetime | None:
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def make_warc(
    records: list[dict],
    *,
    gzip_members: bool = True,
    warcinfo: bool = True,
) -> bytes:
    """Serialize ``records`` (dicts with ``url``, ``date`` (aware datetime),
    ``html`` (bytes), optional ``status``) as a WARC/1.0 byte stream.

    ``gzip_members=True`` compresses each record as its own gzip member
    (the Common Crawl layout); ``False`` writes plain concatenated records.
    Record-IDs are uuid5 of the target URI, so output is a pure function
    of the input — fixture generation and resume tests rely on that.
    """
    out = []

    def emit(headers: list[tuple[str, str]], block: bytes):
        head = b"WARC/1.0" + _CRLF
        head += b"".join(
            f"{k}: {v}".encode() + _CRLF for k, v in headers
        )
        head += f"Content-Length: {len(block)}".encode() + _CRLF + _CRLF
        rec = head + block + _CRLF + _CRLF
        if gzip_members:
            buf = io.BytesIO()
            # mtime pinned for byte-determinism of the fixture stream
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out.append(buf.getvalue())
        else:
            out.append(rec)

    if warcinfo:
        info = b"software: medea_ray make_warc\r\nformat: WARC File Format 1.0\r\n"
        emit(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Record-ID", f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, 'warcinfo')}>"),
                ("WARC-Date", _warc_date(datetime(2026, 1, 1, tzinfo=timezone.utc))),
                ("Content-Type", "application/warc-fields"),
            ],
            info,
        )
    for r in records:
        html: bytes = r["html"]
        status = int(r.get("status", 200))
        http = (
            f"HTTP/1.1 {status} OK".encode() + _CRLF
            + b"Content-Type: text/html; charset=utf-8" + _CRLF
            + f"Content-Length: {len(html)}".encode() + _CRLF + _CRLF
            + html
        )
        emit(
            [
                ("WARC-Type", "response"),
                ("WARC-Record-ID", f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, r['url'])}>"),
                ("WARC-Date", _warc_date(r["date"])),
                ("WARC-Target-URI", r["url"]),
                ("Content-Type", "application/http; msgtype=response"),
            ],
            http,
        )
    return b"".join(out)


def _gunzip_members(data: bytes, *, _chunk: int = 1 << 20) -> bytes:
    """Decompress a multi-member gzip stream; tolerate a truncated or
    garbage tail by returning every complete member decoded so far (plus
    the decoded prefix of a truncated final member — the record walker
    drops any truncated final record anyway).

    Linear in file size: each member's decompressor is fed bounded chunks
    through a memoryview.  The obvious ``d.unused_data`` loop copies the
    entire remaining compressed tail once per member — O(members × bytes),
    hours on a real ~1 GB Common-Crawl shard with one member per record."""
    out: list[bytes] = []
    mv = memoryview(data)
    pos, n = 0, len(data)
    while pos + 2 <= n and data[pos : pos + 2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        member_start = len(out)
        try:
            while not d.eof and pos < n:
                end = min(pos + _chunk, n)
                out.append(d.decompress(mv[pos:end]))
                pos = end
        except zlib.error:
            del out[member_start:]  # corrupt member contributes nothing
            break
        if not d.eof:
            break  # truncated final member: keep the decoded prefix
        # Only chunks fed after this member's end are unconsumed, so the
        # rewind stays within the last chunk.
        pos -= len(d.unused_data)
    return b"".join(out)


def iter_warc_records(data: bytes):
    """Yield ``(headers: dict[str,str], block: bytes)`` per WARC record.

    Tolerant walker: gzip multi-member streams are decompressed first;
    records with unparseable version lines / missing Content-Length are
    skipped by scanning to the next ``WARC/`` magic; a truncated final
    record is dropped.  Never raises on untrusted bytes.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos, n = 0, len(data)
    while pos < n:
        nl = data.find(_CRLF, pos)
        if nl < 0:
            return
        version = data[pos:nl]
        if not version.startswith(b"WARC/"):
            nxt = data.find(b"WARC/", pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        hdr_end = data.find(_CRLF + _CRLF, nl)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        ok = True
        for line in data[nl + 2 : hdr_end].split(_CRLF):
            k, sep, v = line.partition(b":")
            if not sep:
                ok = False
                break
            try:
                headers[k.decode("ascii").strip().lower()] = v.decode(
                    "utf-8", "replace"
                ).strip()
            except UnicodeDecodeError:
                ok = False
                break
        body_start = hdr_end + 4
        if not ok:
            pos = body_start
            continue
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            pos = body_start
            continue
        if clen < 0 or body_start + clen > n:
            return  # truncated final record
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen + 4  # skip the \r\n\r\n record separator


def parse_http_response(block: bytes) -> tuple[int | None, bytes]:
    """Split an ``application/http; msgtype=response`` block into
    (status_code, payload).  A block without an HTTP head (or a mangled
    status line) comes back as ``(None, block)`` — payload over nothing."""
    if not block.startswith(b"HTTP/"):
        return None, block
    head_end = block.find(_CRLF + _CRLF)
    if head_end < 0:
        return None, block
    status_line = block[: block.find(_CRLF)]
    parts = status_line.split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = None
    return status, block[head_end + 4 :]


def warc_records_to_table(data: bytes, path: str = "") -> pa.Table:
    """One WARC file's bytes → an Arrow table of its ``response`` records
    in :data:`PAGES_SCHEMA` order."""
    urls, tss, htmls, statuses = [], [], [], []
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        status, payload = parse_http_response(block)
        ts = _parse_warc_date(headers.get("warc-date", ""))
        urls.append(headers.get("warc-target-uri"))
        tss.append(None if ts is None else ts.replace(tzinfo=None))
        htmls.append(payload)
        statuses.append(status)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.large_binary()),
            "http_status": pa.array(statuses, pa.int32()),
            "warc_path": pa.array([path] * len(urls), pa.string()),
        }
    )


def read_warc(paths: list[str] | str, *, on_corrupt: str = "fail"):
    """Ray Data WARC source: one read task per file (the gzip-member
    layout forbids intra-file splits), each opening the raw bytes itself —
    NOT ``read_binary_files``, which would transparently gunzip by
    extension and crash the task on one corrupt member — and expanding to
    one row per response record.

    ``on_corrupt="skip"`` maps an unreadable file to zero rows (the
    tolerant walker already drops truncated tails record-wise);
    ``"fail"`` propagates.
    """
    import ray.data as rd
    from pyarrow import fs as pafs

    if on_corrupt not in ("fail", "skip"):
        raise ValueError(f"on_corrupt must be 'fail' or 'skip', got {on_corrupt!r}")
    if isinstance(paths, str):
        paths = [paths]
    if not paths:
        raise ValueError("read_warc: empty path list")

    # One row per file, one read task per row.  The bytes are opened INSIDE
    # the task with compression=None — both Ray's read_binary_files and
    # pyarrow's default 'detect' mode transparently gunzip a ``.warc.gz``
    # path by extension (and a corrupt member then blows up the whole read
    # task); the record walker owns decompression, member-at-a-time and
    # tolerant, so raw bytes must reach it.
    files = rd.from_items([{"path": p} for p in sorted(paths)])

    def expand(batch: pa.Table) -> pa.Table:
        tables = []
        for path in batch.column("path").to_pylist():
            try:
                if "://" in path:
                    f, rel = pafs.FileSystem.from_uri(path)
                else:
                    f, rel = pafs.LocalFileSystem(), path
                with f.open_input_stream(rel, compression=None) as stream:
                    raw = stream.readall()
                tables.append(warc_records_to_table(raw, path))
            except Exception:
                if on_corrupt != "skip":
                    raise
        if not tables:
            return PAGES_SCHEMA.empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(expand, batch_format="pyarrow", batch_size=1)
