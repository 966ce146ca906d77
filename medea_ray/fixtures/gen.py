"""Deterministic synthetic Common-Crawl-style web-page table.

Matches BASELINE.json's ``input_hint`` schema — ``(url:string,
warc_ts:timestamp[us], html:large_binary, text:large_string, lang:string)``
— plus a ``payload:large_string`` JSON document column (the validation
target) and is engineered to exercise every engine operator (FIXTURES.md §2):

- Zipf(1.2) hosts → skewed keys for the uniqueness/salting path.
- 1% exact duplicate urls (rows with ``i % 100 == 53`` reuse row i-13's url).
- 8 daily ``warc_ts`` partitions; day 7 shifts the lang mix (zh boosted) and
  doubles mean text length → KS/PSI drift ground truth.
- ~2% empty / ~1% null text, ~3% null lang → null-rate stats.
- ~5% seeded payload defects (``i % 100 in 95..99``), one class each, with
  exactly predictable violation rows — see ``DEFECT_SPECIFIER`` /
  ``DEFECT_PATH``.

Every row is a pure function of ``(seed, global index)`` — columns derive
from counter-based splitmix64 hashing, not RNG stream draws — so generation
shards freely across processes/nodes and any row can be recomputed in
isolation (the property the resume tests rely on).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.large_binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
        ("payload", pa.large_string()),
    ]
)

VOCAB = (
    "the data spark ray arrow batch stream shuffle merge sort join filter "
    "group window hash key value row column table scan query agg part vector "
    "fast slow big small dup drift crawl page host link text lang token"
).split()

N_HOSTS = 1000
LANGS = ["en", "de", "fr", "es", "hi", "zh"]
# Base day lang mix vs day-7 (drifted: zh boosted).
LANG_P_BASE = np.array([0.38, 0.14, 0.16, 0.16, 0.06, 0.07, 0.03])  # + None
LANG_P_DRIFT = np.array([0.20, 0.10, 0.10, 0.10, 0.05, 0.42, 0.03])
EPOCH_US = np.int64(1704067200) * 1_000_000  # 2024-01-01T00:00:00Z

# Violation ground truth: defect class by i % 100 → (failed_specifier, path).
DEFECT_SPECIFIER = {
    95: "not_one_of_options",
    96: "additional_prop_banned",
    97: "required_prop_missing",
    98: "out_of_bounds_array_length",
    99: "not_one_of_options",
}
DEFECT_PATH = {
    95: "$/meta/len",
    96: "$",
    97: "$",
    98: "$/tags",
    99: "$/tags[1]",
}

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


_M64 = (1 << 64) - 1


def _hash_stream(idx: np.ndarray, seed: int, tag: int) -> np.ndarray:
    salt = ((seed * 0x2545F4914F6CDD1D) + (tag * 0x5851F42D4C957F2D)) & _M64
    base = idx.astype(np.uint64) + np.uint64(salt)
    return _splitmix64(base)


def _uniform(idx, seed, tag) -> np.ndarray:
    return _hash_stream(idx, seed, tag).astype(np.float64) / 2.0**64


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1) ** s
    return np.cumsum(w / w.sum())


_ZIPF_CDF = _zipf_cdf(N_HOSTS, 1.2)
_LANG_CDF_BASE = np.cumsum(LANG_P_BASE)
_LANG_CDF_DRIFT = np.cumsum(LANG_P_DRIFT)


def _host_of(idx, seed):
    return np.searchsorted(_ZIPF_CDF, _uniform(idx, seed, 1))


def build_payload(url, lang, n_chars, tags, defect: int | None) -> str:
    """The per-row JSON validation target; defects map 1:1 to violation rows
    (DEFECT_SPECIFIER / DEFECT_PATH). Shared by the pages generator and the
    documents-table driver queries so the DuckDB oracle can predict the
    violation set by construction."""
    # n_chars is nullable in the documents table contract (the stats
    # oracle models its nulls); mirror the generator's 0-for-missing
    meta = {"len": 0 if n_chars is None else int(n_chars)}
    doc = {"url": url, "lang": lang, "meta": meta, "tags": list(tags)}
    if defect == 95:
        doc["meta"] = {"len": "oops"}  # wrong type for len
    elif defect == 96:
        doc["extra"] = True  # banned additional property on $start
    elif defect == 97:
        del doc["meta"]  # required property missing
    elif defect == 98:
        doc["tags"] = ["t0", "t1", "t2", "t3", "t4", "t5", "t6"]  # > max-length 5
    elif defect == 99:
        doc["tags"] = ["ok", 5]  # non-string tag at position 1
    return json.dumps(doc, separators=(",", ":"))


def gen_pages_chunk(start: int, n: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+n) of the pages table — pure in (seed, index)."""
    idx = np.arange(start, start + n, dtype=np.int64)
    host = _host_of(idx, seed)
    day = (_hash_stream(idx, seed, 2) % np.uint64(8)).astype(np.int64)
    sec = (_hash_stream(idx, seed, 3) % np.uint64(86400)).astype(np.int64)
    ts_us = EPOCH_US + (day * 86400 + sec) * 1_000_000

    # lang: day-conditional categorical; last bucket = null.
    u_lang = _uniform(idx, seed, 4)
    lang_i_base = np.searchsorted(_LANG_CDF_BASE, u_lang)
    lang_i_drift = np.searchsorted(_LANG_CDF_DRIFT, u_lang)
    lang_i = np.where(day == 7, lang_i_drift, lang_i_base)

    # text length: lognormal via Box-Muller on two hash uniforms; day 7
    # doubles the mean; ~2% empty, ~1% null.
    u1 = np.clip(_uniform(idx, seed, 5), 1e-12, 1.0)
    u2 = _uniform(idx, seed, 6)
    normal = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    mu = np.where(day == 7, 5.0 + np.log(2.0), 5.0)
    tlen = np.clip(np.exp(mu + 0.6 * normal), 5, 4000).astype(np.int64)
    u_txt = _uniform(idx, seed, 7)
    tlen = np.where(u_txt < 0.02, 0, tlen)
    text_null = u_txt >= 0.99

    n_words = np.maximum(tlen // 6, 0)
    word_h = _hash_stream(idx, seed, 8)
    n_tags = (_hash_stream(idx, seed, 9) % np.uint64(4)).astype(np.int64)

    mod = idx % 100
    V = len(VOCAB)

    urls, texts, langs, payloads, htmls = [], [], [], [], []
    for k in range(n):
        i = int(idx[k])
        if mod[k] == 53 and i >= 13:
            # exact duplicate: reuse row (i-13)'s url (pure in index).
            j = i - 13
            u = f"https://host{int(_host_of(np.array([j]), seed)[0])}.example.com/p/{j}"
        else:
            u = f"https://host{int(host[k])}.example.com/p/{i}"
        urls.append(u)

        if text_null[k]:
            t = None
        else:
            nw = int(n_words[k])
            h = int(word_h[k])
            t = " ".join(VOCAB[(h + 7 * w) % V] for w in range(nw))
        texts.append(t)
        htmls.append(None if t is None else b"<html><body>" + t.encode() + b"</body></html>")

        li = int(lang_i[k])
        lang = LANGS[li] if li < len(LANGS) else None
        langs.append(lang)

        tags = [VOCAB[(int(word_h[k]) + 13 * j) % V] for j in range(int(n_tags[k]))]
        defect = int(mod[k]) if int(mod[k]) in DEFECT_SPECIFIER else None
        n_chars = 0 if t is None else len(t)
        payloads.append(build_payload(u, lang, n_chars, tags, defect))

    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(ts_us, pa.timestamp("us")),
            pa.array(htmls, pa.large_binary()),
            pa.array(texts, pa.large_string()),
            pa.array(langs, pa.string()),
            pa.array(payloads, pa.large_string()),
        ],
        schema=PAGES_SCHEMA,
    )


def expected_violations_chunk(start: int, n: int, seed: int = 42):
    """Ground-truth violation rows (url, schema_path, failed_specifier) for
    rows [start, start+n) — the oracle the pipeline tests compare against."""
    out = []
    idx = np.arange(start, start + n, dtype=np.int64)
    host = _host_of(idx, seed)
    mod = idx % 100
    for k in range(n):
        d = int(mod[k])
        if d in DEFECT_SPECIFIER:
            i = int(idx[k])
            url = f"https://host{int(host[k])}.example.com/p/{i}"
            out.append((url, DEFECT_PATH[d], DEFECT_SPECIFIER[d]))
    return out


# JSONL page exports carry the JSON-safe columns only (the raw ``html``
# binary stays parquet-only — JSON has no binary type, and Common-Crawl
# style JSONL exports are text-derived anyway).
JSONL_COLUMNS = ["url", "warc_ts", "text", "lang", "payload"]


def _write_chunk(args) -> str:
    out_dir, c, start, n, seed, fmt, row_group_rows = args
    ext = "parquet" if fmt == "parquet" else fmt
    path = os.path.join(out_dir, f"pages_{c:05d}.{ext}")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        t = gen_pages_chunk(start, n, seed)
        if fmt == "parquet":
            pq.write_table(t, tmp, row_group_size=row_group_rows)
        else:
            import orjson

            if fmt == "jsonl.gz":
                import gzip

                # mtime=0 AND fileobj with an empty filename: byte-stable
                # output — GzipFile(path) embeds the PID-suffixed tmp
                # filename in the gzip FNAME header, breaking the
                # pure-in-(seed, index) same-bytes idempotency contract
                # of the parquet path
                with open(tmp, "wb") as raw, gzip.GzipFile(
                    filename="", mode="wb", fileobj=raw, mtime=0
                ) as f:
                    for row in t.select(JSONL_COLUMNS).to_pylist():
                        f.write(orjson.dumps(row) + b"\n")
            else:
                with open(tmp, "wb") as f:
                    for row in t.select(JSONL_COLUMNS).to_pylist():
                        f.write(orjson.dumps(row) + b"\n")
        os.replace(tmp, path)
    return path


def write_pages(
    out_dir: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 50_000,
    workers: int = 1,
    fmt: str = "parquet",
    row_group_rows: int | None = None,
) -> list[str]:
    """Write the pages table as one parquet (or JSONL / gzipped JSONL,
    ``fmt="jsonl"`` / ``"jsonl.gz"`` — the Common-Crawl export layout)
    file per chunk (the file is the engine's default checkpoint partition
    unit; ``row_group_rows`` caps parquet row-group size for exercising
    ``partition_unit="fragment"``). Returns the file list. Idempotent:
    existing complete files are kept (same bytes — generation is pure in
    (seed, index), which is also what lets ``workers > 1`` shard
    freely)."""
    if fmt not in ("parquet", "jsonl", "jsonl.gz"):
        raise ValueError(f"fmt must be 'parquet', 'jsonl' or 'jsonl.gz', got {fmt!r}")
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    for c, start in enumerate(range(0, n_rows, rows_per_file)):
        jobs.append(
            (out_dir, c, start, min(rows_per_file, n_rows - start), seed, fmt,
             row_group_rows)
        )
    if workers > 1 and len(jobs) > 1:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=workers) as ex:
            return list(ex.map(_write_chunk, jobs))
    return [_write_chunk(j) for j in jobs]


FLAGSHIP_SCHEMA_PATH = os.path.join(os.path.dirname(__file__), "pages.medea")


def flagship_schema_text() -> str:
    with open(FLAGSHIP_SCHEMA_PATH) as f:
        return f.read()
