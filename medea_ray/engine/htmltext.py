"""HTML → text extraction for Common-Crawl-style pages.

The north star's per-row invariant is "byte-identical extracted text per
url" (BASELINE.json input_hint): whatever algorithm produces ``text`` from
``html`` must be a pure, documented function so two runs — or two cluster
shapes — agree byte-for-byte.  This module IS that function:

1. decode bytes (charset sniff from a ``charset=`` declaration in the
   first 2048 bytes: utf-8 / ascii honoured; the latin-1 label family
   decodes as cp1252 per WHATWG — 0x80–0x9F are smart quotes/dashes on
   the legacy web, not C1 controls — with U+FFFD for cp1252's five
   unmapped bytes; anything else or no declaration → utf-8 with U+FFFD
   replacement — deterministic, never raises),
2. stream through :class:`html.parser.HTMLParser` (``convert_charrefs``
   so ``&amp;`` / ``&#x41;`` decode in data),
3. DROP everything inside ``script`` / ``style`` / ``template`` /
   ``noscript``; capture ``<title>`` separately (it is chrome, not body
   text); comments / declarations / processing instructions contribute
   nothing; attribute values contribute nothing,
4. block-level boundaries (``p div li ul ol h1..h6 table tr td th
   section article header footer blockquote pre br hr form nav aside
   main figure dl dt dd``) become newlines,
5. normalize: runs of blank characters collapse to one space WITHIN a
   line, each line is stripped, empty lines drop, lines join with
   ``\\n``.

Malformed markup never raises — html.parser is tolerant by design and the
feed is additionally guarded, so a garbage byte payload yields its best-
effort text, exactly once, on every kernel.

The batch stage (:func:`add_extracted_text`) is an actor-pool
``map_batches`` over ``pyarrow`` batches: the tag/charset tables are
per-actor state; the per-row parse loop is inherent to HTML (no Arrow
kernel tokenizes markup), matching the engine's json.loads precedent.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pyarrow as pa

__all__ = ["extract_text", "HtmlExtractor", "add_extracted_text"]

_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})
_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 table tr td th section article "
    "header footer blockquote pre br hr form nav aside main figure "
    "dl dt dd".split()
)
_CHARSET_RE = re.compile(rb"charset\s*=\s*['\"]?\s*([A-Za-z0-9_.:-]+)")
_UTF8_NAMES = frozenset({"utf-8", "utf8", "ascii", "us-ascii"})
_LATIN1_NAMES = frozenset({"latin-1", "latin1", "iso-8859-1", "iso8859-1", "windows-1252", "cp1252"})
_WS_RUN_RE = re.compile(r"[ \t\r\f\v]+")


def _decode(html: bytes | str) -> str:
    if isinstance(html, str):
        return html
    m = _CHARSET_RE.search(html[:2048])
    if m:
        name = m.group(1).decode("ascii", "ignore").lower()
        if name in _LATIN1_NAMES:
            # WHATWG maps every latin-1 label to windows-1252: legacy-web
            # bytes 0x80-0x9F are smart quotes / em-dash / euro there, C1
            # controls in real latin-1.  errors="replace" keeps the decode
            # total and deterministic (cp1252 leaves only 5 bytes unmapped).
            return html.decode("cp1252", "replace")
        # utf-8 family (and unknown charsets) fall through to the default
    return html.decode("utf-8", "replace")


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.skip_depth = 0
        self.in_title = 0
        self.n_links = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self.skip_depth += 1
        elif tag == "title":
            self.in_title += 1
        elif tag == "a" and not self.skip_depth and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            # tolerate stray closers on garbage markup
            self.skip_depth = max(0, self.skip_depth - 1)
        elif tag == "title":
            self.in_title = max(0, self.in_title - 1)
        if tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_startendtag(self, tag, attrs):
        # <br/> etc: same boundary semantics as a start tag, no nesting
        if tag == "a" and not self.skip_depth and any(k == "href" for k, _ in attrs):
            self.n_links += 1
        if tag in _BLOCK_TAGS:
            self.chunks.append("\n")

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.in_title:
            self.title_chunks.append(data)
        else:
            self.chunks.append(data)


def _normalize(raw: str) -> str:
    lines = []
    for line in _WS_RUN_RE.sub(" ", raw).split("\n"):
        line = line.strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_text(html: bytes | str | None) -> dict:
    """Extract ``{text, title, n_links}`` from one HTML payload.

    Pure function of the payload bytes (see module docstring for the
    exact algorithm); ``None`` → all-null fields.  Never raises on
    untrusted markup.
    """
    if html is None:
        return {"text": None, "title": None, "n_links": None}
    p = _Extractor()
    try:
        p.feed(_decode(html))
        p.close()
    except Exception:  # html.parser is documented tolerant; belt-and-braces
        pass
    title = _WS_RUN_RE.sub(" ", "".join(p.title_chunks)).strip()
    return {
        "text": _normalize("".join(p.chunks)),
        "title": title if title else None,
        "n_links": p.n_links,
    }


class HtmlExtractor:
    """Actor-pool stage: append ``<prefix>text/title/n_links`` columns
    extracted from ``html_col``.  Per-actor state is just the compiled
    module tables; each row parses with a fresh HTMLParser (the parser is
    stateful per document)."""

    def __init__(self, html_col: str = "html", prefix: str = "ext_"):
        self.html_col = html_col
        self.prefix = prefix

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts, titles, links = [], [], []
        for v in batch.column(self.html_col):
            r = extract_text(v.as_py())
            texts.append(r["text"])
            titles.append(r["title"])
            links.append(r["n_links"])
        return (
            batch.append_column(self.prefix + "text", pa.array(texts, pa.large_string()))
            .append_column(self.prefix + "title", pa.array(titles, pa.string()))
            .append_column(self.prefix + "n_links", pa.array(links, pa.int32()))
        )


def add_extracted_text(
    ds,
    html_col: str = "html",
    prefix: str = "ext_",
    batch_size: int = 256,
    concurrency=None,
):
    """read → extract (actor pool; html payloads are large, so batches are
    modest) → original columns + extracted text/title/link-count."""
    if concurrency is None:
        # FIXED pool: Ray 2.49's pool autoscaler plateaus ~1 actor above
        # the minimum (see pipeline.default_pool's measured note)
        from medea_ray.engine.pipeline import default_pool

        concurrency = default_pool()
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs=dict(html_col=html_col, prefix=prefix),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=0.75,
    )
