"""URL parsing / canonicalization / host extraction for web corpora.

The first normalization every Common-Crawl-style pipeline applies before
url-keyed dedup or per-host stats: two urls that differ only in scheme
case, host case, a trailing host dot, an explicit default port, query
parameter order, empty query segments, or a fragment are the SAME page.

Canonical form (pinned for the DuckDB oracle `url_host_stats`):

- scheme and host lowercased; trailing host dot stripped; userinfo
  dropped;
- explicit default port stripped (``http:80`` / ``https:443``); any
  other explicit port kept;
- empty path becomes ``/``; path case/encoding otherwise untouched
  (percent-decoding is deliberately NOT applied — decoding can merge
  distinct resources);
- query: split on ``&``, empty segments dropped, remaining ``k=v``
  segments sorted bytewise (duplicates kept, order-stable), re-joined;
  an empty result drops the ``?``;
- fragment dropped.

``registrable_domain`` is a heuristic eTLD+1 (no public-suffix list in
this container, by design): last two host labels, or last three when
the TLD is 2 chars and the second-level label is a known registry
class (``co/com/ac/org/net/gov/edu`` — the co.uk pattern). Documented
approximation; swap in a PSL-backed resolver where available.

Everything is one stateless ``map_batches`` pass: RE2 ``extract_regex``
for the split, Arrow kernels for case/trim/joins, and one
``np.lexsort`` + ListArray rebuild for the per-row query-param sort.
Rows that do not parse (no scheme, null input) get ``url_ok = false``
and null outputs — never a stage crash.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

URL_RE = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://(?:(?P<user>[^/@?#]*)@)?"
    r"(?P<host>[^/:?#]*)(?::(?P<port>[0-9]+))?(?P<path>[^?#]*)"
    r"(?:\?(?P<query>[^#]*))?(?:#(?P<frag>.*))?$"
)

DEFAULT_PORTS = {"http": "80", "https": "443"}
# second-level labels that act as registries under 2-char TLDs (co.uk…)
SECOND_LEVEL_REGISTRIES = frozenset({"co", "com", "ac", "org", "net", "gov", "edu"})


from medea_ray.engine.arrow_util import as_array as _as_array


def _sorted_query(query: pa.Array):
    """Per-row bytewise sort of non-empty ``&``-segments → (joined
    string array, n_params int64 array). Vectorized: one flatten, one
    lexsort, one ListArray rebuild."""
    nrows = len(query)
    la = _as_array(pc.split_pattern(pc.fill_null(query, ""), "&"))
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = _as_array(la.flatten())
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not keep.any():  # common web case: no query string anywhere
        z = np.zeros(nrows, np.int64)
        return pa.array([""] * nrows, pa.string()), z
    rows = np.repeat(np.arange(nrows, dtype=np.int64), cnts)[keep]
    kept = flat.filter(pa.array(keep))
    # bytewise param order within each row: one Arrow sort on
    # (row, param) — sort_indices is stable and vectorized, no object
    # materialization
    order = pc.sort_indices(
        pa.table({"r": pa.array(rows), "p": kept}),
        sort_keys=[("r", "ascending"), ("p", "ascending")],
    ).to_numpy().astype(np.int64)
    rows = rows[order]
    kept = kept.take(pa.array(order))
    n_params = np.bincount(rows, minlength=nrows).astype(np.int64)
    offsets = np.concatenate([np.zeros(1, np.int64), np.cumsum(n_params)])
    sorted_list = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pc.cast(kept, pa.string())
    )
    return pc.binary_join(sorted_list, "&"), n_params


def _registrable(host: pa.Array) -> pa.Array:
    """Heuristic eTLD+1 per host (see module docstring). Vectorized:
    gather the last three labels per host with clamped Arrow ``take``s,
    then select between the 2- and 3-label joins with boolean masks."""
    la = _as_array(pc.split_pattern(pc.fill_null(host, ""), "."))
    if len(la) == 0:
        return pa.array([], pa.string())
    cnts = pc.list_value_length(la).to_numpy().astype(np.int64)
    flat = pc.cast(_as_array(la.flatten()), pa.string())
    ends = np.cumsum(cnts)

    def gather(back: int) -> pa.Array:
        idx = np.clip(ends - back, 0, max(int(ends[-1]) - 1, 0))
        return flat.take(pa.array(idx, pa.int64()))

    last, second, third = gather(1), gather(2), gather(3)
    two = pc.binary_join_element_wise(second, last, ".")
    three = pc.binary_join_element_wise(third, two, ".")
    is_reg = pc.and_(
        pc.equal(pc.utf8_length(last), 2),
        pc.is_in(second, value_set=pa.array(sorted(SECOND_LEVEL_REGISTRIES))),
    )
    use_three = pa.array((cnts >= 3), pa.bool_())
    use_two = pa.array((cnts >= 2), pa.bool_())
    out = pc.if_else(pc.and_(use_three, is_reg), three, pc.if_else(use_two, two, last))
    # hostless rows ('' splits to ['']): last is '' there already
    return out


def parse_urls(urls: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Column of url strings → table (url_ok, scheme, host, port,
    path, n_params, registrable_domain, canonical_url). Non-parsing /
    null rows: url_ok false, null fields."""
    urls = pc.fill_null(_as_array(urls), "")
    st = pc.extract_regex(urls, pattern=URL_RE)
    ok = pc.is_valid(st)
    # null struct rows read as '' through fill_null on each field
    def f(name):
        return pc.fill_null(pc.struct_field(st, name), "")

    scheme = pc.utf8_lower(f("scheme"))
    host = pc.utf8_lower(pc.utf8_rtrim(f("host"), characters="."))
    port = f("port")
    is_default = pc.or_(
        pc.and_(pc.equal(scheme, "http"), pc.equal(port, "80")),
        pc.and_(pc.equal(scheme, "https"), pc.equal(port, "443")),
    )
    keep_port = pc.and_(pc.not_equal(port, ""), pc.invert(is_default))
    portseg = pc.if_else(
        keep_port, pc.binary_join_element_wise(":", port, ""), ""
    )
    path = f("path")
    path = pc.if_else(pc.equal(path, ""), "/", path)
    q, n_params = _sorted_query(f("query"))
    qseg = pc.if_else(
        pc.equal(q, ""), "", pc.binary_join_element_wise("?", q, "")
    )
    canonical = pc.binary_join_element_wise(scheme, "://", host, portseg, path, qseg, "")
    reg = _registrable(host)
    null_str = pa.nulls(len(urls), pa.string())
    null_i64 = pa.nulls(len(urls), pa.int64())

    def masked(arr, nul):
        return pc.if_else(ok, arr, nul)

    return pa.table(
        {
            "url_ok": ok,
            "scheme": masked(scheme, null_str),
            "host": masked(host, null_str),
            "port": masked(pc.if_else(keep_port, port, ""), null_str),
            "path": masked(path, null_str),
            "n_params": masked(pa.array(n_params, pa.int64()), null_i64),
            "registrable_domain": masked(reg, null_str),
            "canonical_url": masked(canonical, null_str),
        }
    )


def add_url_columns(
    ds,
    url_col: str = "url",
    keep: tuple[str, ...] = ("url_ok", "host", "registrable_domain", "canonical_url"),
    batch_size: int = 8192,
):
    """Dataset wrapper: append the selected ``parse_urls`` columns."""

    def fn(t: pa.Table) -> pa.Table:
        parsed = parse_urls(t.column(url_col))
        for name in keep:
            t = t.append_column(name, parsed.column(name))
        return t

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
