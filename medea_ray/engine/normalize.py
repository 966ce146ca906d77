"""CCNet-style text normalization for web corpora.

The normalization pass of Wenzek et al. 2020 (arXiv:1911.00359, the
CCNet pipeline; also the pre-hash canonicalization of most public
dedup recipes): before fingerprinting / fuzzy-dedup, page text is
case-folded, accent-stripped, digit-collapsed and punctuation-unified
so that trivially-different renderings of the same page hash
identically.  Pinned rule order (the DuckDB oracle ``docs_normalized``
replays the exact chain from scratch, byte-for-byte per row):

1. **strip_nonprint** — drop C0 control characters except ``\\t`` /
   ``\\n`` / ``\\r`` plus DEL (``[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]``);
2. **punct** — map common Unicode punctuation to its ASCII
   equivalent via :data:`PUNCT_TABLE` (curly quotes, dashes,
   ellipsis, guillemets, CJK stops, NBSP -> space) — literal
   ``replace`` chain, applied in table order;
3. **lowercase** — full Unicode case folding (utf8proc semantics on
   BOTH sides: Arrow ``utf8_lower`` == DuckDB ``lower``);
4. **strip_accents** — NFD decompose, drop combining marks
   (``\\p{Mn}``), NFC recompose (== DuckDB ``strip_accents`` on the
   common plane; parity pinned by tests incl. dotted-I and Ё);
5. **digits_zero** — ASCII digits to ``0`` (``[0-9]``; RE2's ``\\d``
   is ASCII-only so fullwidth digits deliberately pass through —
   documented divergence from cc_net's Python ``\\d``);
6. **collapse_ws** — runs of RE2 ``\\s`` (``[\\t\\n\\f\\r ]`` — NBSP is
   already a plain space via step 2) to one space, then trim plain
   spaces.

Every step is one vectorized Arrow kernel over the batch
(``replace_substring_regex`` / ``replace_substring`` / ``utf8_lower``
/ ``utf8_normalize``); nulls pass through as null at every step.
:func:`sql_replay` renders the SAME chain (same table object, same
flag set) as a DuckDB SQL expression, so the operator and its oracle
cannot drift.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.arrow_util import as_array as _as_array

# (unicode, ascii) literal replacements, applied in order.  Kept to
# pairs whose ASCII reading is uncontroversial; anything absent passes
# through unchanged (normalization never invents bytes).
PUNCT_TABLE: tuple[tuple[str, str], ...] = (
    (" ", " "),   # NBSP
    ("“", '"'),   # left double curly
    ("”", '"'),   # right double curly
    ("„", '"'),   # low double
    ("‘", "'"),   # left single curly
    ("’", "'"),   # right single curly / apostrophe
    ("‚", "'"),   # low single
    ("…", "..."),  # ellipsis
    ("—", "-"),   # em dash
    ("–", "-"),   # en dash
    ("‐", "-"),   # hyphen
    ("«", '"'),   # left guillemet
    ("»", '"'),   # right guillemet
    ("′", "'"),   # prime
    ("″", '"'),   # double prime
    ("´", "'"),   # acute accent (spacing)
    ("、", ","),   # ideographic comma
    ("。", "."),   # ideographic full stop
    ("，", ","),   # fullwidth comma
)

_NONPRINT_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
_DIGITS_RE = r"[0-9]"
_WS_RE = r"\s+"


def normalize_array(
    arr,
    *,
    strip_nonprint: bool = True,
    punct: bool = True,
    lowercase: bool = True,
    strip_accents: bool = True,
    digits_zero: bool = True,
    collapse_ws: bool = True,
) -> pa.Array:
    """Pure kernel: string array -> normalized string array (nulls stay
    null).  Flags switch individual steps off; order is fixed."""
    x = pc.cast(_as_array(arr), pa.string())
    if strip_nonprint:
        x = pc.replace_substring_regex(x, _NONPRINT_RE, "")
    if punct:
        for src, dst in PUNCT_TABLE:
            x = pc.replace_substring(x, src, dst)
    if lowercase:
        x = pc.utf8_lower(x)
    if strip_accents:
        x = pc.utf8_normalize(x, form="NFD")
        x = pc.replace_substring_regex(x, r"\p{Mn}", "")
        x = pc.utf8_normalize(x, form="NFC")
    if digits_zero:
        x = pc.replace_substring_regex(x, _DIGITS_RE, "0")
    if collapse_ws:
        x = pc.replace_substring_regex(x, _WS_RE, " ")
        x = pc.utf8_trim(x, " ")
    return x


def sql_replay(expr: str, **flags) -> str:
    """Render the normalization chain as a DuckDB SQL expression over
    ``expr``, generated from the SAME table / flag semantics as
    :func:`normalize_array` — the lockstep guarantee the oracle rides
    on.  Accepts the same keyword flags."""
    opt = dict(
        strip_nonprint=True, punct=True, lowercase=True,
        strip_accents=True, digits_zero=True, collapse_ws=True,
    )
    bad = set(flags) - set(opt)
    if bad:
        raise ValueError(f"unknown normalize flags: {sorted(bad)}")
    opt.update(flags)
    x = expr
    if opt["strip_nonprint"]:
        x = f"regexp_replace({x}, '{_NONPRINT_RE}', '', 'g')"
    if opt["punct"]:
        for src, dst in PUNCT_TABLE:
            s = src.replace("'", "''")
            d = dst.replace("'", "''")
            x = f"replace({x}, '{s}', '{d}')"
    if opt["lowercase"]:
        x = f"lower({x})"
    if opt["strip_accents"]:
        x = f"strip_accents({x})"
    if opt["digits_zero"]:
        x = f"regexp_replace({x}, '{_DIGITS_RE}', '0', 'g')"
    if opt["collapse_ws"]:
        x = f"trim(regexp_replace({x}, '\\s+', ' ', 'g'), ' ')"
    return x


def normalize_text(
    ds,
    text_col: str = "text",
    out_col: str = "norm_text",
    batch_size: int = 4096,
    **flags,
):
    """Dataset wrapper: appends ``out_col`` holding the normalized text
    (one stateless ``map_batches`` pass, no shuffle — the canonical
    pre-dedup stage to compose in front of ``dedup_exact`` /
    ``minhash_near_dup``)."""
    if out_col == text_col:
        raise ValueError("out_col must differ from text_col")

    def fn(t: pa.Table) -> pa.Table:
        out = normalize_array(t.column(text_col), **flags)
        return t.append_column(out_col, out)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
