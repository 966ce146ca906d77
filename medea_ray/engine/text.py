"""Text-analysis stages for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Each is a vectorized-or-tight-loop ``map_batches`` transform appending
columns; regexes and stopword tables are module-level constants compiled
once per worker process (import time), not per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from medea_ray.engine.dedup import hash_bytes

# RE2's \s is exactly [\t\n\f\r ] (no \v, no Unicode spaces), while
# Python's \S would also break on U+00A0 etc. — pin the class so
# token_count_ws stays in lockstep with DuckDB regexp_extract_all('\S+')
_TOKEN_RE = re.compile(r"[^ \t\n\f\r]+")
# BPE-ish word/number/punct splitter (GPT-2-style coarse classes).
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]", re.UNICODE)

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "que"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "en", "que"},
    "hi": {"है", "और", "का", "की", "के", "में", "से", "को", "पर", "यह"},
    "zh": set(),  # handled by the CJK charset ratio below
}
_WORD_RE = re.compile(r"\w+", re.UNICODE)


def detect_lang(text: str) -> str | None:
    """Charset + stopword-overlap heuristic (no external models)."""
    if not text:
        return None
    n_cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
    if n_cjk > 0.2 * min(len(text), 2000):
        return "zh"
    words = set(_WORD_RE.findall(text.lower())[:400])
    best, best_n = None, 0
    for lang, sw in _STOPWORDS.items():
        n = len(words & sw)
        if n > best_n:
            best, best_n = lang, n
    return best


def quality_features(text: str) -> dict:
    """Cheap quality signals: length, punctuation/alpha/space ratios,
    stopword ratio, mean word length, repetition ratio."""
    if not text:
        return {
            "q_len": 0,
            "q_alpha_ratio": 0.0,
            "q_punct_ratio": 0.0,
            "q_stopword_ratio": 0.0,
            "q_mean_word_len": 0.0,
            "q_repetition": 0.0,
        }
    n = len(text)
    n_alpha = sum(c.isalpha() for c in text)
    n_punct = sum(not c.isalnum() and not c.isspace() for c in text)
    words = _WORD_RE.findall(text.lower())
    n_words = len(words) or 1
    n_stop = sum(w in _STOPWORDS["en"] for w in words)
    uniq = len(set(words))
    return {
        "q_len": n,
        "q_alpha_ratio": n_alpha / n,
        "q_punct_ratio": n_punct / n,
        "q_stopword_ratio": n_stop / n_words,
        "q_mean_word_len": sum(map(len, words)) / n_words,
        "q_repetition": 1.0 - uniq / n_words,
    }


def token_count_ws(text: str | None) -> int:
    """Whitespace token count (matches DuckDB regexp_extract_all '\\S+')."""
    return 0 if text is None else len(_TOKEN_RE.findall(text))


def token_count_bpe(text: str | None) -> int:
    return 0 if text is None else len(_BPE_RE.findall(text))


def fingerprint64(text: str | None, window: int = 8) -> int | None:
    """Winnowing-style document fingerprint: xor of the minimum rolling-hash
    per window over word 2-grams — stable under small edits far from the
    minimum positions."""
    if text is None:
        return None
    words = _WORD_RE.findall(text.lower())
    if not words:
        return 0
    if len(words) == 1:
        grams = [hash_bytes(words[0].encode())]
    else:
        grams = [
            hash_bytes((words[i] + " " + words[i + 1]).encode())
            for i in range(len(words) - 1)
        ]
    out = 0
    for i in range(0, len(grams), window):
        out ^= min(grams[i : i + window])
    return out & ((1 << 63) - 1)


def add_text_features(ds, text_col: str = "text", concurrency=(1, 8)):
    """Append lang_pred / token counts / quality columns / fingerprint."""

    class _Features:
        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            langs, n_ws, n_bpe, fps = [], [], [], []
            # seed the quality keys so a zero-row batch still emits every
            # q_* column (blocks with divergent schemas break downstream
            # to_pandas/concat)
            q_cols: dict[str, list] = {k: [] for k in quality_features("")}
            for t in texts:
                langs.append(detect_lang(t) if t else None)
                n_ws.append(token_count_ws(t))
                n_bpe.append(token_count_bpe(t))
                fps.append(fingerprint64(t))
                for k, v in quality_features(t).items():
                    q_cols.setdefault(k, []).append(v)
            batch = batch.append_column("lang_pred", pa.array(langs, pa.string()))
            batch = batch.append_column("n_tokens_ws", pa.array(n_ws, pa.int64()))
            batch = batch.append_column("n_tokens_bpe", pa.array(n_bpe, pa.int64()))
            batch = batch.append_column("fingerprint", pa.array(fps, pa.int64()))
            for k, vals in q_cols.items():
                typ = pa.int64() if k == "q_len" else pa.float64()
                batch = batch.append_column(k, pa.array(vals, typ))
            return batch

    return ds.map_batches(
        _Features, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def add_token_counts(ds, text_col: str = "text", id_col: str | None = None):
    """Just (id, n_tokens_ws) — the SQL-oracle-checkable slice."""

    def fn(batch: pa.Table) -> pa.Table:
        counts = pa.array(
            [token_count_ws(t) for t in batch.column(text_col).to_pylist()], pa.int64()
        )
        cols = {id_col: batch.column(id_col)} if id_col else dict(zip(batch.column_names, batch.columns))
        cols["n_tokens"] = counts
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


_ASCII_WORD_RE = re.compile(r"[a-z0-9_]+")


def add_word_stats(ds, text_col: str = "text", id_col: str | None = None):
    """Word-repetition stats per document: (id, n_words,
    n_distinct_words) over ASCII ``[a-z0-9_]+`` tokens of ``lower(text)``
    — the Gopher-style repetition signal (a low distinct/total ratio
    flags boilerplate). The token class keeps Python ``re`` and DuckDB
    RE2 in exact lockstep for the oracle. Null text → 0/0 (no words)."""

    def fn(batch: pa.Table) -> pa.Table:
        n_w, n_d = [], []
        for t in batch.column(text_col).to_pylist():
            if not t:
                n_w.append(0)
                n_d.append(0)
                continue
            words = _ASCII_WORD_RE.findall(t.lower())
            n_w.append(len(words))
            n_d.append(len(set(words)))
        cols = (
            {id_col: batch.column(id_col)}
            if id_col
            else dict(zip(batch.column_names, batch.columns))
        )
        cols["n_words"] = pa.array(n_w, pa.int64())
        cols["n_distinct_words"] = pa.array(n_d, pa.int64())
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def add_text_length(ds, text_col: str = "text", out_col: str = "text_len"):
    """Vectorized text length (pyarrow.compute, zero-copy append)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, pc.cast(pc.utf8_length(pc.fill_null(batch.column(text_col), "")), pa.int64())
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# -- PII redaction ------------------------------------------------------------

# (name, RE2 pattern, replacement token). RE2 is the shared engine on both
# sides of the oracle: Arrow's replace_substring_regex and DuckDB's
# regexp_replace(..., 'g') produce byte-identical output for these
# patterns (pinned by tests + the docs_pii_redacted driver oracle).
# Order matters — rules apply sequentially (email first so its local part
# is never half-eaten by the digit rules).
DEFAULT_PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{2,5}\b", "<PHONE>"),
)


def redact_pii(
    ds,
    text_col: str = "text",
    rules: tuple[tuple[str, str, str], ...] = DEFAULT_PII_RULES,
    out_col: str | None = None,
    flag_col: str | None = "pii_found",
):
    """Scrub PII-shaped spans (emails, IPv4s, phone-like digit runs) from a
    text column — the redaction pass every large-scale training-data
    pipeline runs before anything else sees the text.

    Fully vectorized: each rule is one Arrow ``replace_substring_regex``
    kernel call per batch (RE2, compiled once per pattern inside Arrow) —
    no Python row loop, no actor state needed. Rules apply sequentially
    in order; ``flag_col`` (optional) marks rows where ANY rule matched
    the ORIGINAL text (flags are pre-redaction by contract, so they are
    independent of rule order). Nulls pass through as nulls.

    ``out_col=None`` redacts in place (replaces ``text_col``)."""
    out = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        red = col
        hit = None
        for _name, pat, repl in rules:
            if flag_col is not None:
                m = pc.match_substring_regex(col, pat)
                hit = m if hit is None else pc.or_kleene(hit, m)
            red = pc.replace_substring_regex(red, pattern=pat, replacement=repl)
        cols = dict(zip(batch.column_names, batch.columns))
        cols[out] = red
        if flag_col is not None:
            cols[flag_col] = hit if hit is not None else pa.nulls(
                batch.num_rows, pa.bool_()
            )
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
