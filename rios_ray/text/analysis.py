"""Vectorized text-analysis batch functions (documents table).

Every regex runs through pyarrow.compute, whose engine is RE2 — the
same engine DuckDB uses — so the DuckDB oracle SQL in
``__ray_entry__.py`` evaluates the *identical* pattern semantics and
the outputs match bit-for-bit (the reference's dual-implementation
golden-check philosophy, ``/root/reference/rios/riostests/
riostestutils.py:3-10``, applied to text ops).

All functions are per-batch (``map_batches(fn, batch_format="pyarrow",
zero_copy_batch=True)``) and stateless: no Python row loops in the
count/score paths; the only per-row loop is the md5 fingerprint, which
is a C-speed digest call per row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --- token counting -------------------------------------------------------

TOKEN_RE = r"\S+"
ALPHA_TOKEN_RE = r"[A-Za-z]+"
PUNCT_RE = r"[^\w\s]"
# BPE-ish pre-tokenizer (GPT-2 style, minus RE2-unsupported lookahead):
# a token is an optionally space-prefixed run of letters, digits, or
# other non-space symbols.
BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"

# --- stopword models (lowercase alternations, \b word boundaries) ---------

STOPWORD_RES: dict[str, str] = {
    "en": r"\b(the|a|an|and|or|of|to|in|is|it|that|for)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|zu|mit|auf)\b",
    "fr": r"\b(le|la|les|et|un|une|est|que|pour|dans)\b",
    "es": r"\b(el|los|las|y|una|es|por|con|para|como)\b",
    "zh": r"\b(de|le|shi|bu|wo|ni|ta|zhe|na|you)\b",
}
LANG_PRIORITY = ["en", "de", "fr", "es", "zh"]


def _count_re(col: pa.ChunkedArray | pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(col, pattern).to_numpy(zero_copy_only=False).astype(np.int64)


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append n_chars_txt / n_tokens / n_alpha / n_punct / n_bpe columns."""
    t = batch[text_col]
    batch = batch.append_column(
        "n_chars_txt", pc.utf8_length(t).cast(pa.int64())
    )
    batch = batch.append_column("n_tokens", pa.array(_count_re(t, TOKEN_RE)))
    batch = batch.append_column("n_alpha", pa.array(_count_re(t, ALPHA_TOKEN_RE)))
    batch = batch.append_column("n_punct", pa.array(_count_re(t, PUNCT_RE)))
    batch = batch.append_column("n_bpe", pa.array(_count_re(t, BPE_RE)))
    return batch


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append a [0,1] quality score from length / stopword / punct ratios.

    The arithmetic (operand order, int->double casts, LEAST/GREATEST
    clamps) exactly mirrors the oracle SQL expression so float64
    results are bit-identical.
    """
    t = batch[text_col]
    lower = pc.utf8_lower(t)
    n_chars = pc.utf8_length(t).to_numpy(zero_copy_only=False).astype(np.int64)
    n_tokens = _count_re(t, TOKEN_RE)
    n_punct = _count_re(t, PUNCT_RE)
    stop_hits = _count_re(lower, STOPWORD_RES["en"])

    tok_term = np.minimum(1.0, n_tokens / 64.0) * 0.5
    stop_term = np.minimum(1.0, (stop_hits / np.maximum(n_tokens, 1)) * 8.0) * 0.3
    punct_term = (1.0 - np.minimum(1.0, (n_punct / np.maximum(n_chars, 1)) * 10.0)) * 0.2
    quality = tok_term + stop_term + punct_term

    batch = batch.append_column("n_tokens", pa.array(n_tokens))
    batch = batch.append_column("stop_hits", pa.array(stop_hits))
    batch = batch.append_column("n_punct", pa.array(n_punct))
    batch = batch.append_column("quality", pa.array(quality))
    return batch


def lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append lang_pred: stopword-hit-count argmax (first-max wins).

    n-gram-heuristic language ID: per-language stopword alternation hit
    counts; prediction = first language (in LANG_PRIORITY order) whose
    count equals the max; all-zero -> 'und'.
    """
    lower = pc.utf8_lower(batch[text_col])
    counts = np.stack([_count_re(lower, STOPWORD_RES[lang]) for lang in LANG_PRIORITY], axis=1)
    best = np.argmax(counts, axis=1)  # first occurrence of the max
    has_any = counts.max(axis=1) > 0
    langs = np.array(LANG_PRIORITY, dtype=object)
    pred = np.where(has_any, langs[best], "und")
    return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


# --- repetition (Gopher-style quality signals) -----------------------------


def _group_fracs(doc: np.ndarray, gram: np.ndarray, n_docs: int):
    """Per-doc (max run / total, dup-occurrence / total) over (doc, gram)
    occurrence pairs — one lexsort + boundary scan, no Python loops.
    Returns (top_frac, dup_frac, totals) with 0.0 where a doc has no
    occurrences."""
    top = np.zeros(n_docs, dtype=np.float64)
    dup = np.zeros(n_docs, dtype=np.float64)
    tot = np.bincount(doc, minlength=n_docs).astype(np.int64)
    if len(doc) == 0:
        return top, dup, tot
    order = np.lexsort((gram, doc))
    d_s, g_s = doc[order], gram[order]
    bounds = np.flatnonzero(np.r_[True, (d_s[1:] != d_s[:-1]) | (g_s[1:] != g_s[:-1])])
    run_len = np.diff(np.r_[bounds, len(d_s)])
    run_doc = d_s[bounds]
    dbounds = np.flatnonzero(np.r_[True, run_doc[1:] != run_doc[:-1]])
    uniq_docs = run_doc[dbounds]
    maxc = np.maximum.reduceat(run_len, dbounds)
    dupc = np.add.reduceat(np.where(run_len >= 2, run_len, 0), dbounds)
    nz = tot[uniq_docs]
    top[uniq_docs] = maxc / nz
    dup[uniq_docs] = dupc / nz
    return top, dup, tot


def repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append Gopher-style repetition signals per document:

    - ``word_rep_frac``: 1 - distinct words / total words;
    - ``top2gram_frac``: occurrences of the most frequent word 2-gram
      over total 2-gram occurrences (0.0 for docs under 2 words);
    - ``dup3gram_frac``: fraction of 3-gram occurrences whose gram
      appears more than once in the doc (0.0 under 3 words).

    Tokenization is a literal single-space split (mirroring SQL
    ``string_split(text, ' ')``); every fraction is an IEEE float64
    division of two exact int64 counts, so the DuckDB oracle is
    bit-identical.  Grams are exact integer codes (dictionary word ids
    combined positionally), not hashes — no collision caveat.
    """
    wl = pc.split_pattern(batch[text_col], " ").combine_chunks()
    offsets = wl.offsets.to_numpy().astype(np.int64)
    lengths = np.diff(offsets)
    n_docs = len(lengths)
    de = pc.dictionary_encode(wl.values)
    if isinstance(de, pa.ChunkedArray):
        de = de.combine_chunks()
    inv = de.indices.to_numpy().astype(np.int64)
    V = np.int64(len(de.dictionary))
    doc = np.repeat(np.arange(n_docs, dtype=np.int64), lengths)

    # word repetition: distinct words per doc via first-occurrence scan
    order = np.lexsort((inv, doc))
    d_s, w_s = doc[order], inv[order]
    first = np.r_[True, (d_s[1:] != d_s[:-1]) | (w_s[1:] != w_s[:-1])]
    distinct = np.bincount(d_s[first], minlength=n_docs).astype(np.int64)
    total = np.maximum(lengths, 1)
    word_rep = 1.0 - distinct / total

    # words remaining in the doc from each position (incl. itself):
    # an n-gram may start wherever rem >= n
    pos = np.arange(len(inv), dtype=np.int64) - np.repeat(offsets[:-1], lengths)
    rem = np.repeat(lengths, lengths) - pos

    i2 = np.flatnonzero(rem >= 2)
    # exact combined code; V^2 always fits (V < 3e9 in any real batch)
    g2 = inv[i2] * V + inv[i2 + 1]
    top2, _, _ = _group_fracs(doc[i2], g2, n_docs)

    # 3-grams: re-encode the 2-gram prefix to keep the combined code
    # inside int64 at any vocab size
    i3 = np.flatnonzero(rem >= 3)
    p_uniq, p_inv = np.unique(inv[i3] * V + inv[i3 + 1], return_inverse=True)
    g3 = p_inv.astype(np.int64) * V + inv[i3 + 2]
    _, dup3, _ = _group_fracs(doc[i3], g3, n_docs)

    batch = batch.append_column("word_rep_frac", pa.array(word_rep))
    batch = batch.append_column("top2gram_frac", pa.array(top2))
    batch = batch.append_column("dup3gram_frac", pa.array(dup3))
    return batch


# --- fingerprinting -------------------------------------------------------


def _normalize(col) -> pa.ChunkedArray:
    """lowercase, collapse whitespace runs to one space, strip ends."""
    x = pc.utf8_lower(col)
    x = pc.replace_substring_regex(x, r"\s+", " ")
    return pc.utf8_trim_whitespace(x)


def md5_fingerprint(batch: pa.Table, text_col: str = "text", out_col: str = "text_md5") -> pa.Table:
    """Append the md5 hex digest of the normalized text.

    Matches DuckDB ``md5(trim(regexp_replace(lower(text),'\\s+',' ','g')))``.
    """
    norm = _normalize(batch[text_col])
    digests = [hashlib.md5(s.as_py().encode("utf-8")).hexdigest() for s in norm.combine_chunks()]
    return batch.append_column(out_col, pa.array(digests, type=pa.string()))


WINNOW_K = 8  # char k-gram width
WINNOW_W = 4  # winnowing window (min-hash per window of k-gram hashes)
_POLY_BASE = np.uint64(1099511628211)  # FNV prime as the rolling base


def winnow_fingerprint_one(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> np.ndarray:
    """Winnowing document fingerprint: sorted unique window-min k-gram hashes.

    Rolling polynomial hash over bytes (numpy uint64, wraps mod 2^64);
    per sliding window of ``w`` consecutive k-gram hashes keep the min
    (the winnowing scheme of Schleimer/Wilkerson/Aiken, SIGMOD'03).
    """
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(b) < k:
        return np.zeros(0, dtype=np.uint64)
    # h[i] = sum b[i+j] * base^(k-1-j), computed via a strided matmul-free scheme
    powers = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    n = len(b) - k + 1
    idx = np.arange(n)[:, None] + np.arange(k)[None, :]
    grams = (b[idx] * powers[None, :]).sum(axis=1, dtype=np.uint64)
    if n <= w:
        return np.unique(grams.min(keepdims=True))
    windows = np.lib.stride_tricks.sliding_window_view(grams, w)
    return np.unique(windows.min(axis=1))


def winnow_fingerprints_flat(
    texts: pa.Array | pa.ChunkedArray, k: int = WINNOW_K, w: int = WINNOW_W
) -> tuple[np.ndarray, np.ndarray]:
    """Winnowing fingerprints of a whole batch, fully vectorized.

    Returns ``(values: uint64, doc_of: int64)`` — the per-document
    sorted distinct window-min k-gram hashes, concatenated in document
    order.  Bit-identical to ``winnow_fingerprint_one`` per doc (the
    polynomial hash is commutative-sum mod 2^64, so flat-buffer
    evaluation order doesn't change it), but runs as ~k+w passes of 1-D
    numpy over the batch's single flat utf-8 buffer instead of a Python
    loop building an (n, k) index matrix per document.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ndocs = len(texts)
    empty = (np.zeros(0, dtype=np.uint64), np.zeros(0, dtype=np.int64))
    if ndocs == 0:
        return empty
    if texts.null_count:
        texts = pc.fill_null(texts, "")
    odt = np.int64 if pa.types.is_large_string(texts.type) else np.int32
    off = np.frombuffer(texts.buffers()[1], dtype=odt)[
        texts.offset : texts.offset + ndocs + 1
    ].astype(np.int64)
    base = off[0]
    starts, ends = off[:-1] - base, off[1:] - base
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)[base : off[-1]]
    lens = ends - starts
    if len(data) < k:
        return empty
    b = data.astype(np.uint64)
    powers = _POLY_BASE ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    m = len(b) - k + 1  # gram hash at every flat byte position (cross-doc
    g = np.zeros(m, dtype=np.uint64)  # positions exist but are never selected)
    for j in range(k):
        g += b[j : j + m] * powers[j]
    n = np.maximum(lens - k + 1, 0)  # grams per doc

    def _segment_index(counts: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        total = int(counts.sum())
        seg_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_start, counts)
        return doc_of, within

    # docs with more grams than the window: sliding window-min over w
    cnt_big = np.where(n > w, n - w + 1, 0)
    if cnt_big.any():
        wm = g[: m - w + 1].copy()
        for j in range(1, w):
            np.minimum(wm, g[j : j + m - w + 1], out=wm)
        doc_big, within_big = _segment_index(cnt_big)
        vals_big = wm[starts[doc_big] + within_big]
    else:
        doc_big = np.zeros(0, dtype=np.int64)
        vals_big = np.zeros(0, dtype=np.uint64)
    # docs with 1..w grams: single fingerprint = min of all their grams
    cnt_small = np.where((n >= 1) & (n <= w), n, 0)
    if cnt_small.any():
        doc_small_rep, within_small = _segment_index(cnt_small)
        gs = g[starts[doc_small_rep] + within_small]
        small_idx = np.flatnonzero(cnt_small)
        seg = np.concatenate([[0], np.cumsum(cnt_small[small_idx])[:-1]])
        vals_small = np.minimum.reduceat(gs, seg)
    else:
        small_idx = np.zeros(0, dtype=np.int64)
        vals_small = np.zeros(0, dtype=np.uint64)
    vals = np.concatenate([vals_big, vals_small])
    doc_of = np.concatenate([doc_big, small_idx])
    order = np.lexsort((vals, doc_of))
    d_s, v_s = doc_of[order], vals[order]
    if len(d_s) == 0:
        return empty
    keep = np.concatenate([[True], (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])])
    return v_s[keep], d_s[keep]


def winnow_fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append fingerprint (list<uint64>) + fp_size columns per document."""
    vals, doc_of = winnow_fingerprints_flat(batch[text_col])
    counts = np.bincount(doc_of, minlength=batch.num_rows).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    fp = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(vals, type=pa.uint64())
    )
    return batch.append_column("fingerprint", fp).append_column(
        "fp_size", pa.array(counts, type=pa.int64())
    )


# --- PII scan / redaction -------------------------------------------------

# RE2-compatible patterns (pyarrow and DuckDB both run RE2, so the
# oracle SQL evaluates byte-identical semantics — no lookarounds).
PII_RES: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}
PII_TOKEN = "[PII]"


def pii_scan(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append per-pattern match counts + a globally redacted text column.

    Redaction applies the patterns in ``PII_RES`` insertion order, each
    as a global leftmost-non-overlapping replace (RE2 semantics, same
    as DuckDB ``regexp_replace(..., 'g')`` nested in the same order).
    """
    t = batch[text_col]
    for name, pat in PII_RES.items():
        batch = batch.append_column(f"n_{name}", pa.array(_count_re(t, pat)))
    red = t
    for pat in PII_RES.values():
        red = pc.replace_substring_regex(red, pat, PII_TOKEN)
    return batch.append_column("redacted", red)


def levenshtein_batch(a_list: list[str], b_list: list[str]) -> np.ndarray:
    """Exact Levenshtein distance for a batch of string pairs,
    vectorized ACROSS pairs.

    The DP runs one loop over positions of the B strings (bounded by
    the longest B); each step updates every pair's whole DP row at
    once.  The within-row insertion dependency
    ``cur[i] = min(base[i], cur[i-1] + 1)`` is the prefix recurrence
    ``cur[i] = i + min_{k<=i}(base[k] - k)`` — one
    ``np.minimum.accumulate`` per step, no per-pair Python inside the
    loop (the flat-buffer winnow-kernel pattern: loop over positions,
    vectorize over rows).

    Distances are over UTF-8 BYTES (the synthetic corpus is ASCII, so
    this equals DuckDB's character-level ``levenshtein`` there —
    asserted in tests).
    """
    n = len(a_list)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    a_enc = [s.encode("utf-8") for s in a_list]
    b_enc = [s.encode("utf-8") for s in b_list]
    la = np.fromiter((len(s) for s in a_enc), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in b_enc), dtype=np.int64, count=n)
    maxa, maxb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(maxa, 1)), dtype=np.uint8)
    B = np.zeros((n, max(maxb, 1)), dtype=np.uint8)
    for i in range(n):  # bounded pair batch; the DP below is the hot part
        A[i, : la[i]] = np.frombuffer(a_enc[i], np.uint8)
        B[i, : lb[i]] = np.frombuffer(b_enc[i], np.uint8)
    idx = np.arange(maxa + 1, dtype=np.int32)
    D = np.tile(idx, (n, 1))  # row j=0: distance from empty prefix of b
    base = np.empty_like(D)
    for j in range(1, maxb + 1):
        active = j <= lb
        if not active.any():
            break
        cost = (A != B[:, j - 1][:, None]).astype(np.int32)  # (n, maxa)
        base[:, 0] = j
        np.minimum(D[:, 1:] + 1, D[:, :-1] + cost, out=base[:, 1:])
        cur = idx + np.minimum.accumulate(base - idx, axis=1)
        D = np.where(active[:, None], cur, D)
    return D[np.arange(n), la].astype(np.int64)
