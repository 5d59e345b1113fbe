"""Word n-gram shingling for content dedup.

Grams are distinct per document (set semantics — Jaccard is over sets).
A document with fewer than ``n`` words gets a single sentinel gram (its
whole text), so every doc has >= 1 gram and short docs dedupe by exact
content.  The DuckDB oracle mirrors this with the same expressions
(``string_split`` + positional concat + DISTINCT); documents in the
fixtures have single-space word separators, so ``str.split()`` and
``string_split(text, ' ')`` agree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import fnv1a64

DEFAULT_NGRAM = 3


def doc_grams(text: str, n: int = DEFAULT_NGRAM) -> list[str]:
    """Sorted distinct word n-grams of one document."""
    w = text.split()
    if len(w) < n:
        return [text]
    return sorted({" ".join(w[i : i + n]) for i in range(len(w) - n + 1)})


def gram_hash_arrays(texts: list[str], n: int = DEFAULT_NGRAM
                     ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated gram hashes + per-doc offsets + per-doc counts.

    Feed straight into ``hashing.minhash_signatures`` / ``simhash64``
    (both reduceat over ``offsets``).
    """
    all_grams: list[str] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        gs = doc_grams(t, n)
        counts[i] = len(gs)
        all_grams.extend(gs)
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
    return fnv1a64(all_grams), offsets, counts


def gram_hash_flat(
    texts: pa.Array | pa.ChunkedArray, n: int = DEFAULT_NGRAM
) -> tuple[np.ndarray, np.ndarray]:
    """(hashes: uint64, doc_of: int64) — FNV hash of each DISTINCT gram
    per doc, fully vectorized (no per-doc Python).

    Split/join/hash all run as Arrow C++ kernels or numpy index math:
    ``utf8_trim_whitespace`` + ``utf8_split_whitespace`` reproduce
    ``str.split()`` (verified incl. unicode spaces); grams are joined
    with ``binary_join_element_wise`` over n shifted takes of the flat
    word array; hashes come from ``fnv1a64_arrow`` on the result.
    Distinctness is by 64-bit hash, not by string — identical to
    set-of-grams semantics up to FNV collisions (P ~ g^2/2^65 per doc).
    Docs with < n words (incl. empty) hash their raw text, matching
    ``doc_grams``.
    """
    import pyarrow.compute as pc

    from .hashing import fnv1a64_arrow

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    ndocs = len(texts)
    trimmed = pc.utf8_trim_whitespace(texts)
    words = pc.utf8_split_whitespace(trimmed)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    wo = np.asarray(words.offsets)[: ndocs + 1].astype(np.int64)
    flat = words.values
    counts = wo[1:] - wo[:-1]
    # whitespace-only docs split to [''] — force them short like str.split()
    tlen = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
    counts = np.where(tlen == 0, 0, counts)
    long_mask = counts >= n
    kg = np.where(long_mask, counts - (n - 1), 0)
    total = int(kg.sum())
    doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), kg)
    row_start = np.concatenate([[0], np.cumsum(kg)[:-1]]) if ndocs else np.zeros(0, np.int64)
    within = np.arange(total, dtype=np.int64) - np.repeat(row_start, kg)
    starts = wo[:-1][doc_of] + within
    if total:
        parts = [flat.take(pa.array(starts + j)) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")  # last arg = separator
        h = fnv1a64_arrow(grams)
    else:
        h = np.zeros(0, dtype=np.uint64)
    short_idx = np.flatnonzero(~long_mask)
    if len(short_idx):
        h = np.concatenate([h, fnv1a64_arrow(texts.take(pa.array(short_idx)))])
        doc_of = np.concatenate([doc_of, short_idx])
    order = np.lexsort((h, doc_of))
    d_s, h_s = doc_of[order], h[order]
    keep = (
        np.concatenate([[True], (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])])
        if len(d_s)
        else np.zeros(0, dtype=bool)
    )
    return h_s[keep], d_s[keep]


def gram_hash_arrays_vec(
    texts: pa.Array | pa.ChunkedArray, n: int = DEFAULT_NGRAM
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized drop-in for ``gram_hash_arrays`` (hashes, offsets,
    counts) straight from an Arrow string column.  Hash multiset per doc
    is identical (order within a doc differs; both minhash and simhash
    reduce order-invariantly)."""
    ndocs = len(texts)
    h, doc_of = gram_hash_flat(texts, n)
    counts = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]).astype(np.int64)
    return h, offsets, counts
