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


def explode_grams(batch: pa.Table, n: int = DEFAULT_NGRAM,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """(doc_id, gram, n_grams) — one row per distinct gram per doc."""
    ids = batch[id_col].to_pylist()
    texts = batch[text_col].to_pylist()
    out_id, out_gram, out_n = [], [], []
    for i, t in zip(ids, texts):
        gs = doc_grams(t, n)
        out_id.extend([i] * len(gs))
        out_gram.extend(gs)
        out_n.extend([len(gs)] * len(gs))
    return pa.table(
        {
            "doc_id": pa.array(out_id, type=pa.int64()),
            "gram": pa.array(out_gram, type=pa.string()),
            "n_grams": pa.array(out_n, type=pa.int64()),
        }
    )


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
