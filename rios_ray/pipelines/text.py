"""Text-analysis pipelines over the documents table.

Each pipeline is one or two stateless vectorized ``map_batches`` stages
(pyarrow RE2 kernels — the same regex engine DuckDB uses, so the oracle
SQL in ``__ray_entry__.py`` is bit-identical).  Streaming end to end:
nothing is materialized except the caller's consumption.
"""

from __future__ import annotations

import ray.data

from ..sources.documents import read_documents
from ..text import analysis as A

BATCH_SIZE = 16384


def _one_stage(sf_dir: str, fn, columns: list[str]) -> ray.data.Dataset:
    ds = read_documents(sf_dir, columns=columns)
    return ds.map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True, batch_size=BATCH_SIZE
    )


def token_stats(sf_dir: str) -> ray.data.Dataset:
    """doc_id + n_chars_txt / n_tokens / n_alpha / n_punct / n_bpe."""
    return _one_stage(sf_dir, A.token_stats, ["doc_id", "text"]).drop_columns(["text"])


def quality(sf_dir: str) -> ray.data.Dataset:
    """doc_id + [0,1] quality score (length / stopword / punct ratios)."""
    return _one_stage(sf_dir, A.quality_score, ["doc_id", "text"]).select_columns(
        ["doc_id", "quality"]
    )


def lang_id(sf_dir: str) -> ray.data.Dataset:
    """doc_id + lang_pred (stopword n-gram heuristic, 'und' fallback)."""
    return _one_stage(sf_dir, A.lang_id, ["doc_id", "text"]).select_columns(
        ["doc_id", "lang_pred"]
    )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id + normalized-text md5 + winnowing fingerprint size."""
    ds = _one_stage(sf_dir, A.md5_fingerprint, ["doc_id", "text"])
    ds = ds.map_batches(
        A.winnow_fingerprints, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=BATCH_SIZE,
    )
    return ds.select_columns(["doc_id", "text_md5", "fp_size"])
