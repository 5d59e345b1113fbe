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


def top_token_pages(sf_dir: str, k: int = 100):
    """Top-k documents by token count (sort/limit surface).

    Scalable top-k: per-batch local top-k (one argpartition) before the
    single tiny final merge — the global ``ds.sort`` is avoided the same
    way the kNN merge avoids it (pre-aggregate-before-shuffle for
    order statistics).  Ties broken on doc_id ascending.
    """
    import numpy as np
    import pyarrow as pa

    def local_topk(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy()
        ids = b["doc_id"].to_numpy()
        # the batch-local selection must use the SAME total order as the
        # final merge (value desc, id asc) — a value-only argpartition
        # can discard the tie-winner at the k-th boundary
        top = np.lexsort((ids, -n))[: min(k, len(n))]
        return pa.table({"doc_id": pa.array(ids[top]), "n_tokens": pa.array(n[top])})

    def final(b: pa.Table) -> pa.Table:
        n = b["n_tokens"].to_numpy()
        ids = b["doc_id"].to_numpy()
        order = np.lexsort((ids, -n))[:k]
        return pa.table(
            {
                "doc_id": pa.array(ids[order]),
                "n_tokens": pa.array(n[order]),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            }
        )

    ds = token_stats(sf_dir).select_columns(["doc_id", "n_tokens"])
    local = ds.map_batches(
        local_topk, batch_format="pyarrow", zero_copy_batch=True, batch_size=65536
    )
    return local.repartition(1).map_batches(
        final, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
