"""Misra-Gries heavy hitters — the frequent-items companion to the HLL
sketch (``pipelines/events.py``), made EXACT by a verify pass.

One MG summary of size ``k - 1`` guarantees every item with true
frequency > n/k survives compression (count error <= n/k), and MG
summaries merge associatively (sum counters, re-compress) — the
classic mergeable-summaries result (Agarwal et al., PODS'12; public).
So the distributed shape is:

1. per-batch exact counts (``np.unique``) compressed to k-1 counters —
   a combiner whose output is BOUNDED (k-1 rows/batch) regardless of
   token cardinality;
2. one tiny merge task: sum partial counters by item, re-compress —
   the survivor set is a guaranteed SUPERSET of the true heavy hitters;
3. an exact second scan counts only the <= k-1 candidates (broadcast
   set, vectorized isin) and filters ``count * k > total`` in integer
   math — so the output is exact, the sketch only bounded the
   candidate set.

This is how exact heavy hitters stay feasible at 100 TB: no keyed
exchange ever carries more than k-1 rows per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Reduce to at most ``k - 1`` counters: subtract the k-th largest
    count from all, keep positives (the batched MG decrement)."""
    if len(keys) <= k - 1:
        return keys, counts
    kth = np.partition(counts, len(counts) - k)[len(counts) - k]
    kept = counts - kth > 0
    return keys[kept], counts[kept] - kth


def mg_partial(tokens: pa.Array | pa.ChunkedArray, k: int):
    """Exact batch counts -> MG compression.  Returns (keys, counts)
    numpy arrays (keys as Arrow-taken strings stay in Arrow)."""
    import pyarrow.compute as pc

    vc = tokens.value_counts()
    keys = vc.field(0)
    counts = vc.field(1).to_numpy(zero_copy_only=False).astype(np.int64)
    kept_keys, kept_counts = mg_compress(np.arange(len(counts)), counts, k)
    return pc.take(keys, pa.array(kept_keys)), kept_counts
