"""Vectorized 64-bit hashing primitives for dedup (numpy-only).

FNV-1a is computed column-wise over a padded byte matrix: the loop is
over gram *byte positions* (bounded, ~tens), each iteration a
vectorized op over every gram in the batch — no per-row Python in the
count path.  uint64 arithmetic wraps mod 2^64 (numpy unsigned
semantics), which is the FNV definition.
"""

from __future__ import annotations

import numpy as np

FNV_OFFSET = np.uint64(14695981039346656037)
FNV_PRIME = np.uint64(1099511628211)

_U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _fnv1a64_matrix(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a 64 over each row of a padded byte matrix (loop is over
    byte positions, every iteration vectorized over all rows)."""
    maxlen = buf.shape[1] if len(lens) and int(lens.max()) else 0
    h = np.full(len(lens), FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(maxlen):
            active = i < lens
            hi = (h ^ buf[:, i].astype(np.uint64)) * FNV_PRIME
            h = np.where(active, hi, h)
    return h


def fnv1a64(strings: list[str] | list[bytes]) -> np.ndarray:
    """FNV-1a 64-bit hash of each string, vectorized over the batch."""
    if not strings:
        return np.zeros(0, dtype=np.uint64)
    enc = [s.encode("utf-8") if isinstance(s, str) else s for s in strings]
    lens = np.fromiter((len(e) for e in enc), dtype=np.int64, count=len(enc))
    maxlen = int(lens.max()) if len(lens) else 0
    buf = np.zeros((len(enc), max(maxlen, 1)), dtype=np.uint8)
    if maxlen:
        flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
        mask = np.arange(maxlen) < lens[:, None]
        buf[mask] = flat
    return _fnv1a64_matrix(buf, lens)


def fnv1a64_arrow(arr) -> np.ndarray:
    """FNV-1a 64 over an Arrow string/binary array, fed straight from
    the offsets/data buffers — no ``to_pylist`` / per-row Python.
    Hash-identical to ``fnv1a64`` on the same (UTF-8) values; nulls
    hash as empty strings."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    if pa.types.is_string(t) or pa.types.is_binary(t):
        off_np = np.int32
    elif pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_np = np.int64
    else:
        return fnv1a64([str(x) for x in arr.to_pylist()])
    offs = np.frombuffer(arr.buffers()[1], dtype=off_np)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    lens = offs[1:] - offs[:-1]
    if arr.null_count:
        lens = np.where(arr.is_null().to_numpy(zero_copy_only=False), 0, lens)
    maxlen = int(lens.max()) if len(lens) else 0
    # Loop over byte POSITIONS, gathering one clamped column per
    # iteration straight from the Arrow data buffer — no (rows x
    # maxlen) temporary at all.  The previous 2-D boolean-mask gather
    # cost 11.9 s on 260k grams (numpy mask fancy-indexing + this VM's
    # first-touch page faults on the big index matrix); this path is
    # ~0.1 s warm and allocates only per-column vectors.
    h = np.full(len(lens), FNV_OFFSET, dtype=np.uint64)
    if maxlen:
        base = offs[:-1]
        hi_cap = max(len(data) - 1, 0)
        with np.errstate(over="ignore"):
            for i in range(maxlen):
                active = i < lens
                pos = np.minimum(base + i, hi_cap)
                hi = (h ^ data[pos].astype(np.uint64)) * FNV_PRIME
                h = np.where(active, hi, h)
    return h


def minhash_params(num_perm: int, seed: int = 1234) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic multiply-shift permutation parameters (a odd)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _U64_MAX, num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.integers(0, _U64_MAX, num_perm, dtype=np.uint64)
    return a, b


def minhash_signatures(
    gram_hashes: np.ndarray,
    offsets: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    perm_chunk: int = 64,
) -> np.ndarray:
    """(n_docs, num_perm) MinHash signature matrix.

    ``gram_hashes`` is every doc's gram hashes concatenated;
    ``offsets[i]`` is doc i's start index (every doc must have >= 1
    gram — shingling emits a whole-text sentinel gram for short docs).
    Permutation hash h_i(x) = a_i*x + b_i mod 2^64; per-doc min via
    ``np.minimum.reduceat`` (one vectorized pass, no Python loop).

    Computed in permutation chunks into one reused buffer: the full
    (n_grams, num_perm) temp would be ~0.5 GB at a 4096-doc batch, and
    first-touch page faults on fresh large allocations dominate the
    kernel cost — chunking keeps the working set small and lets the
    allocator reuse pages across chunks and batches.
    """
    num_perm = len(a)
    n_grams = len(gram_hashes)
    sig = np.empty((len(offsets), num_perm), dtype=np.uint64)
    buf = np.empty((n_grams, min(perm_chunk, num_perm)), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c0 in range(0, num_perm, perm_chunk):
            c1 = min(c0 + perm_chunk, num_perm)
            view = buf[:, : c1 - c0]
            np.multiply(gram_hashes[:, None], a[None, c0:c1], out=view)
            np.add(view, b[None, c0:c1], out=view)
            sig[:, c0:c1] = np.minimum.reduceat(view, offsets, axis=0)
    return sig


def band_keys(signatures: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, n_bands) uint64 LSH band keys (FNV over each band's rows).

    ``signatures.shape[1]`` must be divisible by ``n_bands``.
    """
    n_docs, num_perm = signatures.shape
    r = num_perm // n_bands
    assert r * n_bands == num_perm
    by = signatures.reshape(n_docs, n_bands, r)
    bytes_ = by.astype("<u8").view(np.uint8).reshape(n_docs, n_bands, r * 8)
    h = np.full((n_docs, n_bands), FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(r * 8):
            h = (h ^ bytes_[:, :, i].astype(np.uint64)) * FNV_PRIME
    return h


def simhash64(gram_hashes: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_docs,) 64-bit SimHash: sign of per-bit vote sums over grams."""
    bits = np.unpackbits(
        gram_hashes.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
    ).astype(np.int32)  # (n_grams, 64)
    votes = np.add.reduceat(2 * bits - 1, offsets, axis=0)  # (n_docs, 64)
    out_bits = (votes > 0).astype(np.uint8)
    return np.packbits(out_bits, axis=1, bitorder="little").view("<u8").ravel()


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Element-wise Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(a, b)
    return np.unpackbits(x.astype("<u8").view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def simhash_bands(simhashes: np.ndarray, n_bands: int = 4) -> np.ndarray:
    """(n_docs, n_bands) uint16-range band keys: split 64 bits into
    ``n_bands`` contiguous chunks (pigeonhole: two hashes within
    Hamming distance ``n_bands - 1`` share at least one chunk)."""
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    cols = [
        (simhashes >> np.uint64(i * width)) & mask for i in range(n_bands)
    ]
    return np.stack(cols, axis=1)
