"""Multimodal pipelines over the pages table's binary payload column.

The pages ``html`` binary column doubles as the opaque media payload
(per input_hint there is exactly one binary column); typed metadata
(height/width) is derived deterministically from the url hash so the
whole pipeline is reproducible with no side files.  Decode is stubbed
(no codecs in this container — see stages/multimodal.py); resize,
feature extraction and frame sampling are real vectorized kernels.

Actor pools: decode/resize/features are callable classes on
``map_batches(Cls, concurrency=(1, N), batch_size=SMALL)`` — binary
payloads mean small batches, and the codec slot is initialised once
per actor.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..dedup.hashing import fnv1a64
from ..sources.pages import read_pages
from ..stages.multimodal import (
    DEFAULT_MEDIA_BATCH,
    FrameSampleStage,
    ImageDecodeStage,
    ImageFeatureStage,
    ResizeStage,
)

FRAME_BYTES = 32
FRAME_EVERY = 2


def media_table(sf_dir: str) -> ray.data.Dataset:
    """(url, payload, meta_height, meta_width): the typed-binary view."""

    def tag(b: pa.Table) -> pa.Table:
        from ..dedup.hashing import fnv1a64_arrow

        h = fnv1a64_arrow(b["url"])
        heights = (8 + (h % np.uint64(9))).astype(np.int32)
        widths = (8 + ((h >> np.uint64(8)) % np.uint64(9))).astype(np.int32)
        return pa.table(
            {
                "url": b["url"],
                "payload": b["html"],
                "meta_height": pa.array(heights),
                "meta_width": pa.array(widths),
            }
        )

    # payload passthrough is zero-copy; the tag itself is per-url
    # metadata, so a relational-sized batch is fine here
    return read_pages(sf_dir, columns=["url", "html"]).map_batches(
        tag, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    )


def image_features(
    sf_dir: str,
    out_h: int = 8,
    out_w: int = 8,
    concurrency=None,
    batch_size: int | None = None,
) -> ray.data.Dataset:
    """decode (stub codec) -> resize (real) -> per-channel stats (real).

    ``batch_size`` defaults to 1024 here because the synthetic images
    are tiny (<=16x16x3, ~1 KB tensors); with real megapixel payloads
    pass DEFAULT_MEDIA_BATCH so batch x concurrency stays in worker
    heaps."""
    from ..util import default_pool

    if concurrency is None:
        concurrency = default_pool()
    if batch_size is None:
        batch_size = 1024
    ds = media_table(sf_dir)
    ds = ds.map_batches(
        ImageDecodeStage,
        fn_constructor_kwargs={"codec": "auto"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    ds = ds.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return ds.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_samples(sf_dir: str, concurrency=None,
                  batch_size: int = 4096) -> ray.data.Dataset:
    """(url, frame_idx, frame): every FRAME_EVERY-th FRAME_BYTES chunk.

    ``batch_size`` sizes actor calls: fixture payloads are ~hundreds of
    bytes so 4096 rows is ~2.5 MB/batch (512-row batches cost 8x the
    actor-call dispatch for nothing); with real multi-MB video payloads
    pass a smaller value so batch x concurrency stays in worker heaps.
    """
    from ..util import default_pool

    if concurrency is None:
        concurrency = default_pool()
    return media_table(sf_dir).map_batches(
        FrameSampleStage,
        fn_constructor_kwargs={"frame_bytes": FRAME_BYTES, "every": FRAME_EVERY},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def frame_dedup(sf_dir: str) -> ray.data.Dataset:
    """Cross-video exact frame dedup: one row per DISTINCT sampled frame
    with its first owner and copy count — the multimodal composition of
    frame sampling + the exact-dedup exchange (per-batch md5 partials,
    one md5-keyed exchange, vectorized first-occurrence + run-length
    counts; the ROW_NUMBER()=1 + COUNT() OVER pattern without a window
    function).

    md5 is the only per-row step (no vectorized digest kernel exists);
    frames are fixed 32-byte payloads, so the hash pass is bounded and
    runs inside the same streaming stage as the sampler output.
    """
    import hashlib

    import numpy as np
    import pyarrow.compute as pc

    from ..functions.agg import hash_partitioned_groups

    def digest(b: pa.Table) -> pa.Table:
        frames = b["frame"].combine_chunks() if isinstance(b["frame"], pa.ChunkedArray) else b["frame"]
        md = [hashlib.md5(f.as_py()).hexdigest() for f in frames]
        return pa.table({
            "frame_md5": pa.array(md, type=pa.string()),
            "url": b["url"],
            "frame_idx": b["frame_idx"],
        })

    ds = frame_samples(sf_dir).map_batches(
        digest, batch_format="pyarrow", zero_copy_batch=True, batch_size=4096
    )

    def summarize(tbl: pa.Table) -> pa.Table:
        tbl = tbl.sort_by([
            ("frame_md5", "ascending"), ("url", "ascending"),
            ("frame_idx", "ascending"),
        ])
        md = tbl["frame_md5"].combine_chunks()
        codes = md.dictionary_encode().indices.to_numpy(zero_copy_only=False)
        new = np.concatenate([[True], codes[1:] != codes[:-1]]) if len(codes) else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(codes)))
        head = tbl.take(pa.array(starts))
        return pa.table({
            "frame_md5": head["frame_md5"],
            "keep_url": head["url"],
            "keep_idx": head["frame_idx"],
            "n_copies": pa.array(counts, type=pa.int64()),
        })

    return hash_partitioned_groups(ds, ["frame_md5"], summarize)


def ensure_pixels_sidecar(sf_dir: str, out_h: int = 8, out_w: int = 8) -> str:
    """Deterministic (url, px: list<int64>) parquet of decoded+resized
    pixels for the sf dir — the independent input the DuckDB oracle
    reads to gate ``image_features``'s mean/std math end-to-end.

    No Ray involved, and deliberately the SCALAR per-image path
    (``fake_decode`` + ``resize_nearest`` one row at a time, scalar
    meta derivation) so the sidecar independently cross-checks the
    batched/vectorized stage kernels, not just the SQL aggregation —
    the ``ensure_simhash_sidecar`` pattern (pipelines/dedup.py).
    Cached under /tmp/graft_synth.  Pixels are uint8, so the oracle's
    avg/var over them is exact integer arithmetic in float64 and the
    mean/std comparison is bitwise.
    """
    import os

    import pyarrow.parquet as pq

    from ..stages.multimodal import fake_decode, resize_nearest
    from ..synth import PAGES_ROOT, ensure_pages

    name = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(PAGES_ROOT, name, f"pixels_{out_h}x{out_w}.parquet")
    if not os.path.exists(out):
        pages_dir = ensure_pages(sf_dir)
        tbl = pq.read_table(pages_dir, columns=["url", "html"])
        urls = tbl["url"].to_pylist()
        payloads = [
            b.as_py() if b is not None else b""
            for b in tbl["html"].combine_chunks()
        ]
        hs = fnv1a64(urls)
        heights = (8 + (hs % np.uint64(9))).astype(np.int64)
        widths = (8 + ((hs >> np.uint64(8)) % np.uint64(9))).astype(np.int64)
        px = np.empty((len(urls), out_h * out_w * 3), dtype=np.int64)
        for i, (p, h, w) in enumerate(zip(payloads, heights, widths)):
            img = fake_decode(p, int(h), int(w))
            px[i] = resize_nearest(img, out_h, out_w).ravel()
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(px.ravel()), out_h * out_w * 3
        ).cast(pa.list_(pa.int64()))
        os.makedirs(os.path.dirname(out), exist_ok=True)
        tmp = f"{out}.tmp.{os.getpid()}"
        pq.write_table(pa.table({"url": tbl["url"], "px": arr}), tmp)
        os.replace(tmp, out)
    return out


def image_ahash(sf_dir: str, out_h: int = 8, out_w: int = 8,
                concurrency=None, batch_size: int | None = None) -> ray.data.Dataset:
    """Perceptual average-hash of every image: (url, ahash) where ahash
    is the 64-char '0'/'1' string with bit i set iff pixel i's integer
    luma (299r + 587g + 114b — all-int, no float thresholds to diverge
    on) strictly exceeds the image mean (L_i * npix > total).  The
    standard near-duplicate IMAGE fingerprint (group by ahash, or
    Hamming-band it exactly like simhash) — here the decode -> resize
    -> hash chain is what's exercised; the hash itself is bit-exact
    against the pixel-sidecar SQL oracle.
    """
    from ..util import default_pool

    if concurrency is None:
        concurrency = default_pool()
    if batch_size is None:
        batch_size = 1024
    npix = out_h * out_w

    class AHashStage:
        """FUSED decode -> resize -> hash in one actor ``__call__``:
        unlike the image_features chain (kept stage-separated as the
        composability showcase), a fingerprint never needs the full
        pixel tensor outside the worker, so fusing avoids shipping
        decoded pixels through the object store between pools — the
        shape that matters when payloads are megapixels, not the
        fixture's thumbnails (measured here: 5.6 s -> ~2 s at sf0.1)."""

        def __init__(self):
            self.decode = ImageDecodeStage(codec="auto")
            self.resize = ResizeStage(out_h=out_h, out_w=out_w)

        def __call__(self, b: pa.Table) -> pa.Table:
            small = self.resize(self.decode(b))
            px = small["pixels"]
            if isinstance(px, pa.ChunkedArray):
                px = px.combine_chunks()
            flat = px.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            n = small.num_rows
            rgb = flat.reshape(n, npix, 3)
            luma = 299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]
            total = luma.sum(axis=1)  # exact: <= 64 * 255 * 1000
            bits = (luma * npix > total[:, None]).astype(np.uint8)
            chars = (bits + 48).astype(np.uint8)  # ASCII '0'/'1'
            offsets = np.arange(0, (n + 1) * npix, npix, dtype=np.int32)
            arr = pa.StringArray.from_buffers(
                n, pa.py_buffer(offsets.tobytes()), pa.py_buffer(chars.tobytes())
            )
            return pa.table({"url": small["url"], "ahash": arr})

    return media_table(sf_dir).map_batches(
        AHashStage, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size, concurrency=concurrency,
    )
