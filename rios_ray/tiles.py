"""Tile materialization + pyramid/overview stages (raster<->vector bridge).

- ``points_to_tiles``: the raster<->vector bridge of the BASELINE north
  star — geocoded point rows are binned onto a working grid and
  materialized as RIOS-style dense blocks (counts or aggregates per
  pixel), via per-batch partial rasterization + a groupby(tile) merge.
- ``pyramid_tiles``: overview decimation with the reference's exact
  semantics (``/root/reference/rios/calcstats.py:845-872``): per block,
  take every lvl-th pixel starting at offset ``lvl//2``, placed at
  ``(top//lvl, left//lvl)`` in the overview grid; level list
  ``[4, 8, ..., 512]`` pruned by min overview dimension 128
  (``calcstats.py:35-42``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gridmodel import PixelGrid

DEFAULT_OVERVIEW_LEVELS = [4, 8, 16, 32, 64, 128, 256, 512]
DEFAULT_MIN_OVERVIEW_DIM = 128


def overview_levels(nrows: int, ncols: int,
                    levels=None, min_dim: int = DEFAULT_MIN_OVERVIEW_DIM) -> list[int]:
    """Levels to build: those where the decimated min dimension stays
    >= min_dim (reference ``imagewriter`` overview selection rule)."""
    levels = levels or DEFAULT_OVERVIEW_LEVELS
    mindim = min(nrows, ncols)
    return [lvl for lvl in levels if (mindim // lvl) >= min_dim]


def decimate_tile_batch(batch: pa.Table, lvl: int, dtype) -> pa.Table:
    """Tile rows -> overview tile rows at 1/lvl resolution (NEAREST).

    Exact reference semantics: within each block, rows/cols
    ``lvl//2 :: lvl``; destination offset ``(top//lvl, left//lvl)``.
    Blocks decimate independently, so this is a stateless map — no
    shuffle (each source block owns a disjoint overview region when
    lvl <= block size, as in the reference's single-writer layout).
    """
    dtype = np.dtype(dtype)
    o = lvl // 2
    col = batch["data"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    flat = col.values.to_numpy(zero_copy_only=False).astype(dtype, copy=False)
    tops = batch["top"].to_numpy(zero_copy_only=False)
    lefts = batch["left"].to_numpy(zero_copy_only=False)
    nrs = batch["nrows"].to_numpy(zero_copy_only=False)
    ncs = batch["ncols"].to_numpy(zero_copy_only=False)
    rows = []
    for i in range(batch.num_rows):
        nr, nc = int(nrs[i]), int(ncs[i])
        arr = flat[offsets[i] : offsets[i + 1]].reshape(nr, nc)
        sub = arr[o::lvl, o::lvl]
        if sub.size == 0:
            continue
        rows.append(
            {
                "level": lvl,
                "top": int(tops[i]) // lvl,
                "left": int(lefts[i]) // lvl,
                "nrows": sub.shape[0],
                "ncols": sub.shape[1],
                "band": int(batch["band"][i].as_py()),
                "data": sub.ravel(),
            }
        )
    pa_dtype = pa.from_numpy_dtype(dtype)
    schema = pa.schema(
        [
            ("level", pa.int32()),
            ("top", pa.int32()),
            ("left", pa.int32()),
            ("nrows", pa.int32()),
            ("ncols", pa.int32()),
            ("band", pa.int32()),
            ("data", pa.list_(pa_dtype)),
        ]
    )
    return pa.Table.from_pylist(rows, schema=schema)


def pyramid_tiles(ds, dtype, nrows: int, ncols: int, levels=None,
                  min_dim: int = DEFAULT_MIN_OVERVIEW_DIM):
    """All overview levels for a tile-keyed Dataset, as one Dataset
    (stateless flat decimation per level — streaming, no shuffle)."""
    lvls = overview_levels(nrows, ncols, levels, min_dim)
    out = None
    for lvl in lvls:
        d = ds.map_batches(
            lambda b, lvl=lvl: decimate_tile_batch(b, lvl, dtype),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = d if out is None else out.union(d)
    return out, lvls


# ---------------------------------------------------------------------------
# points -> dense raster tiles (the raster<->vector bridge)
# ---------------------------------------------------------------------------


def make_point_rasterize_fn(grid: PixelGrid, block_ysize: int, block_xsize: int,
                            value_col: str | None = None):
    """Per-batch partial rasterization: point rows -> per-tile dense count
    (or sum-of-value) patches.  Patches from different batches overlap,
    so a groupby(tile).sum merge follows — but each partial is already a
    dense array, so the shuffle moves one patch per (batch, tile)."""
    nrows, ncols = grid.dimensions()

    def rasterize(batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        row, col = grid.world_to_pixel(lon, lat)
        r = np.floor(row).astype(np.int64)
        c = np.floor(col).astype(np.int64)
        ok = (r >= 0) & (r < nrows) & (c >= 0) & (c < ncols)
        r, c = r[ok], c[ok]
        w = (
            batch[value_col].to_numpy(zero_copy_only=False)[ok]
            if value_col
            else np.ones(len(r), dtype=np.float64)
        )
        ty, tx = r // block_ysize, c // block_xsize
        key = ty * (1 << 20) + tx
        rows = []
        for k in np.unique(key):
            m = key == k
            t_y, t_x = int(k) >> 20, int(k) & ((1 << 20) - 1)
            top, left = t_y * block_ysize, t_x * block_xsize
            ys = min(block_ysize, nrows - top)
            xs = min(block_xsize, ncols - left)
            patch = np.zeros((ys, xs), dtype=np.float64)
            np.add.at(patch, (r[m] - top, c[m] - left), w[m])
            rows.append(
                {
                    "tile_y": t_y,
                    "tile_x": t_x,
                    "top": top,
                    "left": left,
                    "nrows": ys,
                    "ncols": xs,
                    "band": 0,
                    "data": patch.ravel(),
                }
            )
        schema = pa.schema(
            [
                ("tile_y", pa.int32()),
                ("tile_x", pa.int32()),
                ("top", pa.int32()),
                ("left", pa.int32()),
                ("nrows", pa.int32()),
                ("ncols", pa.int32()),
                ("band", pa.int32()),
                ("data", pa.list_(pa.float64())),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    return rasterize


def merge_tile_patches(group: pa.Table) -> pa.Table:
    """groupby(tile_y, tile_x).map_groups body: elementwise-sum patches."""
    col = group["data"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy()
    flat = col.values.to_numpy(zero_copy_only=False)
    total = None
    for i in range(group.num_rows):
        a = flat[offsets[i] : offsets[i + 1]]
        total = a.copy() if total is None else total + a
    out = group.slice(0, 1).drop_columns(["data"])
    return out.append_column("data", pa.array([total], type=pa.list_(pa.float64())))


def points_to_raster(ds, grid: PixelGrid, block_ysize: int = 256, block_xsize: int = 256,
                     value_col: str | None = None):
    """Point Dataset -> tile-keyed density/sum raster Dataset."""
    partial = ds.map_batches(
        make_point_rasterize_fn(grid, block_ysize, block_xsize, value_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partial.groupby(["tile_y", "tile_x"]).map_groups(
        merge_tile_patches, batch_format="pyarrow"
    )
