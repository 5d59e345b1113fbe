"""Nearest-neighbour grid resampling (reference on-the-fly reprojection,
``/root/reference/rios/imagereader.py:280-333`` + ``testresample`` /
``testreproj`` semantics, for axis-aligned grids).

Ray-Data-first shape: each INPUT tile row independently computes the
output pixels it serves (containing-cell nearest lookup — GDAL
near-resample semantics for axis-aligned grids), emits full-size
patches keyed by output tile, and a ``groupby(tile)`` sum-merge
assembles dense blocks.  Each output pixel has exactly one source
tile, so patches are disjoint and the merge is exact; output pixels
outside the input extent keep the fill value 0 (the reference's
fallback fill when no nodata is set, ``imagereader.py:102-121``).

The candidate output-index range per tile is computed with loose
float bounds and then masked by the EXACT per-pixel source-index
formula, so float rounding at tile edges cannot duplicate or drop a
pixel (the bit-exactness concern of SURVEY §7.4.1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gridmodel import PixelGrid

TILE_SCHEMA = pa.schema(
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


def _out_index_range(lo_val: float, hi_val: float, origin: float, res: float,
                     n_out: int, descending: bool) -> np.ndarray:
    """Loose candidate out-pixel indices whose centers fall in a world
    interval; callers re-filter with the exact formula."""
    if descending:  # y: center(r) = origin - (r+0.5)*res
        r0 = (origin - hi_val) / res - 1.5
        r1 = (origin - lo_val) / res + 1.5
    else:  # x: center(c) = origin + (c+0.5)*res
        r0 = (lo_val - origin) / res - 1.5
        r1 = (hi_val - origin) / res + 1.5
    lo = max(0, int(np.floor(r0)))
    hi = min(n_out, int(np.ceil(r1)) + 1)
    return np.arange(lo, hi, dtype=np.int64)


def make_resample_fn(in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256,
                     x_fwd=None, y_fwd=None, x_inv=None, y_inv=None):
    """Per-batch kernel: input tile rows -> output-tile-keyed patches.

    ``x_fwd``/``y_fwd`` map OUTPUT-grid world coords into the input
    grid's CRS (``x_inv``/``y_inv`` the reverse); monotonic-increasing
    and axis-separable (see reproject.py).  Identity (None) keeps the
    same-CRS path bit-exact — no transform is applied at all.
    """
    out_nrows, out_ncols = out_grid.dimensions()
    if (x_fwd is None) != (x_inv is None) or (y_fwd is None) != (y_inv is None):
        # derive the missing direction only for the identity case;
        # callers with real transforms must pass both
        if x_fwd is not None or y_fwd is not None:
            from .reproject import get_transform

            xi, yi = get_transform(in_grid.projection, out_grid.projection)
            x_inv = x_inv if x_inv is not None else xi
            y_inv = y_inv if y_inv is not None else yi

    def fn(b: pa.Table) -> pa.Table:
        col = b["data"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy()
        flat = col.values.to_numpy(zero_copy_only=False)
        tops = b["top"].to_numpy()
        lefts = b["left"].to_numpy()
        nrs = b["nrows"].to_numpy()
        ncs = b["ncols"].to_numpy()
        bands = b["band"].to_numpy()
        out_rows: list[dict] = []
        for i in range(b.num_rows):
            top, left = int(tops[i]), int(lefts[i])
            nr, nc = int(nrs[i]), int(ncs[i])
            tile = flat[offsets[i]: offsets[i + 1]].reshape(nr, nc)

            # world bounds of the source tile (input CRS)
            y_hi = in_grid.y_max - top * in_grid.y_res
            y_lo = in_grid.y_max - (top + nr) * in_grid.y_res
            x_lo = in_grid.x_min + left * in_grid.x_res
            x_hi = in_grid.x_min + (left + nc) * in_grid.x_res

            # ...mapped to output-CRS bounds (monotonic => bounds map
            # to bounds; identity when same CRS)
            if y_inv is not None:
                y_lo_o, y_hi_o = float(y_inv(y_lo)), float(y_inv(y_hi))
            else:
                y_lo_o, y_hi_o = y_lo, y_hi
            if x_inv is not None:
                x_lo_o, x_hi_o = float(x_inv(x_lo)), float(x_inv(x_hi))
            else:
                x_lo_o, x_hi_o = x_lo, x_hi

            rr = _out_index_range(y_lo_o, y_hi_o, out_grid.y_max, out_grid.y_res,
                                  out_nrows, descending=True)
            cc = _out_index_range(x_lo_o, x_hi_o, out_grid.x_min, out_grid.x_res,
                                  out_ncols, descending=False)
            if not len(rr) or not len(cc):
                continue
            # exact containing-cell source indices for candidate centers
            y_out = out_grid.y_max - (rr + 0.5) * out_grid.y_res
            x_out = out_grid.x_min + (cc + 0.5) * out_grid.x_res
            if y_fwd is not None:
                y_out = np.asarray(y_fwd(y_out), dtype=np.float64)
            if x_fwd is not None:
                x_out = np.asarray(x_fwd(x_out), dtype=np.float64)
            src_r = np.floor((in_grid.y_max - y_out) / in_grid.y_res).astype(np.int64)
            src_c = np.floor((x_out - in_grid.x_min) / in_grid.x_res).astype(np.int64)
            rm = (src_r >= top) & (src_r < top + nr)
            cm = (src_c >= left) & (src_c < left + nc)
            rr, src_r = rr[rm], src_r[rm] - top
            cc, src_c = cc[cm], src_c[cm] - left
            if not len(rr) or not len(cc):
                continue
            vals = tile[src_r[:, None], src_c[None, :]].astype(np.float64)

            # split the served window into output tiles
            for ty in range(int(rr[0]) // block, int(rr[-1]) // block + 1):
                rsel = (rr // block) == ty
                if not rsel.any():
                    continue
                o_top = ty * block
                o_nr = min(block, out_nrows - o_top)
                for tx in range(int(cc[0]) // block, int(cc[-1]) // block + 1):
                    csel = (cc // block) == tx
                    if not csel.any():
                        continue
                    o_left = tx * block
                    o_nc = min(block, out_ncols - o_left)
                    patch = np.zeros((o_nr, o_nc), dtype=np.float64)
                    pr = rr[rsel] - o_top
                    pc_ = cc[csel] - o_left
                    patch[pr[:, None], pc_[None, :]] = vals[np.ix_(rsel, csel)]
                    out_rows.append(
                        {
                            "tile_y": ty,
                            "tile_x": tx,
                            "top": o_top,
                            "left": o_left,
                            "nrows": o_nr,
                            "ncols": o_nc,
                            "band": int(bands[i]),
                            "data": patch.ravel(),
                        }
                    )
        return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

    return fn


def resample_nearest(ds, in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256):
    """Tile-keyed raster Dataset -> nearest-resampled Dataset on
    ``out_grid`` (disjoint patches; sum-merge assembles blocks)."""
    from .tiles import merge_tile_patches

    partial = ds.map_batches(
        make_resample_fn(in_grid, out_grid, block),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partial.groupby(["tile_y", "tile_x", "band"]).map_groups(
        merge_tile_patches, batch_format="pyarrow"
    )
