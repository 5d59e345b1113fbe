"""Grid resampling — nearest, bilinear and average (reference
on-the-fly reprojection, ``/root/reference/rios/imagereader.py:280-333``
accepts any GDAL resample method via ``controls.setResampleMethod``,
``applier.py:745-758``; ``testresample`` / ``testreproj`` semantics,
for axis-aligned grids).

Ray-Data-first shape: each INPUT tile row independently computes its
contribution to the output pixels it serves, emits patches keyed by
output tile, and a ``groupby(tile)`` sum-merge assembles dense blocks.
The sum-merge is EXACT for all three methods because each method is
decomposed so per-tile contributions are additive and disjoint:

- **nearest**: each output pixel center has exactly one containing
  source cell, hence exactly one owning tile — patches are disjoint.
- **bilinear**: output = sum of 4 weighted neighbor source pixels;
  each neighbor pixel is owned by exactly one tile, which emits that
  term's partial product — the merge sums the (≤4) partials.
- **average**: output = (sum of covered source pixels) / count, where
  the count is computed from grid geometry ALONE (identically in every
  tile); each tile emits its local-rectangle-sum divided by the global
  count, so partial fractions sum to the exact mean.

Output pixels outside the input extent keep the fill value 0 (the
reference's fallback fill when no nodata is set,
``imagereader.py:102-121``).

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


def _emit_patches(out_rows: list, rr: np.ndarray, cc: np.ndarray,
                  vals: np.ndarray, band: int, block: int,
                  out_nrows: int, out_ncols: int) -> None:
    """Split a served (rr × cc) value window into output-tile-keyed
    dense patch rows (shared by all resample kernels)."""
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
                    "band": band,
                    "data": patch.ravel(),
                }
            )


def _iter_tiles(b: pa.Table):
    """Yield ``(top, left, nrows, ncols, band, tile2d)`` per batch row
    (zero-copy views into the Arrow list buffer)."""
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
    for i in range(b.num_rows):
        nr, nc = int(nrs[i]), int(ncs[i])
        yield (int(tops[i]), int(lefts[i]), nr, nc, int(bands[i]),
               flat[offsets[i]: offsets[i + 1]].reshape(nr, nc))


def _tile_out_bbox(in_grid: PixelGrid, top: int, left: int, nr: int, nc: int,
                   xy_inv, pad: float = 0.0, pts: int = 25):
    """(x_lo, x_hi, y_lo, y_hi) in OUTPUT-CRS coords of a source-tile
    world rectangle (widened by ``pad``), from densified boundary
    points mapped through the joint inverse — the same
    boundary-extrema argument as the reference's densified-edge grid
    planning (``pixelgrid.py:295-312``); the kernels' exact per-pixel
    ownership mask re-filters, so the bbox only needs to cover."""
    y_hi = in_grid.y_max - top * in_grid.y_res + pad
    y_lo = in_grid.y_max - (top + nr) * in_grid.y_res - pad
    x_lo = in_grid.x_min + left * in_grid.x_res - pad
    x_hi = in_grid.x_min + (left + nc) * in_grid.x_res + pad
    t = np.linspace(0.0, 1.0, pts)
    xs = x_lo + t * (x_hi - x_lo)
    ys = y_lo + t * (y_hi - y_lo)
    ex = np.concatenate([xs, xs, np.full(pts, x_lo), np.full(pts, x_hi)])
    ey = np.concatenate([np.full(pts, y_lo), np.full(pts, y_hi), ys, ys])
    X, Y = xy_inv(ex, ey)
    return float(X.min()), float(X.max()), float(Y.min()), float(Y.max())


def _joint_candidates(out_grid: PixelGrid, out_nrows: int, out_ncols: int,
                      bbox, xy_fwd):
    """Candidate output rows/cols for a bbox plus their centers mapped
    to the input CRS as 2-D (nrr x ncc) arrays."""
    x0, x1, y0, y1 = bbox
    rr = _out_index_range(y0, y1, out_grid.y_max, out_grid.y_res,
                          out_nrows, descending=True)
    cc = _out_index_range(x0, x1, out_grid.x_min, out_grid.x_res,
                          out_ncols, descending=False)
    if not len(rr) or not len(cc):
        return rr, cc, None, None
    y_out = out_grid.y_max - (rr + 0.5) * out_grid.y_res
    x_out = out_grid.x_min + (cc + 0.5) * out_grid.x_res
    X, Y = xy_fwd(x_out[None, :], y_out[:, None])
    X, Y = np.broadcast_arrays(X, Y)  # normalize axis-only transforms
    return rr, cc, X, Y


def _resolve_inverse(in_grid: PixelGrid, out_grid: PixelGrid,
                     x_fwd, y_fwd, x_inv, y_inv):
    """Fill in the input→output direction from the registry when the
    caller supplied only the forward (output→input) transforms."""
    if (x_fwd is None) != (x_inv is None) or (y_fwd is None) != (y_inv is None):
        if x_fwd is not None or y_fwd is not None:
            from .reproject import get_transform

            xi, yi = get_transform(in_grid.projection, out_grid.projection)
            x_inv = x_inv if x_inv is not None else xi
            y_inv = y_inv if y_inv is not None else yi
    return x_inv, y_inv


def make_resample_fn(in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256,
                     x_fwd=None, y_fwd=None, x_inv=None, y_inv=None,
                     xy_fwd=None, xy_inv=None):
    """Per-batch kernel: input tile rows -> output-tile-keyed patches.

    ``x_fwd``/``y_fwd`` map OUTPUT-grid world coords into the input
    grid's CRS (``x_inv``/``y_inv`` the reverse); monotonic-increasing
    and axis-separable (see reproject.py).  Identity (None) keeps the
    same-CRS path bit-exact — no transform is applied at all.

    ``xy_fwd``/``xy_inv`` instead select the JOINT (non-separable) path
    for CRS pairs like UTM: candidate range from a densified tile
    boundary bbox, containing-cell indices from the 2-D mapped center
    meshgrid, per-pixel ownership mask (disjoint across tiles since the
    transform is a function — non-owned positions emit 0, which is
    neutral under sum-merge).
    """
    out_nrows, out_ncols = out_grid.dimensions()
    if xy_fwd is not None:
        if xy_inv is None:
            raise ValueError("joint path needs both xy_fwd and xy_inv")

        def fn_joint(b: pa.Table) -> pa.Table:
            out_rows: list[dict] = []
            for top, left, nr, nc, band, tile in _iter_tiles(b):
                bbox = _tile_out_bbox(in_grid, top, left, nr, nc, xy_inv)
                rr, cc, X, Y = _joint_candidates(
                    out_grid, out_nrows, out_ncols, bbox, xy_fwd)
                if X is None:
                    continue
                src_r = np.floor(
                    (in_grid.y_max - Y) / in_grid.y_res).astype(np.int64)
                src_c = np.floor(
                    (X - in_grid.x_min) / in_grid.x_res).astype(np.int64)
                own = ((src_r >= top) & (src_r < top + nr)
                       & (src_c >= left) & (src_c < left + nc))
                if not own.any():
                    continue
                rk, ck = own.any(axis=1), own.any(axis=0)
                rr, cc = rr[rk], cc[ck]
                own = own[np.ix_(rk, ck)]
                src_r, src_c = src_r[np.ix_(rk, ck)], src_c[np.ix_(rk, ck)]
                vals = np.zeros(own.shape, dtype=np.float64)
                vals[own] = tile[src_r[own] - top, src_c[own] - left]
                _emit_patches(out_rows, rr, cc, vals, band, block,
                              out_nrows, out_ncols)
            return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

        return fn_joint

    x_inv, y_inv = _resolve_inverse(in_grid, out_grid, x_fwd, y_fwd, x_inv, y_inv)

    def fn(b: pa.Table) -> pa.Table:
        out_rows: list[dict] = []
        for top, left, nr, nc, band, tile in _iter_tiles(b):
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
            _emit_patches(out_rows, rr, cc, vals, band, block,
                          out_nrows, out_ncols)
        return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

    return fn


def make_bilinear_fn(in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256,
                     x_fwd=None, y_fwd=None, x_inv=None, y_inv=None,
                     xy_fwd=None, xy_inv=None):
    """Per-batch bilinear kernel: input tile rows → output-tile-keyed
    PARTIAL-SUM patches (exact under sum-merge).

    Semantics (whole-image definition the golden tests recompute
    directly): map each output pixel center to the input CRS; pixels
    whose mapped center falls outside the input extent are fill 0;
    otherwise the fractional source index is clamped to the pixel-center
    range (edge clamp — the last half-pixel ring replicates the border
    value) and the value is the 2×2 weighted neighbor sum.  Each of the
    4 neighbor source pixels lives in exactly one tile, so every tile
    emits the terms whose neighbor pixel it owns and the group sum
    reassembles the exact interpolation.

    ``xy_fwd``/``xy_inv`` select the joint (non-separable) 2-D path —
    same term-ownership decomposition with per-pixel masks.
    """
    out_nrows, out_ncols = out_grid.dimensions()
    in_nrows, in_ncols = in_grid.dimensions()
    if xy_fwd is not None:
        if xy_inv is None:
            raise ValueError("joint path needs both xy_fwd and xy_inv")
        pad = max(in_grid.x_res, in_grid.y_res)

        def fn_joint(b: pa.Table) -> pa.Table:
            out_rows: list[dict] = []
            for top, left, nr, nc, band, tile in _iter_tiles(b):
                bbox = _tile_out_bbox(in_grid, top, left, nr, nc, xy_inv,
                                      pad=pad)
                rr, cc, X, Y = _joint_candidates(
                    out_grid, out_nrows, out_ncols, bbox, xy_fwd)
                if X is None:
                    continue
                ext = ((Y <= in_grid.y_max) & (Y >= in_grid.y_min)
                       & (X >= in_grid.x_min) & (X <= in_grid.x_max))
                if not ext.any():
                    continue
                fr = np.clip((in_grid.y_max - Y) / in_grid.y_res - 0.5,
                             0.0, in_nrows - 1.0)
                fc = np.clip((X - in_grid.x_min) / in_grid.x_res - 0.5,
                             0.0, in_ncols - 1.0)
                r0 = np.clip(np.floor(fr).astype(np.int64), 0,
                             max(in_nrows - 2, 0))
                c0 = np.clip(np.floor(fc).astype(np.int64), 0,
                             max(in_ncols - 2, 0))
                wr, wc = fr - r0, fc - c0
                acc = np.zeros(ext.shape, dtype=np.float64)
                touched = np.zeros(ext.shape, dtype=bool)
                for rs, rw in ((r0, 1.0 - wr), (r0 + 1, wr)):
                    for cs, cw in ((c0, 1.0 - wc), (c0 + 1, wc)):
                        m = (ext & (rs >= top) & (rs < top + nr)
                             & (cs >= left) & (cs < left + nc))
                        if m.any():
                            acc[m] += (rw[m] * cw[m]) * tile[rs[m] - top,
                                                             cs[m] - left]
                            touched |= m
                if not touched.any():
                    continue
                rk, ck = touched.any(axis=1), touched.any(axis=0)
                _emit_patches(out_rows, rr[rk], cc[ck],
                              acc[np.ix_(rk, ck)], band, block,
                              out_nrows, out_ncols)
            return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

        return fn_joint

    x_inv, y_inv = _resolve_inverse(in_grid, out_grid, x_fwd, y_fwd, x_inv, y_inv)

    def fn(b: pa.Table) -> pa.Table:
        out_rows: list[dict] = []
        for top, left, nr, nc, band, tile in _iter_tiles(b):
            # tile world bounds WIDENED by one source pixel — a tile
            # also serves output pixels whose nearest-neighbor cell is
            # in the adjacent tile but whose 2×2 stencil reaches here
            y_hi = in_grid.y_max - top * in_grid.y_res + in_grid.y_res
            y_lo = in_grid.y_max - (top + nr) * in_grid.y_res - in_grid.y_res
            x_lo = in_grid.x_min + left * in_grid.x_res - in_grid.x_res
            x_hi = in_grid.x_min + (left + nc) * in_grid.x_res + in_grid.x_res
            if y_inv is not None:
                y_lo, y_hi = float(y_inv(y_lo)), float(y_inv(y_hi))
                x_lo, x_hi = float(x_inv(x_lo)), float(x_inv(x_hi))
            rr = _out_index_range(y_lo, y_hi, out_grid.y_max, out_grid.y_res,
                                  out_nrows, descending=True)
            cc = _out_index_range(x_lo, x_hi, out_grid.x_min, out_grid.x_res,
                                  out_ncols, descending=False)
            if not len(rr) or not len(cc):
                continue

            y_out = out_grid.y_max - (rr + 0.5) * out_grid.y_res
            x_out = out_grid.x_min + (cc + 0.5) * out_grid.x_res
            if y_fwd is not None:
                y_out = np.asarray(y_fwd(y_out), dtype=np.float64)
                x_out = np.asarray(x_fwd(x_out), dtype=np.float64)
            # global extent mask (identical formula in every tile)
            r_ext = (y_out <= in_grid.y_max) & (y_out >= in_grid.y_min)
            c_ext = (x_out >= in_grid.x_min) & (x_out <= in_grid.x_max)
            rr, y_out = rr[r_ext], y_out[r_ext]
            cc, x_out = cc[c_ext], x_out[c_ext]
            if not len(rr) or not len(cc):
                continue

            # fractional pixel-center index, edge-clamped
            fr = np.clip((in_grid.y_max - y_out) / in_grid.y_res - 0.5,
                         0.0, in_nrows - 1.0)
            fc = np.clip((x_out - in_grid.x_min) / in_grid.x_res - 0.5,
                         0.0, in_ncols - 1.0)
            r0 = np.clip(np.floor(fr).astype(np.int64), 0, max(in_nrows - 2, 0))
            c0 = np.clip(np.floor(fc).astype(np.int64), 0, max(in_ncols - 2, 0))
            wr = fr - r0
            wc = fc - c0
            r1, c1 = r0 + 1, c0 + 1

            own_r0 = (r0 >= top) & (r0 < top + nr)
            own_r1 = (r1 >= top) & (r1 < top + nr)
            own_c0 = (c0 >= left) & (c0 < left + nc)
            own_c1 = (c1 >= left) & (c1 < left + nc)
            rkeep = own_r0 | own_r1
            ckeep = own_c0 | own_c1
            if not rkeep.any() or not ckeep.any():
                continue
            rr, r0, r1, wr = rr[rkeep], r0[rkeep], r1[rkeep], wr[rkeep]
            own_r0, own_r1 = own_r0[rkeep], own_r1[rkeep]
            cc, c0, c1, wc = cc[ckeep], c0[ckeep], c1[ckeep], wc[ckeep]
            own_c0, own_c1 = own_c0[ckeep], own_c1[ckeep]

            acc = np.zeros((len(rr), len(cc)), dtype=np.float64)
            for rs, rw, rm in ((r0, 1.0 - wr, own_r0), (r1, wr, own_r1)):
                if not rm.any():
                    continue
                for cs, cw, cm in ((c0, 1.0 - wc, own_c0), (c1, wc, own_c1)):
                    if not cm.any():
                        continue
                    sub = tile[(rs[rm] - top)[:, None], (cs[cm] - left)[None, :]]
                    acc[np.ix_(rm, cm)] += (rw[rm][:, None] * cw[cm][None, :]) * sub
            _emit_patches(out_rows, rr, cc, acc, band, block,
                          out_nrows, out_ncols)
        return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

    return fn


def make_average_fn(in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256,
                    x_fwd=None, y_fwd=None, x_inv=None, y_inv=None,
                    xy_fwd=None, xy_inv=None):
    """Per-batch average-resample kernel: input tile rows →
    output-tile-keyed PARTIAL-MEAN patches (exact under sum-merge).

    Semantics: each output pixel averages the source pixels whose
    centers fall inside the output pixel's footprint mapped to the
    input CRS (half-open: top/left boundary centers included, bottom/
    right excluded).  When NO source center is covered (upsampling —
    the footprint is smaller than a source pixel) the pixel takes its
    containing-cell nearest value, matching GDAL average's degeneration
    to nearest on upsample; only centers outside the input extent stay
    fill 0.  The covered count is a pure function of the two grids, so
    every tile computes the identical GLOBAL count and emits
    ``local_rectangle_sum / global_count`` — fractions over disjoint
    local rectangles sum to the exact mean — and exactly one tile (the
    owner of the containing cell) emits each fallback pixel.
    """
    if xy_fwd is not None or xy_inv is not None:
        raise ValueError(
            "average resampling requires an axis-separable transform"
        )
    out_nrows, out_ncols = out_grid.dimensions()
    in_nrows, in_ncols = in_grid.dimensions()
    x_inv, y_inv = _resolve_inverse(in_grid, out_grid, x_fwd, y_fwd, x_inv, y_inv)

    def fn(b: pa.Table) -> pa.Table:
        out_rows: list[dict] = []
        for top, left, nr, nc, band, tile in _iter_tiles(b):
            y_hi = in_grid.y_max - top * in_grid.y_res
            y_lo = in_grid.y_max - (top + nr) * in_grid.y_res
            x_lo = in_grid.x_min + left * in_grid.x_res
            x_hi = in_grid.x_min + (left + nc) * in_grid.x_res
            if y_inv is not None:
                y_lo, y_hi = float(y_inv(y_lo)), float(y_inv(y_hi))
                x_lo, x_hi = float(x_inv(x_lo)), float(x_inv(x_hi))
            # footprints extend 0.5·res past centers; _out_index_range's
            # 1.5-res slop already covers that
            rr = _out_index_range(y_lo, y_hi, out_grid.y_max, out_grid.y_res,
                                  out_nrows, descending=True)
            cc = _out_index_range(x_lo, x_hi, out_grid.x_min, out_grid.x_res,
                                  out_ncols, descending=False)
            if not len(rr) or not len(cc):
                continue

            # output pixel footprint bounds mapped to the input CRS
            y_top = out_grid.y_max - rr * out_grid.y_res
            y_bot = y_top - out_grid.y_res
            x_left = out_grid.x_min + cc * out_grid.x_res
            x_right = x_left + out_grid.x_res
            if y_fwd is not None:
                y_top = np.asarray(y_fwd(y_top), dtype=np.float64)
                y_bot = np.asarray(y_fwd(y_bot), dtype=np.float64)
                x_left = np.asarray(x_fwd(x_left), dtype=np.float64)
                x_right = np.asarray(x_fwd(x_right), dtype=np.float64)

            # covered source-center index ranges [lo, hi) — the EXACT
            # global formula, identical in every tile
            gr_lo = np.ceil((in_grid.y_max - y_top) / in_grid.y_res - 0.5)
            gr_hi = np.ceil((in_grid.y_max - y_bot) / in_grid.y_res - 0.5)
            gc_lo = np.ceil((x_left - in_grid.x_min) / in_grid.x_res - 0.5)
            gc_hi = np.ceil((x_right - in_grid.x_min) / in_grid.x_res - 0.5)
            gr_lo = np.clip(gr_lo, 0, in_nrows).astype(np.int64)
            gr_hi = np.clip(gr_hi, 0, in_nrows).astype(np.int64)
            gc_lo = np.clip(gc_lo, 0, in_ncols).astype(np.int64)
            gc_hi = np.clip(gc_hi, 0, in_ncols).astype(np.int64)
            n_r = np.maximum(gr_hi - gr_lo, 0)
            n_c = np.maximum(gc_hi - gc_lo, 0)

            # nearest fallback for zero-count pixels: the tile owning
            # the containing cell emits the cell value (averaging
            # patches contribute nothing there, so the sum is exact)
            y_ctr = out_grid.y_max - (rr + 0.5) * out_grid.y_res
            x_ctr = out_grid.x_min + (cc + 0.5) * out_grid.x_res
            if y_fwd is not None:
                y_ctr = np.asarray(y_fwd(y_ctr), dtype=np.float64)
                x_ctr = np.asarray(x_fwd(x_ctr), dtype=np.float64)
            fb_r = np.floor((in_grid.y_max - y_ctr) / in_grid.y_res).astype(np.int64)
            fb_c = np.floor((x_ctr - in_grid.x_min) / in_grid.x_res).astype(np.int64)
            own_r = (fb_r >= top) & (fb_r < top + nr)
            own_c = (fb_c >= left) & (fb_c < left + nc)
            # zero-count pixels = (zero rows x any col) ∪ (nonzero rows
            # x zero cols) — two disjoint rectangles, ownership per axis
            for rsel, csel in (
                ((n_r == 0) & own_r, own_c),
                ((n_r > 0) & own_r, (n_c == 0) & own_c),
            ):
                if rsel.any() and csel.any():
                    fvals = tile[
                        (fb_r[rsel] - top)[:, None], (fb_c[csel] - left)[None, :]
                    ].astype(np.float64)
                    _emit_patches(out_rows, rr[rsel], cc[csel], fvals, band,
                                  block, out_nrows, out_ncols)

            # local (this-tile) sub-rectangles
            lr_lo = np.clip(gr_lo, top, top + nr) - top
            lr_hi = np.clip(gr_hi, top, top + nr) - top
            lc_lo = np.clip(gc_lo, left, left + nc) - left
            lc_hi = np.clip(gc_hi, left, left + nc) - left
            rkeep = (lr_hi > lr_lo) & (n_r > 0)
            ckeep = (lc_hi > lc_lo) & (n_c > 0)
            if not rkeep.any() or not ckeep.any():
                continue
            rr, lr_lo, lr_hi, n_r = rr[rkeep], lr_lo[rkeep], lr_hi[rkeep], n_r[rkeep]
            cc, lc_lo, lc_hi, n_c = cc[ckeep], lc_lo[ckeep], lc_hi[ckeep], n_c[ckeep]

            # rectangle sums via two prefix sums + gathers
            pc_sum = np.zeros((nr, nc + 1), dtype=np.float64)
            np.cumsum(tile, axis=1, out=pc_sum[:, 1:])
            q = pc_sum[:, lc_hi] - pc_sum[:, lc_lo]  # (nr, n_cc)
            pr_sum = np.zeros((nr + 1, q.shape[1]), dtype=np.float64)
            np.cumsum(q, axis=0, out=pr_sum[1:, :])
            local = pr_sum[lr_hi, :] - pr_sum[lr_lo, :]  # (n_rr, n_cc)
            acc = local / (n_r[:, None] * n_c[None, :]).astype(np.float64)
            _emit_patches(out_rows, rr, cc, acc, band, block,
                          out_nrows, out_ncols)
        return pa.Table.from_pylist(out_rows, schema=TILE_SCHEMA)

    return fn


_KERNELS = {
    "near": make_resample_fn,
    "bilinear": make_bilinear_fn,
    "average": make_average_fn,
}

RESAMPLE_METHODS = tuple(_KERNELS)


def resample_grid(ds, in_grid: PixelGrid, out_grid: PixelGrid,
                  method: str = "near", block: int = 256,
                  x_fwd=None, y_fwd=None, xy_fwd=None, xy_inv=None):
    """Tile-keyed raster Dataset → resampled Dataset on ``out_grid``
    (additive disjoint contributions; sum-merge assembles blocks).
    ``method`` ∈ ``near | bilinear | average`` (reference accepts any
    GDAL method via ``applier.py:745-758``; these are the three a
    web-corpus raster bridge actually uses).  ``xy_fwd``/``xy_inv``
    route through a joint non-separable transform (near/bilinear only —
    average's exact count formula needs axis-aligned footprints)."""
    from .tiles import merge_tile_patches

    try:
        make_fn = _KERNELS[method]
    except KeyError:
        raise ValueError(
            f"unknown resample method {method!r}; one of {RESAMPLE_METHODS}"
        ) from None
    if xy_fwd is not None and method == "average":
        raise ValueError(
            "average resampling requires an axis-separable transform "
            "(joint/non-separable CRS pairs support near and bilinear)"
        )
    partial = ds.map_batches(
        make_fn(in_grid, out_grid, block, x_fwd=x_fwd, y_fwd=y_fwd,
                xy_fwd=xy_fwd, xy_inv=xy_inv),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return partial.groupby(["tile_y", "tile_x", "band"]).map_groups(
        merge_tile_patches, batch_format="pyarrow"
    )


def resample_nearest(ds, in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256):
    """Tile-keyed raster Dataset -> nearest-resampled Dataset on
    ``out_grid`` (disjoint patches; sum-merge assembles blocks)."""
    return resample_grid(ds, in_grid, out_grid, method="near", block=block)
