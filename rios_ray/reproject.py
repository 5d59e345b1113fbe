"""CRS reprojection without GDAL: pure-numpy transforms + warped
nearest resampling.

The reference reprojects misaligned inputs by preparing a gdalwarp VRT
once per input (``/root/reference/rios/imagereader.py:280-333``) and
computes the reprojected working-grid bbox by densifying each grid edge
with 101 points before transforming (``pixelgrid.py:295-312,348-363``),
with the target resolution derived around the grid centre
(``imagereader.py:391-408`` ``reprojResolution``).  This module
recreates those planning semantics with numpy math for the projections
a web corpus actually uses — geographic lon/lat (EPSG:4326) and Web
Mercator (EPSG:3857) — and a registry hook for user-supplied transform
pairs.

Both supported transforms are **axis-separable and monotonic** (x
depends only on lon, y only on lat), which is exactly the property the
tile-parallel resample kernel (``resample.py``) needs: a source tile's
world bounds map to output-coordinate bounds, and every output pixel
still has exactly one containing source cell, so the disjoint-patch /
sum-merge distribution argument is unchanged.  Non-separable CRS pairs
would need a quad-footprint mapping instead — out of scope, raises.
"""

from __future__ import annotations

import math

import numpy as np

from .gridmodel import PixelGrid

_R = 6378137.0  # WGS84 / Web Mercator sphere radius (EPSG:3857 defn)

DENSIFY_PTS = 101  # points per edge (reference pixelgrid.py:295-312)


def _lon_to_x(lon):
    return _R * np.radians(np.asarray(lon, dtype=np.float64))


def _x_to_lon(x):
    return np.degrees(np.asarray(x, dtype=np.float64) / _R)


def _lat_to_y(lat):
    lat = np.asarray(lat, dtype=np.float64)
    return _R * np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0))


def _y_to_lat(y):
    y = np.asarray(y, dtype=np.float64)
    return np.degrees(2.0 * np.arctan(np.exp(y / _R)) - np.pi / 2.0)


def _identity(v):
    return np.asarray(v, dtype=np.float64)


# (src, dst) -> (x_transform, y_transform); each maps src-CRS coords to
# dst-CRS coords, vectorized over numpy arrays, monotonic increasing.
_REGISTRY: dict[tuple[str, str], tuple] = {
    ("EPSG:4326", "EPSG:3857"): (_lon_to_x, _lat_to_y),
    ("EPSG:3857", "EPSG:4326"): (_x_to_lon, _y_to_lat),
}


def register_transform(src: str, dst: str, x_fn, y_fn) -> None:
    """User hook: add an axis-separable monotonic CRS transform pair."""
    _REGISTRY[(src, dst)] = (x_fn, y_fn)


def get_transform(src: str, dst: str):
    """(x_fn, y_fn) mapping src-CRS coords to dst-CRS coords."""
    if src == dst:
        return (_identity, _identity)
    try:
        return _REGISTRY[(src, dst)]
    except KeyError:
        raise ValueError(
            f"no registered transform {src} -> {dst}; use "
            "register_transform() (axis-separable monotonic only)"
        ) from None


def densified_edge_points(grid: PixelGrid, pts: int = DENSIFY_PTS):
    """(xs, ys) along all four grid edges, ``pts`` points per edge
    (reference pixelgrid.py:295-312: corners alone under-cover curved
    edges after reprojection)."""
    t = np.linspace(0.0, 1.0, pts)
    xs = grid.x_min + t * (grid.x_max - grid.x_min)
    ys = grid.y_min + t * (grid.y_max - grid.y_min)
    edge_x = np.concatenate([xs, xs, np.full(pts, grid.x_min), np.full(pts, grid.x_max)])
    edge_y = np.concatenate([np.full(pts, grid.y_min), np.full(pts, grid.y_max), ys, ys])
    return edge_x, edge_y


def reproj_resolution(grid: PixelGrid, dst_proj: str) -> tuple[float, float]:
    """Pixel size in the target CRS around the grid centre (reference
    ``imagereader.py:391-408``: transform the centre and a one-pixel
    offset, take the coordinate deltas)."""
    xf, yf = get_transform(grid.projection, dst_proj)
    cx = (grid.x_min + grid.x_max) / 2.0
    cy = (grid.y_min + grid.y_max) / 2.0
    x_res = abs(float(xf(cx + grid.x_res)) - float(xf(cx)))
    y_res = abs(float(yf(cy + grid.y_res)) - float(yf(cy)))
    return x_res, y_res


def reproject_grid(grid: PixelGrid, dst_proj: str,
                   x_res: float | None = None, y_res: float | None = None) -> PixelGrid:
    """Plan the output grid: densified-edge bbox + centre-derived
    resolution, pixel counts rounded up (``getNumPix`` semantics)."""
    xf, yf = get_transform(grid.projection, dst_proj)
    ex, ey = densified_edge_points(grid)
    tx, ty = xf(ex), yf(ey)
    if x_res is None or y_res is None:
        rx, ry = reproj_resolution(grid, dst_proj)
        x_res = x_res if x_res is not None else rx
        y_res = y_res if y_res is not None else ry
    x_min, x_max = float(tx.min()), float(tx.max())
    y_min, y_max = float(ty.min()), float(ty.max())
    ncols = max(1, int(math.ceil((x_max - x_min) / x_res)))
    nrows = max(1, int(math.ceil((y_max - y_min) / y_res)))
    return PixelGrid(
        x_min, x_min + ncols * x_res, y_max - nrows * y_res, y_max,
        x_res, y_res, dst_proj,
    )


def reproject_raster(ds, in_grid: PixelGrid, out_grid: PixelGrid,
                     method: str = "near", block: int = 256):
    """Distributed warped resample onto ``out_grid`` (different CRS
    allowed), ``method`` ∈ ``near | bilinear | average``.

    Same tile-parallel shape as :func:`resample.resample_grid` — each
    source tile independently emits its additive contribution to the
    output pixels it serves, contributions sum-merge exactly — with the
    output→source coordinate mapping routed through the registered
    per-axis transforms.  No driver-side raster work; the transform
    closures ship with the task.
    """
    from .resample import resample_grid

    x_fwd, y_fwd = get_transform(out_grid.projection, in_grid.projection)
    return resample_grid(ds, in_grid, out_grid, method=method, block=block,
                         x_fwd=x_fwd, y_fwd=y_fwd)


def reproject_nearest(ds, in_grid: PixelGrid, out_grid: PixelGrid, block: int = 256):
    """Warped nearest resample (see :func:`reproject_raster`)."""
    return reproject_raster(ds, in_grid, out_grid, method="near", block=block)
