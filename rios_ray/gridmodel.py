"""Pure-geometry pixel-grid algebra (no Ray, no GDAL).

Re-expresses the semantics of the reference grid model
(``/root/reference/rios/pixelgrid.py:34-491`` and the block-list
generation at ``/root/reference/rios/applier.py:1308-1326``) from
scratch.  Everything in the engine keys off this module: tile ids,
working-grid planning, footprint resolution, and block decomposition.

Semantics replicated bit-exactly (these decide tile membership):

- ``round_away``  — round-half-away-from-zero via ``decimal``
  (reference ``pixelgrid.py:379-389``).
- ``snap_to_grid`` — nearest whole-multiple-of-res offset from an
  anchor value (reference ``pixelgrid.py:400-412``).
- alignment tolerance ``0.001 * res / npix``
  (reference ``pixelgrid.py:124-142``).
- row-major block decomposition with ragged edge blocks
  (reference ``applier.py:1308-1326``).
"""

from __future__ import annotations

import decimal
import math
from dataclasses import dataclass, field

import numpy as np

# Footprint combination rules (reference rios/const.py:25-27)
INTERSECTION = 0
UNION = 1
BOUNDS_FROM_REFERENCE = 2


def _env_default(name: str, fallback: int) -> int:
    """Env-overridable engine default, mirroring the reference's
    ``RIOS_DFLT_BLOCKXSIZE``/``BLOCKYSIZE``/``OVERLAP``/``FOOTPRINT``
    import-time configuration (``imagereader.py:42-46``,
    ``const.py:49-95``).  ``RIOS_RAY_DFLT_*`` wins; the reference's
    ``RIOS_DFLT_*`` names are honoured as a fallback so existing user
    environments carry over unchanged."""
    import os

    for var in (f"RIOS_RAY_DFLT_{name}", f"RIOS_DFLT_{name}"):
        val = os.environ.get(var)
        if val is not None:
            return int(val)
    return fallback


DEFAULT_BLOCK_XSIZE = _env_default("BLOCKXSIZE", 256)
DEFAULT_BLOCK_YSIZE = _env_default("BLOCKYSIZE", 256)
DEFAULT_OVERLAP = _env_default("OVERLAP", 0)
DEFAULT_FOOTPRINT = _env_default("FOOTPRINT", INTERSECTION)


class GridError(ValueError):
    """Raised for non-intersecting or incomparable grids."""


def round_away(x: float) -> float:
    """Round half away from zero (Python-2-style round).

    Mirrors reference ``pixelgrid.py:379-389``: uses the ``decimal``
    module so that e.g. 2.5 -> 3.0 and -2.5 -> -3.0, where banker's
    rounding would give 2.0 / -2.0.  Tile counts and assignments depend
    on this exact behaviour.
    """
    dec = decimal.Decimal(x).quantize(decimal.Decimal("1"), rounding=decimal.ROUND_HALF_UP)
    return float(dec.to_integral_value())


def round_away_vec(x: np.ndarray) -> np.ndarray:
    """Vectorized round-half-away-from-zero, bit-exact vs ``round_away``.

    ``decimal.ROUND_HALF_UP`` on a Decimal built from a float rounds the
    *exact binary* value of the float, so the scalar version is exact.
    Here: ``x - trunc(x)`` is exact in float64 for |x| < 2**52, so
    comparing the fractional part against 0.5 reproduces the decimal
    result without the rounding error that ``floor(x + 0.5)`` introduces
    near .5 boundaries.
    """
    x = np.asarray(x, dtype=np.float64)
    t = np.trunc(x)
    frac = x - t  # exact
    bump = (np.abs(frac) >= 0.5).astype(np.float64)
    return t + np.copysign(bump, x)


def get_num_pix(grid_max: float, grid_min: float, grid_res: float) -> int:
    """Number of pixels between min and max at res (reference ``pixelgrid.py:391-398``)."""
    return int(round_away((grid_max - grid_min) / grid_res))


def snap_to_grid(val: float, val_on_grid: float, res: float) -> float:
    """Snap ``val`` to the grid anchored at ``val_on_grid`` with pitch ``res``.

    Reference ``pixelgrid.py:400-412``.
    """
    num_whole_pix = round_away((val - val_on_grid) / res)
    return val_on_grid + num_whole_pix * res


@dataclass(frozen=True, order=True)
class BlockDefn:
    """One processing block in working-grid pixel coordinates.

    Hashable and totally ordered by (top, left, nrows, ncols), matching
    the reference ``ApplierBlockDefn`` (``structures.py:725-767``) so it
    can key dicts and sort deterministically.
    """

    top: int
    left: int
    nrows: int
    ncols: int


@dataclass(frozen=True)
class PixelGrid:
    """Algebraic description of a georeferenced pixel grid.

    Mirrors the semantic surface of the reference ``PixelGridDefn``
    (``pixelgrid.py:34-98``): extent + resolution + projection string,
    with intersection / union / alignment / snapping operations.
    """

    x_min: float
    x_max: float
    y_min: float
    y_max: float
    x_res: float
    y_res: float
    projection: str = "EPSG:4326"

    # ---- shape ----
    @property
    def nrows(self) -> int:
        return get_num_pix(self.y_max, self.y_min, self.y_res)

    @property
    def ncols(self) -> int:
        return get_num_pix(self.x_max, self.x_min, self.x_res)

    def dimensions(self) -> tuple[int, int]:
        return (self.nrows, self.ncols)

    # ---- comparability / alignment ----
    def is_comparable(self, other: "PixelGrid") -> bool:
        """Same projection and resolution (reference ``pixelgrid.py`` isComparable)."""
        return (
            self.projection == other.projection
            and self.x_res == other.x_res
            and self.y_res == other.y_res
        )

    def alignment_tolerance(self, other: "PixelGrid") -> float:
        """``0.001 * min_res / max_npix`` — reference ``pixelgrid.py:124-142``."""
        npix = max(
            get_num_pix(self.x_max, self.x_min, self.x_res),
            get_num_pix(other.x_max, other.x_min, other.x_res),
            get_num_pix(self.y_max, self.y_min, self.y_res),
            get_num_pix(other.y_max, other.y_min, other.y_res),
        )
        res = min(self.x_res, self.y_res)
        return 0.001 * res / npix

    def aligned_with(self, other: "PixelGrid") -> bool:
        if not self.is_comparable(other):
            return False
        tol = self.alignment_tolerance(other)
        if abs(snap_to_grid(self.x_min, other.x_min, self.x_res) - self.x_min) > tol:
            return False
        if abs(snap_to_grid(self.y_max, other.y_max, self.y_res) - self.y_max) > tol:
            return False
        return True

    # ---- set algebra (reference pixelgrid.py:144-182) ----
    def intersection(self, other: "PixelGrid") -> "PixelGrid":
        if not self.is_comparable(other):
            raise GridError("grids are not comparable (projection/resolution differ)")
        x_min = max(self.x_min, other.x_min)
        x_max = min(self.x_max, other.x_max)
        y_min = max(self.y_min, other.y_min)
        y_max = min(self.y_max, other.y_max)
        if x_min >= x_max or y_min >= y_max:
            raise GridError("grids do not intersect")
        return PixelGrid(x_min, x_max, y_min, y_max, self.x_res, self.y_res, self.projection)

    def union(self, other: "PixelGrid") -> "PixelGrid":
        if not self.is_comparable(other):
            raise GridError("grids are not comparable (projection/resolution differ)")
        return PixelGrid(
            min(self.x_min, other.x_min),
            max(self.x_max, other.x_max),
            min(self.y_min, other.y_min),
            max(self.y_max, other.y_max),
            self.x_res,
            self.y_res,
            self.projection,
        )

    def surrounds(self, other: "PixelGrid") -> bool:
        """True if self's extent fully contains other's (reference ``surrounds``)."""
        return (
            self.x_min <= other.x_min
            and self.x_max >= other.x_max
            and self.y_min <= other.y_min
            and self.y_max >= other.y_max
        )

    def reproject_extent_to(self, ref: "PixelGrid") -> "PixelGrid":
        """This grid's extent re-expressed on the reference lattice with
        the REFERENCE's resolution — reference ``findCommonRegion``
        semantics (pixelgrid.py:415-444: misaligned grids are
        reprojected to match the reference before combining, so the
        working grid always carries the reference's res/projection)."""
        x_min = snap_to_grid(self.x_min, ref.x_min, ref.x_res)
        x_max = snap_to_grid(self.x_max, ref.x_min, ref.x_res)
        y_min = snap_to_grid(self.y_min, ref.y_max, ref.y_res)
        y_max = snap_to_grid(self.y_max, ref.y_max, ref.y_res)
        return PixelGrid(
            x_min, x_max, y_min, y_max, ref.x_res, ref.y_res, ref.projection
        )

    def snap_to(self, other: "PixelGrid") -> "PixelGrid":
        """Return self with corners snapped onto other's grid lattice."""
        x_min = snap_to_grid(self.x_min, other.x_min, self.x_res)
        y_max = snap_to_grid(self.y_max, other.y_max, self.y_res)
        return PixelGrid(
            x_min,
            x_min + self.ncols * self.x_res,
            y_max - self.nrows * self.y_res,
            y_max,
            self.x_res,
            self.y_res,
            self.projection,
        )

    # ---- pixel <-> world (reference imageio.py:42-52 wld2pix / pix2wld) ----
    def world_to_pixel(self, x, y) -> tuple[np.ndarray, np.ndarray]:
        """World coords -> fractional (row, col). Vectorized."""
        col = (np.asarray(x, dtype=np.float64) - self.x_min) / self.x_res
        row = (self.y_max - np.asarray(y, dtype=np.float64)) / self.y_res
        return row, col

    def pixel_to_world(self, row, col) -> tuple[np.ndarray, np.ndarray]:
        """(row, col) -> world coords of the pixel's top-left corner."""
        x = self.x_min + np.asarray(col, dtype=np.float64) * self.x_res
        y = self.y_max - np.asarray(row, dtype=np.float64) * self.y_res
        return x, y

    def block_bounds(self, block: BlockDefn) -> tuple[float, float, float, float]:
        """(x_min, x_max, y_min, y_max) world bounds of a block."""
        x0 = self.x_min + block.left * self.x_res
        y1 = self.y_max - block.top * self.y_res
        return (x0, x0 + block.ncols * self.x_res, y1 - block.nrows * self.y_res, y1)


def make_block_list(
    grid: PixelGrid,
    block_ysize: int = DEFAULT_BLOCK_YSIZE,
    block_xsize: int = DEFAULT_BLOCK_XSIZE,
) -> list[BlockDefn]:
    """Row-major decomposition with ragged edge blocks.

    Reference ``applier.py:1308-1326``.  Deterministic: the block list is
    a pure function of (grid dims, block size).
    """
    nrows, ncols = grid.dimensions()
    out: list[BlockDefn] = []
    top = 0
    while top < nrows:
        ysize = min(block_ysize, nrows - top)
        left = 0
        while left < ncols:
            xsize = min(block_xsize, ncols - left)
            out.append(BlockDefn(top, left, ysize, xsize))
            left += xsize
        top += ysize
    return out


def remove_surrounding(grids: list[PixelGrid]) -> list[PixelGrid]:
    """Drop grids that completely surround all the others.

    Reference ``pixelgrid.py:447-491``: an outer grid can never change an
    INTERSECTION so it is removed; iterate removing one at a time, always
    keeping at least one.  (The reference does the check in lat/long; all
    our grids share one projection so the extents compare directly.)
    """
    n = len(grids)
    keep = [True] * n
    changed = True
    while changed and sum(keep) > 1:
        changed = False
        for i in range(n):
            if keep[i] and sum(keep) > 1:
                others = [grids[j] for j in range(n) if j != i and keep[j]]
                if others and all(grids[i].surrounds(o) for o in others):
                    keep[i] = False
                    changed = True
    return [g for i, g in enumerate(grids) if keep[i]]


def find_common_region(
    grids: list[PixelGrid],
    ref_grid: PixelGrid,
    combine: int = INTERSECTION,
) -> PixelGrid:
    """Resolve the working grid from all input grids + footprint rule.

    Reference ``pixelgrid.py:415-444``: BOUNDS_FROM_REFERENCE returns the
    reference grid; INTERSECTION first removes surrounding grids, then
    folds intersection; UNION folds union.  Misaligned grids are snapped
    onto the reference lattice (reprojection proper is out of scope: one
    projection per run in this engine).
    """
    if combine == BOUNDS_FROM_REFERENCE:
        return ref_grid
    if combine == INTERSECTION:
        grids = remove_surrounding(grids)
    new_grid: PixelGrid | None = None
    for g in grids:
        if not ref_grid.aligned_with(g):
            g = g.reproject_extent_to(ref_grid)
        if new_grid is None:
            new_grid = g
        elif combine == INTERSECTION:
            new_grid = new_grid.intersection(g)
        elif combine == UNION:
            new_grid = new_grid.union(g)
        else:
            raise ValueError(f"unknown combine rule {combine}")
    if new_grid is None:
        raise GridError("empty grid list")
    return new_grid


def block_ids_for_points(
    grid: PixelGrid,
    x: np.ndarray,
    y: np.ndarray,
    block_ysize: int = DEFAULT_BLOCK_YSIZE,
    block_xsize: int = DEFAULT_BLOCK_XSIZE,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized point -> (tile_y, tile_x) assignment on the working grid.

    Points outside the grid get tile index -1.  This is the keyed
    equivalent of the reference's block membership: a pixel at (row, col)
    belongs to block (row // ysize, col // xsize).
    """
    row, col = grid.world_to_pixel(x, y)
    nrows, ncols = grid.dimensions()
    r = np.floor(row).astype(np.int64)
    c = np.floor(col).astype(np.int64)
    inside = (r >= 0) & (r < nrows) & (c >= 0) & (c < ncols)
    tile_y = np.where(inside, r // block_ysize, -1)
    tile_x = np.where(inside, c // block_xsize, -1)
    return tile_y, tile_x
