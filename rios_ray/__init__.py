"""rios_ray — a Ray-Data-native spatial-join + tiling engine.

From-scratch re-expression of the reference block/tile processing model
(ubarsc/rios, studied read-only at ``/root/reference``) as
``ray.data.Dataset`` pipelines over zero-copy Arrow batches: web pages
are geocoded, encoded to grid / s2-style / hex cells, joined to polygon
layers via a broadcast point-in-polygon index, kNN'd via cell-ring
candidate generation, and bridged to RIOS-style dense raster blocks with
margin/overlap semantics — plus the training-data operators (dedup,
similarity search, text analysis) a 100 TB pipeline needs.
"""

__version__ = "0.1.0"
