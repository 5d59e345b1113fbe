"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

The reference's dedup surface is structural (rasterize-once managers,
``/root/reference/rios/structures.py:1086-1096``; open-handle dedup,
``ratapplier.py:912-927``); a training-data engine needs content dedup
as a first-class operator family, built here Ray-Data-first:
hash-partitioned groupbys for exact/LSH bucketing, broadcast or joined
verification, everything vectorized numpy/pyarrow per batch.
"""
