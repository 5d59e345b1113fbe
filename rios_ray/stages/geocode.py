"""Text extraction + geocoding as stateless zero-copy Arrow batch maps.

These are the engine's "user function" analogues of the reference's
per-block transform (``/root/reference/rios/applier.py:861-955``): pure,
vectorized, Arrow in / Arrow out, no per-row Python.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

HTML_PREFIX = "<html><body>"
HTML_SUFFIX = "</body></html>"
GEO_PATTERN = r"geo:(?P<glat>-?\d+\.\d+),(?P<glon>-?\d+\.\d+)"


def extract_text(batch: pa.Table) -> pa.Table:
    """html (binary) -> extracted_text (string), byte-identical invariant.

    The input_hint contract: extracted text per url must be
    byte-identical to the reference extraction.  Vectorized pyarrow
    string kernels only.

    Wrapper stripping is a guarded SLICE, not a substring replace: a
    replace would also delete wrapper strings occurring inside the
    content, and it costs two full scans; the slice touches only the
    affixes (one copy).  Unwrapped rows pass through untouched.
    """
    s = pc.cast(batch["html"], pa.string())
    wrapped = pc.and_(
        pc.starts_with(s, HTML_PREFIX), pc.ends_with(s, HTML_SUFFIX)
    )
    stripped = pc.utf8_slice_codeunits(
        s, start=len(HTML_PREFIX), stop=-len(HTML_SUFFIX)
    )
    return batch.append_column(
        "extracted_text", pc.if_else(wrapped, stripped, s)
    )


def geocode(batch: pa.Table, text_col: str = "extracted_text") -> pa.Table:
    """Parse the deterministic geo signal token -> lat/lon float64 columns.

    Same parse the DuckDB oracle does with ``regexp_extract`` + ``CAST AS
    DOUBLE``; both parsers round the decimal literal to the nearest
    float64, so results are bit-identical.
    """
    ex = pc.extract_regex(batch[text_col], GEO_PATTERN)
    lat = pc.cast(pc.struct_field(ex, "glat"), pa.float64())
    lon = pc.cast(pc.struct_field(ex, "glon"), pa.float64())
    return batch.append_column("lat", lat).append_column("lon", lon)
