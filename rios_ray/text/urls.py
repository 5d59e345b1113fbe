"""URL canonicalization — the crawl-dedup normalizer.

Vectorized pyarrow RE2 kernels end to end (no per-row Python): one
``extract_regex`` splits scheme / host / rest, then lower-casing and a
fixed chain of global replaces.  The rules are the common
crawl-pipeline canonical form:

- scheme and host lower-cased;
- ``www.`` prefix and default ports (``:80`` / ``:443``) stripped;
- fragment (``#...``) dropped;
- ``utm_*`` tracking query parameters dropped (query rebuilt, ``?``
  dropped when nothing survives);
- trailing slash stripped from non-root paths; empty path becomes
  ``/``;
- ``domain`` = last two dot-labels of the canonical host (registered
  domain without a public-suffix list — suffix-list lookup is a
  broadcast-dictionary stage if needed);
- ``path_depth`` = number of ``/``-separated path segments.

DuckDB mirrors every expression (same RE2 engine), so the oracle is
bit-identical on the synthetic corpus; messy-URL behavior is pinned by
known-answer unit tests (``tests/test_urls.py``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_SPLIT_RE = r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<host>[^/?#]+)(?P<rest>.*)$"


def canonical_batch(b: pa.Table, url_col: str = "url") -> pa.Table:
    """(url, canon_url, domain, path_depth) for every row."""
    url = b[url_col]
    ex = pc.extract_regex(url, _SPLIT_RE)
    scheme = pc.utf8_lower(pc.struct_field(ex, "scheme"))
    host = pc.utf8_lower(pc.struct_field(ex, "host"))
    rest = pc.struct_field(ex, "rest")

    host = pc.replace_substring_regex(host, r"^www\.", "")
    host = pc.replace_substring_regex(host, r":(80|443)$", "")

    # fragment off first, then split path / query
    rest = pc.replace_substring_regex(rest, r"#.*$", "")
    pex = pc.extract_regex(rest, r"^(?P<path>[^?]*)(?:\?(?P<query>.*))?$")
    path = pc.struct_field(pex, "path")
    # unparticipating optional group -> null; make "no query" explicit
    query = pc.fill_null(pc.struct_field(pex, "query"), "")
    # drop utm params; repair separators ('&' runs, leading '&')
    query = pc.replace_substring_regex(query, r"(^|&)utm_[^&]*", "")
    query = pc.replace_substring_regex(query, r"^&+", "")
    # non-root trailing slash off; empty path -> '/'
    path = pc.replace_substring_regex(path, r"(.)/$", r"\1")
    path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)

    has_q = pc.not_equal(query, "")
    canon = pc.binary_join_element_wise(
        scheme, host, pc.if_else(
            has_q,
            pc.binary_join_element_wise(path, query, "?"),
            path,
        ),
        "\x00",
    )
    canon = pc.replace_substring(canon, "\x00", "://", max_replacements=1)
    canon = pc.replace_substring(canon, "\x00", "")

    domain = pc.struct_field(
        pc.extract_regex(host, r"(?P<d>[^.]+\.[^.]+)$"), "d"
    )
    depth = pc.subtract(
        pc.count_substring(path, "/"),
        pc.cast(pc.ends_with(path, "/"), pa.int32()),
    ).cast(pa.int64())
    return pa.table(
        {
            "url": url,
            "canon_url": canon,
            "domain": domain,
            "path_depth": depth,
        }
    )
