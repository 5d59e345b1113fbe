"""URL canonicalization known-answer vectors (messy crawl URLs that the
clean synthetic corpus cannot exercise) + DuckDB parity on the clean
form."""

import pyarrow as pa

from rios_ray.text.urls import canonical_batch


def _canon(urls):
    return canonical_batch(pa.table({"url": urls})).to_pylist()


def test_known_answer_vectors():
    rows = _canon([
        "https://es.example-0.org/p/0",
        "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&q=1#frag",
        "https://example.org:443/",
        "https://a.b.c.example.net/x?utm_a=1&utm_b=2",
        "https://example.com",
        "https://example.com/path/?a=1&utm_z=9&b=2",
        "ftp://Host.ORG/file.txt",
    ])
    want = [
        ("https://es.example-0.org/p/0", "example-0.org", 2),
        ("http://example.com/A/B?q=1", "example.com", 2),
        ("https://example.org/", "example.org", 0),
        ("https://a.b.c.example.net/x", "example.net", 1),
        ("https://example.com/", "example.com", 0),
        ("https://example.com/path?a=1&b=2", "example.com", 1),
        ("ftp://host.org/file.txt", "host.org", 1),
    ]
    for r, (canon, dom, depth) in zip(rows, want):
        assert r["canon_url"] == canon, r
        assert r["domain"] == dom, r
        assert r["path_depth"] == depth, r


def test_idempotent():
    urls = [
        "HTTP://WWW.Example.COM:80/A/B/?utm_source=x&q=1#frag",
        "https://example.com/path/?a=1&utm_z=9&b=2",
        "https://example.org:443/",
    ]
    once = [r["canon_url"] for r in _canon(urls)]
    twice = [r["canon_url"] for r in _canon(once)]
    assert once == twice


def test_non_url_rows_are_null():
    rows = _canon(["not a url", "https://ok.example.org/x"])
    assert rows[0]["canon_url"] is None
    assert rows[1]["canon_url"] == "https://ok.example.org/x"


def test_clean_urls_are_fixed_points():
    urls = [f"https://s{i}.example-{i % 7}.org/p/{i}" for i in range(500)]
    for i, r in enumerate(_canon(urls)):
        assert r["canon_url"] == urls[i]
        assert r["domain"] == f"example-{i % 7}.org"
        assert r["path_depth"] == 2
