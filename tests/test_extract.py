"""HTML text/link extraction (functions/extract.py) — incl. the per-url
byte-identical text invariant of BASELINE.json input_hint."""

from hyperion_crawler_ray.functions.extract import (
    EXTRACTOR_VERSION,
    extract_links,
    extract_text,
)
from hyperion_crawler_ray.pagegen import PageUniverse


def test_extract_text_basic():
    html = (b"<html><head><title>T</title><style>x{}</style></head><body>"
            b"<h1>Head</h1><script>var q=1;</script><p>a  b</p>"
            b"<p>c &amp; d</p><!-- note --></body></html>")
    assert extract_text(html) == "T\nHead\na b\nc & d"


def test_extract_text_deterministic_and_str_bytes_equal():
    html = "<p>café &lt;3</p>".encode("utf-8")
    assert extract_text(html) == extract_text(html.decode("utf-8")) == "café <3"


def test_extract_links_order_and_dedup():
    html = (b'<a href="/a">1</a><a href="/b">2</a><a href="/a">3</a>'
            b"<a href='#x'>skip</a><a href=/c>4</a>"
            b'<script><a href="/ghost">no</a></script>')
    assert extract_links(html) == ["/a", "/b", "/c"]


def test_byte_identical_invariant_on_corpus():
    """Golden invariant: re-running the frozen extractor over every html
    in a generated corpus reproduces the ``text`` column byte-for-byte."""
    uni = PageUniverse(300)
    tbl = uni.pages_slice(0, 300)
    for row in tbl.to_pylist():
        assert extract_text(row["html"]) == row["text"], row["url"]


def test_extractor_version_frozen():
    assert EXTRACTOR_VERSION == "1.0.0"
