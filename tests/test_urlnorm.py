"""URL canonicalization (functions/urlnorm.py) — RFC 3986 semantics."""

import numpy as np
import pytest

from hyperion_crawler_ray.functions.urlnorm import (
    canonicalize_batch,
    canonicalize_url,
    sha1_bytes,
    url_host,
)

CASES = [
    ("HTTP://Host.EXAMPLE.com:80/a/b", "http://host.example.com/a/b"),
    ("http://h.com/./a/b", "http://h.com/a/b"),
    ("http://h.com/a/x/../b", "http://h.com/a/b"),
    ("http://h.com/a/../../b", "http://h.com/b"),
    ("http://h.com/%70age", "http://h.com/page"),
    ("http://h.com/a%2fb", "http://h.com/a%2Fb"),
    ("http://h.com/a#frag", "http://h.com/a"),
    ("http://h.com", "http://h.com/"),
    ("http://h.com.", "http://h.com/"),
    ("https://h.com:443/x", "https://h.com/x"),
    ("https://h.com:8443/x", "https://h.com:8443/x"),
    ("http://h.com/a?b=1&a=2", "http://h.com/a?b=1&a=2"),  # order preserved
    ("http://h.com/sp ace", "http://h.com/sp%20ace"),
    ("http://h.com/a/", "http://h.com/a/"),  # trailing slash significant
    ("http://h.com/a/.", "http://h.com/a/"),
]

INVALID = ["ftp://h.com/a", "javascript:void(0)", "mailto:x@y.z", "", "   ",
           "http://", "http://us@er@h.com/", "http://h.com:x/"]


@pytest.mark.parametrize("url,want", CASES)
def test_canonical_cases(url, want):
    assert canonicalize_url(url) == want


@pytest.mark.parametrize("url", INVALID)
def test_invalid(url):
    assert canonicalize_url(url) is None


def test_idempotent():
    for url, _ in CASES:
        c = canonicalize_url(url)
        assert canonicalize_url(c) == c


def test_relative_resolution():
    assert canonicalize_url("/x/y", base="http://h.com/a/b") == "http://h.com/x/y"
    assert canonicalize_url("../z", base="http://h.com/a/b/c") == "http://h.com/a/z"
    assert canonicalize_url("d.html", base="http://h.com/a/b/c") == "http://h.com/a/b/d.html"
    assert canonicalize_url("//other.com/p", base="http://h.com/a") == "http://other.com/p"


def test_batch_matches_scalar():
    urls = np.array([c[0] for c in CASES] + INVALID, dtype=object)
    canon, hosts, hashes = canonicalize_batch(urls)
    for i, u in enumerate(urls):
        want = canonicalize_url(u)
        assert canon[i] == want
        if want is not None:
            assert hosts[i] == url_host(want)
            assert hashes[i] == sha1_bytes(want)
        else:
            assert hosts[i] is None and hashes[i] is None


def test_fast_path_equals_slow_path():
    """Round 4 widened the fast-path regex (dots in path/query are
    unreserved); the invariant it must uphold: any url the fast path
    ACCEPTS is returned byte-identically by the full parse."""
    import hyperion_crawler_ray.functions.urlnorm as U

    class _NeverMatch:
        def match(self, *a):
            return None

    urls = [
        "http://host0027.example.com/india/batch/p0.html",
        "https://a.b.c/x/y.z?q=1&r=2.5",
        "http://h/x.y.z/file-name_1.html?a=b.c",
        "http://host./p",            # trailing host dot -> slow path
        "http://h/p/./q", "http://h/p/../q",   # dot segments -> slow
        "http://h//p", "http://H/p", "http://h:80/p", "http://h/p?",
        "http://h/p%41", "http://h/p?x=%7E", "http://h/sp ace",
        "https://h/p?q=a?b", "http://h/p?q=a?", "http://h/",
        "http://h/~user/.hidden/file.tar.gz?v=1.2.3",
    ]
    fast = [U.canonicalize_url(u) for u in urls]
    orig = U._FAST_RE
    try:
        U._FAST_RE = _NeverMatch()
        slow = [U.canonicalize_url(u) for u in urls]
    finally:
        U._FAST_RE = orig
    assert fast == slow
    # and the bench-shaped urls actually HIT the fast path now
    assert U._FAST_RE.match("http://host0027.example.com/india/p0.html")
