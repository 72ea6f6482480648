"""Property-based tests (hypothesis) for the frozen kernels the crawl
invariants rest on: URL canonicalization idempotence, cuckoo filter
no-false-negatives, extractor determinism."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from hyperion_crawler_ray.functions.extract import extract_links, extract_text
from hyperion_crawler_ray.functions.urlnorm import canonicalize_url
from hyperion_crawler_ray.state.cuckoo import CuckooFilter

url_chars = st.text(
    alphabet=st.sampled_from("abcXYZ019-._~/%?&=#: @+!$'()*,;"), max_size=60)
hosts = st.from_regex(r"[a-z0-9]([a-z0-9.-]{0,20}[a-z0-9])?", fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
       host=hosts, rest=url_chars)
def test_canonicalize_idempotent(scheme, host, rest):
    url = f"{scheme}://{host}/{rest}"
    c = canonicalize_url(url)
    if c is not None:
        assert canonicalize_url(c) == c, (url, c)
        assert c.split("://", 1)[0] in ("http", "https")
        netloc = c.split("://", 1)[1].split("/", 1)[0]
        assert netloc == netloc.lower()
        assert "#" not in c


@settings(max_examples=200, deadline=None)
@given(junk=st.text(max_size=40))
def test_canonicalize_never_crashes(junk):
    # arbitrary garbage: returns a canonical URL or None, never raises
    out = canonicalize_url(junk)
    if out is not None:
        assert canonicalize_url(out) == out


@settings(max_examples=30, deadline=None)
@given(keys=st.lists(st.binary(min_size=4, max_size=24), min_size=1,
                     max_size=400, unique=True))
def test_cuckoo_no_false_negatives(keys):
    digests = [hashlib.sha1(k).digest() for k in keys]
    cf = CuckooFilter(max(64, len(digests)))
    cf.insert_many(digests)
    assert cf.contains_many(digests).all()


@settings(max_examples=100, deadline=None)
@given(body=st.text(max_size=200), href=st.text(
    alphabet=st.characters(blacklist_characters='"<>&#', min_codepoint=32,
                           max_codepoint=126), min_size=1, max_size=40))
def test_extract_deterministic_and_link_found(body, href):
    html = f'<html><body><p>{body}</p><a href="{href}">x</a></body></html>'
    assert extract_text(html) == extract_text(html)
    links = extract_links(html)
    assert href.strip() in links or href.strip() == ""


@settings(max_examples=60, deadline=None)
@given(pairs=st.lists(
    st.tuples(st.lists(st.integers(0, 50), max_size=40),
              st.lists(st.integers(0, 50), max_size=40)),
    max_size=30))
def test_pairwise_jaccard_matches_set_arithmetic(pairs):
    """hashing.pairwise_jaccard == exact |A∩B|/|A∪B| over arbitrary
    uint64 sets (including empty sides and whole-batch-empty)."""
    import numpy as np

    from hyperion_crawler_ray.functions import hashing as H

    sa = [np.unique(np.asarray(a, np.uint64)) for a, _ in pairs]
    sb = [np.unique(np.asarray(b, np.uint64)) for _, b in pairs]
    got = H.pairwise_jaccard(sa, sb)
    assert got.shape == (len(pairs),)
    for i, (a, b) in enumerate(pairs):
        u = set(a) | set(b)
        want = len(set(a) & set(b)) / len(u) if u else 1.0
        assert got[i] == want, (i, got[i], want)
