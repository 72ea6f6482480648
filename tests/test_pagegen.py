"""Synthetic page universe (pagegen.py): determinism + closure."""

import collections

from hyperion_crawler_ray.functions.urlnorm import canonicalize_url
from hyperion_crawler_ray.pagegen import PageUniverse
from hyperion_crawler_ray.schema import PAGES_SCHEMA


def test_schema_and_partition_independence():
    uni = PageUniverse(500)
    whole = uni.pages_slice(0, 64)
    assert whole.schema.equals(PAGES_SCHEMA)
    assert uni.pages_for_ids([10, 11, 12]).equals(whole.slice(10, 3))


def test_urls_canonical_and_unique():
    uni = PageUniverse(500)
    urls = [uni.url_of(i) for i in range(500)]
    assert len(set(urls)) == 500
    for u in urls[:100]:
        assert canonicalize_url(u) == u


def test_messy_variants_canonicalize_back():
    uni = PageUniverse(200)
    for j in range(50):
        for salt in range(6):
            assert canonicalize_url(uni.messy_url(j, salt)) == uni.url_of(j)


def test_host_skew_is_zipf_like():
    uni = PageUniverse(2000)
    counts = collections.Counter(uni.host_of(i) for i in range(2000))
    top = counts.most_common()
    assert top[0][1] > 3 * top[len(top) // 2][1]  # head dominates median


def test_seeds_and_robots_shapes():
    uni = PageUniverse(300)
    seeds = uni.seeds_table()
    robots = uni.robots_table()
    assert seeds.num_rows == 16
    assert robots.num_rows == uni.n_hosts
    # some hosts gated, most open
    gated = sum(1 for p in robots.column("disallow_prefixes").to_pylist() if p)
    assert 0 < gated < robots.num_rows
