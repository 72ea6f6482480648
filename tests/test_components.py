"""Connected components + fuzzy dedup (stages/components.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hyperion_crawler_ray.stages.components import (connected_components,
                                                    fuzzy_dedup_docs)


def _pairs(edges):
    a, b = zip(*edges) if edges else ((), ())
    return rd.from_arrow(pa.table({"id_a": pa.array(a, pa.int64()),
                                   "id_b": pa.array(b, pa.int64())}))


def _cc(edges, **kw):
    out = connected_components(_pairs(edges), **kw).to_pandas()
    if out.empty:     # empty from_arrow datasets drop columns in pandas
        return {}
    return dict(zip(out["node"], out["component"]))


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _oracle(edges):
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {x: uf.find(x) for x in uf.p}


def test_planted_clusters(ray_session):
    got = _cc([(1, 2), (2, 3), (10, 11), (20, 20)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_chain_needs_many_rounds(ray_session):
    """A path graph of length 6 through the DISTRIBUTED propagation —
    it must run O(diameter) rounds, and the monotone-sum convergence
    check must not stop it early."""
    chain = [(i, i + 1) for i in range(6)]
    got = _cc(chain, driver_small_edges=0)
    assert got == {i: 0 for i in range(7)}


def test_nonconvergence_raises(ray_session):
    with pytest.raises(RuntimeError):
        _cc([(i, i + 1) for i in range(12)], max_iters=2,
            driver_small_edges=0)


def test_random_graph_matches_union_find(ray_session):
    """Seeded dense-ish random graph (few big components, small
    diameter) vs a plain union-find oracle — and the distributed path
    must equal the driver fast path on the same input."""
    rng = np.random.RandomState(7)
    edges = [tuple(sorted((int(rng.randint(0, 60)),
                           int(rng.randint(0, 60)))))
             for _ in range(90)]
    base = _cc(edges)
    assert base == _oracle(edges)
    assert _cc(edges, driver_small_edges=0) == base
    # layout independence: a different block layout of the same pairs
    repart = connected_components(
        _pairs(edges).repartition(7)).to_pandas()
    assert dict(zip(repart["node"], repart["component"])) == base


def test_fuzzy_dedup_keeps_one_per_cluster(ray_session):
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(10)], pa.string()),
    }))
    pairs = _pairs([(1, 2), (2, 3), (7, 8)])
    kept = fuzzy_dedup_docs(docs, pairs).to_pandas()
    assert sorted(kept["doc_id"]) == [0, 1, 4, 5, 6, 7, 9]
    assert set(kept.columns) == {"doc_id", "text"}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                    max_size=60))
    @settings(max_examples=25, deadline=None)
    def test_hypothesis_matches_union_find(ray_session, edges):
        # driver fast path (pure union-find) — cheap enough to hammer
        assert _cc(edges) == _oracle(edges)
except ImportError:  # pragma: no cover
    pass


def test_empty_pairs(ray_session):
    out = connected_components(_pairs([]))
    assert out.count() == 0
    # to_pandas() on an empty from_arrow dataset drops columns (Ray
    # empty-block quirk) — assert the schema on the dataset itself
    assert out.schema().names == ["node", "component"]
