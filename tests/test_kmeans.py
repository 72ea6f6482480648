"""Distributed k-means + SemDeDup semantic near-dup (stages/kmeans.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.stages.kmeans import (kmeans_assign, kmeans_fit,
                                                semantic_near_dup)


def _blob_table(seed=7, n_per=120, d=8, centers=3, spread=0.05):
    """Three well-separated Gaussian blobs; returns (table, labels)."""
    rng = np.random.RandomState(seed)
    mus = np.eye(centers, d) * 10.0          # far apart
    xs, labels = [], []
    for c in range(centers):
        xs.append(mus[c] + rng.standard_normal((n_per, d)) * spread)
        labels.append(np.full(n_per, c))
    x = np.concatenate(xs)
    lab = np.concatenate(labels)
    t = pa.table({
        "vid": pa.array(np.arange(len(x)), pa.int64()),
        "vec": pa.array(list(x), pa.list_(pa.float64())),
    })
    return t, lab


def test_kmeans_recovers_separated_blobs():
    t, lab = _blob_table()
    ds = rd.from_arrow(t).repartition(6)
    fit = kmeans_fit(ds, "vec", k=3, iters=8, seed=11)
    assert fit["centroids"].shape == (3, 8)
    out = kmeans_assign(ds, "vec", fit["centroids"]).to_pandas() \
        .sort_values("vid")
    # every true blob maps to exactly one fitted cluster and vice versa
    assign = out["cluster"].to_numpy()
    mapping = {}
    for c in range(3):
        got = np.unique(assign[lab == c])
        assert len(got) == 1, f"blob {c} split across clusters {got}"
        mapping[c] = got[0]
    assert len(set(mapping.values())) == 3


def test_kmeans_inertia_monotone_and_deterministic():
    t, _ = _blob_table(seed=3)
    ds = rd.from_arrow(t).repartition(5)
    f1 = kmeans_fit(ds, "vec", k=4, iters=6, seed=5)
    f2 = kmeans_fit(ds, "vec", k=4, iters=6, seed=5)
    inert = f1["inertia"]
    assert all(b <= a + 1e-6 for a, b in zip(inert, inert[1:])), inert
    np.testing.assert_allclose(f1["centroids"], f2["centroids"])
    assert f1["inertia"] == f2["inertia"]


def test_kmeans_layout_independent():
    t, _ = _blob_table(seed=9)
    ds_a = rd.from_arrow(t).repartition(2)
    ds_b = rd.from_arrow(t).repartition(13)
    fa = kmeans_fit(ds_a, "vec", k=3, iters=5, seed=5)
    fb = kmeans_fit(ds_b, "vec", k=3, iters=5, seed=5)
    np.testing.assert_allclose(fa["centroids"], fb["centroids"],
                               atol=1e-9)
    np.testing.assert_allclose(fa["inertia"], fb["inertia"], atol=1e-5)


def test_semantic_near_dup_finds_planted_pairs():
    t, _ = _blob_table(seed=13, n_per=80)
    x = np.asarray(t.column("vec").to_pylist())
    ids = t.column("vid").to_numpy()
    # plant 5 exact-duplicate vectors with fresh ids
    dup_src = ids[:5]
    dup_ids = np.arange(10_000, 10_005)
    t2 = pa.table({
        "vid": pa.array(np.concatenate([ids, dup_ids]), pa.int64()),
        "vec": pa.array(list(np.concatenate([x, x[:5]])),
                        pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t2).repartition(4)
    pairs = semantic_near_dup(ds, "vec", "vid", threshold=0.9999,
                              n_clusters=3, iters=4).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    for a, b in zip(dup_src, dup_ids):
        assert (min(a, b), max(a, b)) in got, (a, b, got)


def test_semantic_near_dup_mega_cluster_star_cap():
    # 3000 identical vectors: uncapped would emit ~4.5M pairs; the star
    # cap bounds it to n-1 per cluster
    n = 3000
    x = np.tile(np.ones(4), (n, 1))
    t = pa.table({
        "vid": pa.array(np.arange(n), pa.int64()),
        "vec": pa.array(list(x), pa.list_(pa.float64())),
    })
    ds = rd.from_arrow(t).repartition(4)
    pairs = semantic_near_dup(ds, "vec", "vid", threshold=0.99,
                              n_clusters=2, iters=2,
                              max_cluster_rows=500).to_pandas()
    assert 0 < len(pairs) <= n
    # star pairing keeps the dedup-component property: every id appears
    assert set(pairs["id_a"]) | set(pairs["id_b"]) == set(range(n))


def test_kmeans_init_storage_order_independent():
    """Round 4 replaced the prefix-sample init with a content-hash-rank
    pool: the fit must be identical under a PERMUTED row order (round
    3's limit(4096) prefix was storage-order-dependent by construction)."""
    t, _ = _blob_table(seed=11)
    perm = np.random.RandomState(3).permutation(t.num_rows)
    t_perm = t.take(pa.array(perm))
    fa = kmeans_fit(rd.from_arrow(t), "vec", k=3, iters=5, seed=5)
    fb = kmeans_fit(rd.from_arrow(t_perm).repartition(7), "vec", k=3,
                    iters=5, seed=5)
    np.testing.assert_allclose(fa["centroids"], fb["centroids"], atol=1e-9)
