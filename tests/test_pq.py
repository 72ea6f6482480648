"""Product quantization (stages/pq.py): determinism, layout
independence, ADC score consistency, planted-cluster recall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.stages.pq import (
    _encode_matrix,
    _unit,
    pq_encode,
    pq_fit,
    pq_topk,
)


def _clustered(n_per=50, d=16, n_clusters=4, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.standard_normal((n_clusters, d)) * 5.0
    rows, labels = [], []
    for c in range(n_clusters):
        rows.append(centers[c] + 0.1 * rng.standard_normal((n_per, d)))
        labels += [c] * n_per
    x = np.concatenate(rows)
    return x, np.array(labels), centers


def _ds(x):
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([list(v) for v in x],
                              pa.list_(pa.float64())),
    }))


def test_fit_and_encode_layout_independent(ray_session):
    x, _, _ = _clustered()
    a = pq_fit(_ds(x), "embedding", m=4, ks=8)
    b = pq_fit(_ds(x).repartition(7), "embedding", m=4, ks=8)
    assert np.array_equal(a["codebooks"], b["codebooks"])
    ca = pq_encode(_ds(x), "embedding", "vec_id", a).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    cb = pq_encode(_ds(x).repartition(5), "embedding", "vec_id", a) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert list(map(list, ca["code"])) == list(map(list, cb["code"]))
    assert all(len(c) == 4 for c in ca["code"])


def test_adc_score_equals_reconstruction_dot(ray_session):
    """ADC's LUT-sum score must equal the dot product of the query with
    the code's RECONSTRUCTION (concatenated assigned centroids) — the
    defining identity of product quantization."""
    x, _, centers = _clustered()
    fit = pq_fit(_ds(x), "embedding", m=4, ks=8)
    books = fit["codebooks"]
    m, ks, dsub = books.shape
    q = _unit(centers[0])
    codes = pq_encode(_ds(x), "embedding", "vec_id", fit).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    got = pq_topk(pq_encode(_ds(x), "embedding", "vec_id", fit),
                  "vec_id", fit, q, k=len(x))
    score = dict(zip(got["vec_id"], got["approx_cos"]))
    for vid, code in zip(codes["vec_id"], codes["code"]):
        recon = np.concatenate([books[j][code[j]] for j in range(m)])
        assert abs(score[vid] - float(recon @ q)) < 1e-9


def test_planted_cluster_recall_and_rerank(ray_session):
    """Querying at a cluster center: the ADC sweep's top-k is pure to
    that cluster (PQ ranks CLUSTERS reliably), and the exact re-rank of
    its candidates recovers the true top-10 exactly (PQ does not rank
    fine within-cluster order — the two-stage search does)."""
    from hyperion_crawler_ray.stages.ann import cosine_topk
    from hyperion_crawler_ray.stages.pq import pq_search_rerank

    x, labels, centers = _clustered(n_per=50, seed=0)
    ds = _ds(x)
    fit = pq_fit(ds, "embedding", m=4, ks=16)
    codes = pq_encode(ds, "embedding", "vec_id", fit)
    q = centers[2]
    got = pq_topk(codes, "vec_id", fit, q, k=10)
    assert (labels[got["vec_id"].to_numpy()] == 2).all()
    exact = cosine_topk(ds, "embedding", "vec_id", q, k=10)
    reranked = pq_search_rerank(ds, codes, "embedding", "vec_id", fit,
                                q, k=10, rerank=50)
    assert list(reranked["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(reranked["cos"], exact["cos"])


def test_encode_matrix_tie_breaks_low_id():
    books = np.zeros((1, 3, 2))
    books[0, 1] = [1.0, 1.0]
    books[0, 2] = [0.0, 0.0]          # duplicate of centroid 0
    codes = _encode_matrix(np.array([[0.0, 0.0]]), books)
    assert codes[0, 0] == 0           # first minimum wins
