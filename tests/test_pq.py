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


# ---------------------------------------------------------------------------
# IVF-PQ (round 5): residual quantization + probed-cell search
# ---------------------------------------------------------------------------

def _coarse(x, n_cells=4):
    """Deterministic unit coarse centroids: the planted cluster centers
    themselves (what a converged kmeans recovers on this data)."""
    from hyperion_crawler_ray.stages.pq import _unit
    return _unit(np.asarray(x, dtype=np.float64))


def test_ivfpq_fit_build_layout_independent(ray_session, tmp_path):
    from hyperion_crawler_ray.stages.pq import ivfpq_build_index, ivfpq_fit

    x, _, centers = _clustered()
    cents = _coarse(centers)
    a = ivfpq_fit(_ds(x), "embedding", cents, m=4, ks=8)
    b = ivfpq_fit(_ds(x).repartition(7), "embedding", cents, m=4, ks=8)
    assert np.array_equal(a["codebooks"], b["codebooks"])
    # two indexes from different block layouts hold identical rows
    import pyarrow.parquet as pq
    import glob, os
    outs = []
    for tag, ds in [("a", _ds(x)), ("b", _ds(x).repartition(5))]:
        d = os.path.join(tmp_path, f"ivfpq_{tag}")
        ivfpq_build_index(ds, "embedding", "vec_id", a, d)
        files = sorted(glob.glob(os.path.join(d, "**", "*.parquet"),
                                 recursive=True))
        rows = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
            .sort_values("vec_id").reset_index(drop=True)
        outs.append(rows)
    assert list(outs[0]["vec_id"]) == list(outs[1]["vec_id"])
    assert list(map(list, outs[0]["code"])) == list(map(list, outs[1]["code"]))


def test_ivfpq_recall_matches_pq_and_rerank_exact(ray_session, tmp_path):
    """Probing n_probe cells of residual codes must find the planted
    cluster as reliably as the flat PQ sweep, and the exact re-rank
    recovers the true top-10 — while reading ONLY the probed cells."""
    import os

    from hyperion_crawler_ray.stages.ann import cosine_topk
    from hyperion_crawler_ray.stages.pq import (
        ivfpq_build_index,
        ivfpq_fit,
        ivfpq_search_rerank,
        ivfpq_topk,
    )

    x, labels, centers = _clustered(n_per=50, seed=0)
    ds = _ds(x)
    cents = _coarse(centers)
    fit = ivfpq_fit(ds, "embedding", cents, m=4, ks=16)
    idx = os.path.join(tmp_path, "ivfpq_idx")
    ivfpq_build_index(ds, "embedding", "vec_id", fit, idx)
    q = centers[2]
    got = ivfpq_topk(idx, "vec_id", fit, q, k=10, n_probe=2)
    assert (labels[got["vec_id"].to_numpy()] == 2).all()
    exact = cosine_topk(ds, "embedding", "vec_id", q, k=10)
    rr = ivfpq_search_rerank(ds, idx, "embedding", "vec_id", fit, q,
                             k=10, n_probe=2, rerank=50)
    assert list(rr["vec_id"]) == list(exact["vec_id"])
    assert np.allclose(rr["cos"], exact["cos"])


def test_ivfpq_residual_score_identity(ray_session, tmp_path):
    """IVF-PQ's ADC score must equal q . (centroid_cell + residual
    reconstruction) — the defining identity of IVFADC (Jégou 2011 §IV)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from hyperion_crawler_ray.stages.pq import (
        _unit,
        ivfpq_build_index,
        ivfpq_fit,
        ivfpq_topk,
    )

    x, _, centers = _clustered()
    ds = _ds(x)
    cents = _coarse(centers)
    fit = ivfpq_fit(ds, "embedding", cents, m=4, ks=8)
    idx = os.path.join(tmp_path, "ivfpq_idx2")
    ivfpq_build_index(ds, "embedding", "vec_id", fit, idx)
    q = _unit(centers[0])
    got = ivfpq_topk(idx, "vec_id", fit, q, k=len(x), n_probe=len(cents))
    score = dict(zip(got["vec_id"], got["approx_cos"]))
    books = fit["codebooks"]
    m = books.shape[0]
    files = sorted(glob.glob(os.path.join(idx, "**", "*.parquet"),
                             recursive=True))
    frames = []
    for f in files:
        df = pq.read_table(f).to_pandas()
        # hive layout: the partition value lives in the dirname
        df["cell"] = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        frames.append(df)
    rows = pd.concat(frames)
    for _, r in rows.iterrows():
        recon = cents[int(r["cell"])] + np.concatenate(
            [books[j][r["code"][j]] for j in range(m)])
        assert abs(score[r["vec_id"]] - float(recon @ q)) < 1e-9
