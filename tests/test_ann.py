"""ANN stages (stages/ann.py): exact brute-force vs numpy oracle, IVF
cell-partitioned pruned-read layout + recall."""

import glob
import os

import numpy as np
import pandas as pd
import ray.data as rd

from hyperion_crawler_ray.stages.ann import (
    cosine_topk,
    ivf_build_centroids,
    ivf_build_index,
    ivf_topk_indexed,
)


def _vectors(n=2000, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    vecs = rng.standard_normal((n, dim))
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for v in vecs]})
    return vecs, df


def test_cosine_topk_matches_numpy_oracle():
    vecs, df = _vectors()
    q = vecs[0]
    got = cosine_topk(rd.from_pandas(df), "embedding", "vec_id", q, k=10,
                      exclude_ids=frozenset([0]))
    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = unit @ (q / np.linalg.norm(q))
    sims[0] = -np.inf  # excluded
    want = np.lexsort((np.arange(len(sims)), -sims))[:10]
    assert list(got["vec_id"]) == list(want)


def test_ivf_indexed_prunes_and_recalls(tmp_path):
    vecs, df = _vectors()
    ds = rd.from_pandas(df)
    cents = ivf_build_centroids(ds, "embedding", n_cells=8)
    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, "embedding", cents, idx)
    # cell-partitioned layout exists (the pruned-read surface)
    cells = sorted(glob.glob(os.path.join(idx, "cell=*")))
    assert len(cells) >= 4
    assert os.path.exists(os.path.join(idx, "_IVF_SUCCESS"))
    # probe 3/8 cells: top-k recall vs exact should be high for a
    # query that IS a corpus vector (its cell is always probed)
    q = vecs[7]
    ivf = ivf_topk_indexed(idx, "embedding", "vec_id", q, k=10,
                           centroids=cents, n_probe=3)
    exact = cosine_topk(rd.from_pandas(df), "embedding", "vec_id", q, k=10)
    recall = len(set(ivf["vec_id"]) & set(exact["vec_id"])) / 10
    assert recall >= 0.5, recall
    assert ivf["vec_id"].iloc[0] == 7  # the query vector itself is rank 1
    # idempotent rebuild: marker short-circuits
    ivf_build_index(ds, "embedding", cents, idx)
