"""Approximate-nearest-neighbor over an embedding column.

Baseline: brute-force cosine top-k — one numpy matmul per batch against a
broadcast query matrix (`ray.put` once, read per task). Scale path:
IVF-style coarse quantization — assign vectors to centroids, search only
the closest cells.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_topk(ds: rd.Dataset, vec_col: str, id_col: str,
                query: np.ndarray, k: int,
                exclude_ids: frozenset = frozenset()) -> pd.DataFrame:
    """Exact top-k by cosine to ``query``: per-batch matmul + per-batch
    top-k (combiner), then a tiny driver-side merge of ≤k rows per block.
    Ties broken by ascending id (deterministic)."""
    qref = ray.put(_unit(np.asarray(query, dtype=np.float64)))

    def partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        ids = np.asarray(t.column(id_col).to_pylist())
        keep = ~np.isin(ids, list(exclude_ids)) if exclude_ids else \
            np.ones(len(ids), bool)
        vecs, ids = vecs[keep], ids[keep]
        sims = _unit(vecs) @ q
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos": pa.array(sims[order], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def ivf_build_centroids(ds: rd.Dataset, vec_col: str, n_cells: int,
                        sample: int = 4096, iters: int = 10,
                        seed: int = 5) -> np.ndarray:
    """Deterministic k-means (Lloyd, fixed seed, fixed sample) for the IVF
    coarse quantizer — driver-side over a bounded sample only."""
    samp = ds.random_sample(1.0, seed=seed).limit(sample).to_pandas()
    x = _unit(np.asarray(samp[vec_col].tolist(), dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


def ivf_topk(ds: rd.Dataset, vec_col: str, id_col: str,
             query: np.ndarray, k: int, centroids: np.ndarray,
             n_probe: int = 2) -> pd.DataFrame:
    """IVF search: filter each batch to vectors whose nearest centroid is
    among the query's ``n_probe`` closest cells, then exact cosine. At
    cluster scale the dataset would be pre-partitioned by cell id so the
    read itself prunes; here the cell filter runs inside map_batches."""
    q = _unit(np.asarray(query, dtype=np.float64))
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    cref = ray.put((centroids, frozenset(probe_cells.tolist()), q))

    def partial(t: pa.Table) -> pa.Table:
        cent, cells, qv = ray.get(cref)
        vecs = _unit(np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64))
        ids = np.asarray(t.column(id_col).to_pylist())
        assign = np.argmax(vecs @ cent.T, axis=1)
        keep = np.isin(assign, list(cells))
        vecs, ids = vecs[keep], ids[keep]
        sims = vecs @ qv
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos": pa.array(sims[order], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)
