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

from ..functions.vectors import vec_matrix


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
        vecs = vec_matrix(t.column(vec_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
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


def cosine_topk_batch(ds: rd.Dataset, vec_col: str, id_col: str,
                      queries: np.ndarray, k: int) -> pd.DataFrame:
    """Exact top-k for a MATRIX of queries in one pass: the (m, d) query
    matrix is `ray.put` once; each batch does a single (n, d) @ (d, m)
    matmul and keeps its per-query top-k (combiner), so the driver
    merges at most k*m rows per block regardless of dataset size.
    Returns (query_idx, rank, id, cos), ties by ascending id."""
    q = _unit(np.asarray(queries, dtype=np.float64))
    if q.ndim == 1:
        q = q[None, :]
    m = q.shape[0]
    qref = ray.put(q.T.copy())  # (d, m), contiguous for the matmul

    def partial(t: pa.Table) -> pa.Table:
        qt = ray.get(qref)
        vecs = vec_matrix(t.column(vec_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sims = _unit(vecs) @ qt                       # (n, m)
        kk = min(k, len(ids))
        out_q, out_i, out_c = [], [], []
        for j in range(m):
            order = np.lexsort((ids, -sims[:, j]))[:kk]
            out_q.append(np.full(kk, j, np.int64))
            out_i.append(ids[order])
            out_c.append(sims[order, j])
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q), pa.int64()),
            id_col: pa.array(np.concatenate(out_i)),
            "cos": pa.array(np.concatenate(out_c), pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["query_idx", "cos", id_col],
                              ascending=[True, False, True],
                              kind="mergesort")
    parts = parts.groupby("query_idx", sort=True).head(k) \
        .reset_index(drop=True)
    parts["rank"] = parts.groupby("query_idx", sort=False).cumcount() + 1
    return parts[["query_idx", "rank", id_col, "cos"]]


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


def ivf_build_index(ds: rd.Dataset, vec_col: str, centroids: np.ndarray,
                    idx_dir: str) -> None:
    """Materialize the IVF cell-partitioned layout ONCE: assign each
    vector to its nearest centroid and write Hive-partitioned parquet by
    ``cell`` — a later search reads ONLY its probe cells' files (the
    pruned read the flat scan can't do). Idempotent via marker, same
    pattern as the crawl's fetch index."""
    import json
    import os

    marker = os.path.join(idx_dir, "_IVF_SUCCESS")
    if os.path.exists(marker):
        return
    cref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(cref)
        vecs = _unit(vec_matrix(t.column(vec_col)))
        cell = np.argmax(vecs @ cent.T, axis=1)
        return t.append_column("cell", pa.array(cell.astype(np.int32),
                                                pa.int32()))

    ds.map_batches(assign, batch_format="pyarrow") \
        .write_parquet(idx_dir, partition_cols=["cell"])
    with open(marker, "w") as f:
        json.dump({"n_cells": len(centroids)}, f)


def ivf_topk_indexed(idx_dir: str, vec_col: str, id_col: str,
                     query: np.ndarray, k: int, centroids: np.ndarray,
                     n_probe: int = 2) -> pd.DataFrame:
    """IVF search against the cell-partitioned layout: the read itself
    prunes to the ``n_probe`` cells closest to the query — at 100 TB
    this touches n_probe/n_cells of the corpus instead of scanning it."""
    import glob as _glob
    import os

    q = _unit(np.asarray(query, dtype=np.float64))
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    paths = []
    for c in probe_cells:
        paths.extend(sorted(_glob.glob(
            os.path.join(idx_dir, f"cell={int(c)}", "*.parquet"))))
    if not paths:
        return pd.DataFrame({id_col: [], "cos": [], "rank": []})
    qref = ray.put(q)

    def partial(t: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        vecs = _unit(vec_matrix(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sims = vecs @ qv
        order = np.lexsort((ids, -sims))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "cos": pa.array(sims[order], pa.float64())})

    parts = rd.read_parquet(paths, columns=[id_col, vec_col]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def ivf_topk(ds: rd.Dataset, vec_col: str, id_col: str,
             query: np.ndarray, k: int, centroids: np.ndarray,
             n_probe: int = 2) -> pd.DataFrame:
    """IVF search over a FLAT dataset: filter each batch to vectors
    whose nearest centroid is among the query's ``n_probe`` closest
    cells, then exact cosine. Use ``ivf_build_index`` +
    ``ivf_topk_indexed`` for the pruned-read layout at scale."""
    q = _unit(np.asarray(query, dtype=np.float64))
    probe_cells = np.argsort(-(centroids @ q))[:n_probe]
    cref = ray.put((centroids, frozenset(probe_cells.tolist()), q))

    def partial(t: pa.Table) -> pa.Table:
        cent, cells, qv = ray.get(cref)
        vecs = _unit(vec_matrix(t.column(vec_col)))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
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
