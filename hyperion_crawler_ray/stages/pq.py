"""Product quantization (PQ) for compressed approximate nearest-neighbor
search over an embedding column.

Public-knowledge basis: Jégou, Douze & Schmid 2011 ("Product Quantization
for Nearest Neighbor Search"): split the d-dim space into ``m`` subspaces,
k-means each subspace to ``ks`` centroids, store each vector as m uint8
codes (d floats -> m bytes), and answer queries with ADC (asymmetric
distance computation): one (m x ks) lookup table per query, a code is
scored by summing its m table entries — no decompression.

Why it matters at 100 TB: a 768-dim float32 corpus is 3 KB/vector; PQ at
m=8 is 8 BYTES/vector (384x), so the candidate sweep runs over codes that
fit in worker memory, with the exact re-rank (if wanted) touching only
the survivors. The Ray Data shape mirrors the brute-force path
(``stages/ann.py``): codebooks are fit driver-side over a bounded
content-hash-rank sample (the codebook is m*ks*dsub floats — tiny),
ENCODING is a streaming ``map_batches`` (one (n, ks) matmul per
subspace), and search is a per-batch LUT-gather combiner that sends at
most k rows per block to the driver.

Determinism: the sample pool is a pure function of row content (same
rank-hash pool as stages/kmeans.py), k-means is seeded farthest-first +
Lloyd, ties in code assignment break toward the lowest centroid id —
encode/search results are independent of block layout and parallelism
(asserted in tests/test_pq.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.vectors import vec_matrix
from .kmeans import _content_rank


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _sample_pool(ds: rd.Dataset, vec_col: str, sample: int) -> np.ndarray:
    """Bounded, layout-independent sample: per-batch keep the ``sample``
    rows with the smallest content hash, driver keeps the global best
    (same pool rule as stages/kmeans.py::_init_centroids)."""

    def pool(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__rk": pa.array([], pa.uint64()),
                             "__v": pa.array([], pa.list_(pa.float64()))})
        x = vec_matrix(t.column(vec_col))
        rk = _content_rank(x)
        order = np.argsort(rk, kind="stable")
        if len(order) > sample:
            # keep ties at the cut (kmeans's pool rule, verbatim): with
            # duplicate vectors straddling the cut, dropping ties would
            # make the pool depend on block layout (ADVICE round 4)
            cut = rk[order[sample - 1]]
            n_keep = int(np.searchsorted(rk[order], cut, side="right"))
            order = order[:n_keep]
        return pa.table({"__rk": pa.array(rk[order]),
                         "__v": pa.array(list(x[order]),
                                         pa.list_(pa.float64()))})

    cand = ds.map_batches(pool, batch_format="pyarrow").to_pandas()
    x = np.asarray(cand["__v"].tolist(), dtype=np.float64)
    if len(x) == 0:
        return x
    rk = cand["__rk"].to_numpy().astype(np.uint64)
    order = np.lexsort((*x.T[::-1], rk))
    return x[order][:sample]


def _lloyd(x: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd on a small in-memory slab: farthest-first
    seeds over canonical (lex) row order, then standard iterations."""
    x = x[np.lexsort(x.T[::-1])]
    k = min(k, len(x))
    chosen = [0]
    mind = ((x - x[0]) ** 2).sum(1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((x - x[nxt]) ** 2).sum(1))
    cent = x[chosen].copy()
    for _ in range(iters):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cent.T) \
            + (cent * cent).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def pq_fit(ds: rd.Dataset, vec_col: str, m: int = 8, ks: int = 16,
           sample: int = 4096, iters: int = 10) -> dict:
    """Fit PQ codebooks over UNIT-normalized vectors (cosine search):
    returns ``{"codebooks": (m, ks, d//m) float64, "m": m, "ks": ks}``.
    Requires d % m == 0 (pad upstream otherwise). ks <= 256 (uint8
    codes)."""
    assert ks <= 256, "codes are uint8"
    x = _unit(_sample_pool(ds, vec_col, sample))
    d = x.shape[1]
    assert d % m == 0, f"d={d} not divisible by m={m}"
    dsub = d // m
    books = np.stack([_lloyd(x[:, j * dsub:(j + 1) * dsub], ks, iters)
                      for j in range(m)])
    return {"codebooks": books, "m": m, "ks": ks}


def _encode_matrix(vecs: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes; ties break to the lowest centroid id
    (np.argmin's first-minimum rule — deterministic)."""
    n = len(vecs)
    m, ks, dsub = books.shape
    codes = np.empty((n, m), np.uint8)
    for j in range(m):
        sub = vecs[:, j * dsub:(j + 1) * dsub]
        cb = books[j]
        d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cb.T) \
            + (cb * cb).sum(1)[None, :]
        codes[:, j] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(ds: rd.Dataset, vec_col: str, id_col: str,
              fit: dict, out: str = "code") -> rd.Dataset:
    """(id, code list<uint8> of length m) per row — the 384x-smaller
    search representation; one (n, ks) matmul per subspace per batch
    against the broadcast codebooks."""
    bref = ray.put(fit["codebooks"])
    m = int(fit["m"])

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t.column(id_col),
                             out: pa.array([], pa.list_(pa.uint8()))})
        books = ray.get(bref)
        codes = _encode_matrix(_unit(vec_matrix(t.column(vec_col))), books)
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(len(codes) + 1, dtype=np.int32) * m),
            pa.array(codes.reshape(-1)))
        return pa.table({id_col: t.column(id_col), out: col})

    return ds.map_batches(f, batch_format="pyarrow")


def pq_topk(codes: rd.Dataset, id_col: str, fit: dict,
            query: np.ndarray, k: int, code_col: str = "code"
            ) -> pd.DataFrame:
    """ADC top-k by approximate cosine: the query builds one (m, ks)
    dot-product lookup table; each batch scores its codes with a single
    fancy-gather + row sum and keeps its top-k (combiner) — the driver
    merges <= k rows per block. Returns (id, approx_cos, rank), ties by
    ascending id."""
    books = fit["codebooks"]
    m, ks, dsub = books.shape
    q = _unit(np.asarray(query, dtype=np.float64))
    lut = np.stack([books[j] @ q[j * dsub:(j + 1) * dsub]
                    for j in range(m)])          # (m, ks)
    lref = ray.put(lut)
    jdx = np.arange(m)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t.column(id_col),
                             "approx_cos": pa.array([], pa.float64())})
        lt = ray.get(lref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        flat = t.column(code_col)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        cm = np.asarray(flat.flatten()).reshape(len(ids), m)
        scores = lt[jdx[None, :], cm].sum(axis=1)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "approx_cos": pa.array(scores[order], pa.float64())})

    parts = codes.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["approx_cos", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def pq_search_rerank(ds: rd.Dataset, codes: rd.Dataset, vec_col: str,
                     id_col: str, fit: dict, query: np.ndarray, k: int,
                     rerank: int = 50) -> pd.DataFrame:
    """The standard two-stage PQ search: ADC over the compressed codes
    nominates ``rerank`` candidates (the cheap full-corpus sweep), then
    ONLY those ids are re-scored with exact cosine against the original
    vectors (broadcast candidate-id set + per-batch filter — at scale
    the candidates would be fetched from an id-partitioned layout
    instead of filtered from a scan). PQ's 8-byte codes rank clusters
    reliably but not fine within-cluster order; the exact re-rank
    restores it at candidate-set cost. Returns (id, cos, rank)."""
    cand = pq_topk(codes, id_col, fit, query, k=rerank)
    cand_ids = ray.put(frozenset(int(i) for i in cand[id_col]))
    q = _unit(np.asarray(query, dtype=np.float64))
    qref = ray.put(q)

    def exact_partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.isin(ids, list(ray.get(cand_ids)))
        if not keep.any():
            # derive the empty id column from the INPUT's type — a
            # hardcoded int64 would disagree with non-int64 id columns
            # on empty blocks and break the driver concat (ADVICE r4)
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "cos": pa.array([], pa.float64())})
        vecs = _unit(vec_matrix(t.column(vec_col)))[keep]
        sims = vecs @ ray.get(qref)
        return pa.table({id_col: pa.array(ids[keep]),
                         "cos": pa.array(sims, pa.float64())})

    parts = ds.map_batches(exact_partial, batch_format="pyarrow") \
        .to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


# ---------------------------------------------------------------------------
# IVF-PQ (Jégou 2011 §IV, "IVFADC"): coarse quantizer + PQ on RESIDUALS
# ---------------------------------------------------------------------------

def ivfpq_fit(ds: rd.Dataset, vec_col: str, centroids: np.ndarray,
              m: int = 8, ks: int = 16, sample: int = 4096,
              iters: int = 10) -> dict:
    """Fit the residual product codebooks for IVF-PQ: every sampled
    vector is assigned to its nearest coarse centroid and the PQ
    codebooks are trained on the RESIDUAL ``unit(x) - centroid[cell]``
    (one codebook shared across cells — the standard IVFADC layout).
    Residuals are far more concentrated than raw vectors, so the same
    8-byte code budget quantizes much finer than flat PQ. Sample pool,
    Lloyd seeding and tie rules are the deterministic kit shared with
    ``pq_fit``."""
    assert ks <= 256, "codes are uint8"
    cents = _unit(np.asarray(centroids, dtype=np.float64))
    x = _unit(_sample_pool(ds, vec_col, sample))
    d = x.shape[1]
    assert d % m == 0, f"d={d} not divisible by m={m}"
    cell = np.argmax(x @ cents.T, axis=1)
    resid = x - cents[cell]
    dsub = d // m
    books = np.stack([_lloyd(resid[:, j * dsub:(j + 1) * dsub], ks, iters)
                      for j in range(m)])
    return {"codebooks": books, "m": m, "ks": ks, "centroids": cents}


def ivfpq_build_index(ds: rd.Dataset, vec_col: str, id_col: str,
                      fit: dict, idx_dir: str) -> None:
    """Materialize the IVF-PQ layout ONCE: (id, cell, m uint8 residual
    codes) Hive-partitioned by cell. The search representation is
    ~9 bytes/vector and the probed read touches n_probe/n_cells of it —
    the composition the flat ``pq_topk`` sweep lacks. Idempotent via
    marker (same pattern as the IVF and crawl fetch indexes)."""
    import json
    import os

    marker = os.path.join(idx_dir, "_IVFPQ_SUCCESS")
    if os.path.exists(marker):
        return
    bref = ray.put((fit["centroids"], fit["codebooks"]))
    m = int(fit["m"])

    def f(t: pa.Table) -> pa.Table:
        cents, books = ray.get(bref)
        empty = pa.table({id_col: t.column(id_col).slice(0, 0),
                          "cell": pa.array([], pa.int32()),
                          "code": pa.array([], pa.list_(pa.uint8()))})
        if t.num_rows == 0:
            return empty
        vecs = _unit(vec_matrix(t.column(vec_col)))
        cell = np.argmax(vecs @ cents.T, axis=1)
        codes = _encode_matrix(vecs - cents[cell], books)
        col = pa.ListArray.from_arrays(
            pa.array(np.arange(len(codes) + 1, dtype=np.int32) * m),
            pa.array(codes.reshape(-1)))
        return pa.table({id_col: t.column(id_col),
                         "cell": pa.array(cell.astype(np.int32), pa.int32()),
                         "code": col})

    ds.map_batches(f, batch_format="pyarrow") \
        .write_parquet(idx_dir, partition_cols=["cell"])
    with open(marker, "w") as f2:
        json.dump({"m": m, "ks": int(fit["ks"]),
                   "n_cells": len(fit["centroids"])}, f2)


def ivfpq_topk(idx_dir: str, id_col: str, fit: dict, query: np.ndarray,
               k: int, n_probe: int = 2) -> pd.DataFrame:
    """ADC search over the probed cells only: per probe cell the query
    residual ``q - centroid_c`` builds its own (m, ks) lookup table, the
    cell's codes are scored with one fancy-gather + row-sum, and each
    batch keeps its top-k (combiner) — driver merges <= k rows per block.
    Returns (id, approx_cos, rank). approx_cos estimates
    ``cos(q, x) ~= q . (centroid_c + decode(code))``."""
    import glob as _glob
    import os

    cents = fit["centroids"]
    books = fit["codebooks"]
    m, ks, dsub = books.shape
    q = _unit(np.asarray(query, dtype=np.float64))
    probe = np.argsort(-(cents @ q))[:n_probe]
    jdx = np.arange(m)
    paths, luts = [], {}
    for c in probe:
        c = int(c)
        got = sorted(_glob.glob(
            os.path.join(idx_dir, f"cell={c}", "*.parquet")))
        if not got:
            continue
        paths.extend(got)
        # per-cell LUT: base = q . centroid_c, plus q-subvector dots
        # against the shared residual codebooks
        lut = np.stack([books[j] @ q[j * dsub:(j + 1) * dsub]
                        for j in range(m)])
        luts[c] = (float(cents[c] @ q), lut)
    if not paths:
        return pd.DataFrame({id_col: [], "approx_cos": [], "rank": []})
    lref = ray.put(luts)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t.column(id_col),
                             "approx_cos": pa.array([], pa.float64())})
        table = ray.get(lref)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        cell = t.column("cell").to_numpy(zero_copy_only=False)
        flat = t.column("code")
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        cm = np.asarray(flat.flatten()).reshape(len(ids), m)
        scores = np.empty(len(ids), np.float64)
        for c in np.unique(cell):
            mask = cell == c
            base, lut = table[int(c)]
            scores[mask] = base + lut[jdx[None, :], cm[mask]].sum(axis=1)
        order = np.lexsort((ids, -scores))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "approx_cos": pa.array(scores[order], pa.float64())})

    parts = rd.read_parquet(paths, columns=[id_col, "cell", "code"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["approx_cos", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)


def ivfpq_search_rerank(ds: rd.Dataset, idx_dir: str, vec_col: str,
                        id_col: str, fit: dict, query: np.ndarray, k: int,
                        n_probe: int = 2, rerank: int = 50) -> pd.DataFrame:
    """IVF-PQ two-stage search: probed-cell ADC nominates ``rerank``
    candidates, exact cosine re-ranks them (same candidate-set shape as
    ``pq_search_rerank`` — at scale the re-rank fetches candidates from
    an id-partitioned layout instead of filtering a scan)."""
    cand = ivfpq_topk(idx_dir, id_col, fit, query, k=rerank,
                      n_probe=n_probe)
    if not len(cand):
        return pd.DataFrame({id_col: [], "cos": [], "rank": []})
    cand_ids = ray.put(frozenset(int(i) for i in cand[id_col]))
    q = _unit(np.asarray(query, dtype=np.float64))
    qref = ray.put(q)

    def exact_partial(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.isin(ids, list(ray.get(cand_ids)))
        if not keep.any():
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "cos": pa.array([], pa.float64())})
        vecs = _unit(vec_matrix(t.column(vec_col)))[keep]
        sims = vecs @ ray.get(qref)
        return pa.table({id_col: pa.array(ids[keep]),
                         "cos": pa.array(sims, pa.float64())})

    parts = ds.map_batches(exact_partial, batch_format="pyarrow") \
        .to_pandas()
    parts = parts.sort_values(["cos", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    parts["rank"] = np.arange(1, len(parts) + 1, dtype=np.int64)
    return parts.reset_index(drop=True)
