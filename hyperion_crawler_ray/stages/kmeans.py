"""Distributed k-means (Lloyd) over an embedding column + SemDeDup-style
semantic near-duplicate detection built on the fitted clusters.

The iterative pattern Ray Data needs here: centroids are SMALL (k x d) and
the data is HUGE, so each Lloyd iteration is

    broadcast centroids (``ray.put`` once per iter)
      -> ``map_batches`` partial: per-batch assignment + per-cell vector
         sums / counts / inertia (a k x (d+2) table per batch — a
         combiner, never the raw assignments)
      -> driver reduce of O(blocks * k * d) floats
      -> new centroids

so the 100-TB corpus streams through once per iteration with nothing but
k x d floats ever crossing the cluster twice. The (id, vec) projection is
materialized once up front (column-pruned) so iterations don't re-read
the full parquet; at 100 TB the embedding projection is the small
fraction of the corpus and this is the standard trade — re-streaming
from storage per iteration is the alternative knob (``materialize=False``).

Semantic near-dup follows SemDeDup (Abbas et al. 2023, arXiv:2303.09540):
cluster the embedding space, then compare pairs only WITHIN a cluster —
the cluster id is the partition key, so the pairwise step is a per-group
vectorized cosine against a capped group, never an all-pairs join.

Public-knowledge basis: Lloyd's algorithm (1957/1982) with the standard
mergeable sufficient statistics (sum, count) used by every distributed
k-means implementation (e.g. MLlib docs); SemDeDup as cited.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.vectors import vec_matrix


from .exchange import coalesce_tiny as _coalesce_tiny


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


_HASH_P = np.uint64(1099511628211)              # FNV-64 prime


def _content_rank(x: np.ndarray) -> np.ndarray:
    """uint64 rank per row: wrapped polynomial mix over the row's
    float64 bit patterns — a pure function of row CONTENT, identical at
    any block layout / storage order / parallelism."""
    u = np.ascontiguousarray(x).view(np.uint64)
    with np.errstate(over="ignore"):
        pw = np.empty(u.shape[1], np.uint64)
        pw[0] = _HASH_P
        for i in range(1, len(pw)):
            pw[i] = pw[i - 1] * _HASH_P
        return (u * pw[None, :]).sum(axis=1, dtype=np.uint64)


def _init_centroids(ds: rd.Dataset, vec_col: str, k: int, seed: int,
                    sample: int = 4096) -> np.ndarray:
    """Deterministic seed centroids from a bounded sample (the
    refinement is distributed, only the init is sampled). Farthest-first
    traversal (Gonzalez 1985 k-center 2-approx) over the sample,
    canonicalized by lexicographic row order first — so well-separated
    clusters always get one seed each (no flaky random-choice
    collisions).

    The sample pool is the ``sample`` rows with the SMALLEST content
    hash (Knuth-style multiplicative rank over the vector's bits, the
    same rank-hash idea as stages/sampling.py): a per-batch combiner
    keeps at most ``sample`` rows, the driver keeps the global best —
    a uniform-by-hash sample that is a pure function of the data, NOT
    the storage-ordered prefix round 3 used (at 100 TB a prefix is one
    shard of one day's crawl — biased). Driver traffic is bounded at
    blocks x sample rows of (rank, vec)."""

    def pool(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"__rk": pa.array([], pa.uint64()),
                             "__v": pa.array([], pa.list_(pa.float64()))})
        xb = vec_matrix(t.column(vec_col))
        rk = _content_rank(xb)
        order = np.argsort(rk, kind="stable")
        if len(order) > sample:
            # include ties at the cut so the batch-level pool is also
            # content-determined (64-bit ties are rare but free to keep)
            cut = rk[order[sample - 1]]
            n_keep = int(np.searchsorted(rk[order], cut, side="right"))
            order = order[:n_keep]
        return pa.table({"__rk": pa.array(rk[order]),
                         "__v": pa.array(list(xb[order]),
                                         pa.list_(pa.float64()))})

    cand = ds.map_batches(pool, batch_format="pyarrow").to_pandas()
    x = np.asarray(cand["__v"].tolist(), dtype=np.float64)
    if len(x) == 0:
        return np.empty((0, 0), np.float64)
    rk = cand["__rk"].to_numpy().astype(np.uint64)
    order = np.lexsort((*x.T[::-1], rk))        # rank primary, lex ties
    x = x[order][:sample]
    x = x[np.lexsort(x.T[::-1])]                # canonical row order
    k = min(k, len(x))
    chosen = [0]                                # lex-smallest row starts
    mind = ((x - x[0]) ** 2).sum(1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))              # ties -> lowest index
        chosen.append(nxt)
        mind = np.minimum(mind, ((x - x[nxt]) ** 2).sum(1))
    return x[chosen].copy()


def kmeans_fit(ds: rd.Dataset, vec_col: str, k: int, iters: int = 10,
               seed: int = 5, tol: float = 1e-6,
               materialize: bool = True) -> dict:
    """Full-data distributed Lloyd. Returns ``{"centroids": (k, d),
    "inertia": [per-iter sum of squared distances], "n_iter": int}``.

    Euclidean objective over the raw vectors; inertia is guaranteed
    non-increasing across iterations (the classic Lloyd monotonicity),
    which the driver-visible query uses as its self-validation column.
    """
    proj = ds.select_columns([vec_col])
    if materialize:
        proj = _coalesce_tiny(proj.materialize())
    cent = _init_centroids(proj, vec_col, k, seed)
    k_eff, d = cent.shape
    inertias: list[float] = []

    for it in range(iters):
        cref = ray.put(cent)

        def partial(t: pa.Table, _cref=cref, _k=k_eff, _d=d) -> pa.Table:
            if t.num_rows == 0:                     # empty block guard
                return pa.table({
                    "cell": pa.array(np.arange(_k, dtype=np.int32)),
                    "count": pa.array(np.zeros(_k, np.int64)),
                    "inertia": pa.array(np.zeros(_k, np.float64)),
                    "vsum": pa.array(list(np.zeros((_k, _d))),
                                     pa.list_(pa.float64())),
                })
            c = ray.get(_cref)                      # (k, d)
            x = vec_matrix(t.column(vec_col))       # (n, d)
            # squared euclidean via the expansion trick: one matmul
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) \
                + (c * c).sum(1)[None, :]
            assign = np.argmin(d2, axis=1)
            inert = float(np.maximum(d2[np.arange(len(x)), assign], 0.0)
                          .sum()) if len(x) else 0.0
            sums = np.zeros((_k, _d), np.float64)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=_k).astype(np.int64)
            return pa.table({
                "cell": pa.array(np.arange(_k, dtype=np.int32)),
                "count": pa.array(counts),
                "inertia": pa.array(
                    np.full(_k, inert / _k, np.float64)),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
            })

        parts = proj.map_batches(partial, batch_format="pyarrow") \
            .to_pandas()                            # blocks * k small rows
        counts = np.zeros(k_eff, np.int64)
        sums = np.zeros((k_eff, d), np.float64)
        np.add.at(counts, parts["cell"].to_numpy(), parts["count"])
        np.add.at(sums, parts["cell"].to_numpy(),
                  np.asarray(parts["vsum"].tolist(), dtype=np.float64))
        inertias.append(round(float(parts["inertia"].sum()), 6))
        new = cent.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]       # empty cells keep old
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift <= tol:
            break

    return {"centroids": cent, "inertia": inertias,
            "n_iter": len(inertias)}


def kmeans_assign(ds: rd.Dataset, vec_col: str,
                  centroids: np.ndarray,
                  out: str = "cluster") -> rd.Dataset:
    """Append each row's nearest-centroid id (broadcast centroids, one
    matmul per batch)."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def f(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out, pa.array([], pa.int32()))
        c = ray.get(cref)
        x = vec_matrix(t.column(vec_col))
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) \
            + (c * c).sum(1)[None, :]
        return t.append_column(
            out, pa.array(np.argmin(d2, axis=1).astype(np.int32)))

    return ds.map_batches(f, batch_format="pyarrow")


def semantic_near_dup(ds: rd.Dataset, vec_col: str, id_col: str,
                      threshold: float = 0.95, n_clusters: int = 64,
                      iters: int = 4, seed: int = 5,
                      max_cluster_rows: int = 20_000) -> rd.Dataset:
    """SemDeDup: k-means the embedding space, emit (id_a, id_b, cos)
    pairs with cosine >= threshold WITHIN each cluster. The cluster id
    is the shuffle key; per-cluster work is one vectorized gram matrix.
    Clusters larger than ``max_cluster_rows`` are star-paired against
    the cluster's MIN-ID row (consistent with the LSH star cap) instead
    of all-pairs — a recall approximation: members connect to the
    representative only if their cosine to IT clears the threshold."""
    # ONE materialized, coalesced (id, vec) projection feeds both the
    # fit's iterations and the assignment — no second source read
    proj = _coalesce_tiny(
        ds.select_columns([id_col, vec_col]).materialize())
    fit = kmeans_fit(proj, vec_col, n_clusters, iters=iters, seed=seed,
                     materialize=False)
    assigned = kmeans_assign(proj, vec_col, fit["centroids"])

    def pairs(t: pa.Table | None) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64()),
                          "cos": pa.array([], pa.float64())})
        if t is None:
            return empty
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        x = _unit(vec_matrix(t.column(vec_col)))
        n = len(ids)
        if n < 2:
            return empty
        order = np.argsort(ids, kind="stable")
        ids, x = ids[order], x[order]
        if n > max_cluster_rows:
            rep = 0                       # star vs first id (capped path)
            cos = x @ x[rep]
            keep = np.flatnonzero((cos >= threshold)
                                  & (np.arange(n) != rep))
            a, b = ids[keep], np.full(len(keep), ids[rep], ids.dtype)
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pa.table({"id_a": pa.array(lo, pa.int64()),
                             "id_b": pa.array(hi, pa.int64()),
                             "cos": pa.array(np.round(cos[keep], 6),
                                             pa.float64())})
        g = x @ x.T
        iu, ju = np.triu_indices(n, k=1)
        m = g[iu, ju] >= threshold
        return pa.table({"id_a": pa.array(ids[iu[m]], pa.int64()),
                         "id_b": pa.array(ids[ju[m]], pa.int64()),
                         "cos": pa.array(np.round(g[iu, ju][m], 6),
                                         pa.float64())})

    # co-locate by cluster id with the direct hash exchange — a
    # groupby(cluster) sort-shuffle costs seconds of fixed overhead per
    # execution for what a dense-int partition gets in two task layers
    from .exchange import exchange_map
    return exchange_map(assigned, "cluster", n_clusters, pairs)
