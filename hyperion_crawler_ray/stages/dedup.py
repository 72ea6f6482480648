"""Dedup family (SURVEY.md §2.7 + training-data near-dup operators).

Exact dedup re-derives the reference's ``check_duplicates`` first-wins
semantics (api/src/etl/base/loader.py:188-209) with a deterministic total
order; near-dup (MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine) are the large-scale training-data additions, each built as
map_batches sketching -> groupby banding -> verify.

Round-2 scale fixes: sketching is fully vectorized via
functions/hashing.py (no per-shingle md5 loops), candidate verification
joins pair-ids back to the DISTRIBUTED docs dataset (round 1 broadcast
the whole corpus as a driver dict — a driver OOM at 100 TB), and the
embedding LSH bucket count scales with dataset size with multi-probe to
hold recall.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache as _lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions import hashing as H
from ..functions.vectors import vec_matrix


@_lru_cache(maxsize=32)
def _lsh_planes(dim: int, n_planes: int, seed: int = 13) -> np.ndarray:
    """Deterministic random hyperplanes for the embedding LSH, cached
    per process so each worker generates them once (not per batch) —
    the broadcast-once pattern without needing a driver-side dim probe."""
    return np.random.RandomState(seed).standard_normal((dim, n_planes))


def exact_dedup(ds: rd.Dataset, keys: list[str],
                order_by: list[str], ascending: list[bool] | None = None,
                num_buckets: int = 64) -> rd.Dataset:
    """D-1 exact dedup on a composite key, deterministic first-wins: the
    kept row is the minimum under ``order_by`` (the reference's
    arrival-order first-wins made reproducible, SURVEY §2.9).

    Shape: per-batch combiner -> hash-partition into ``num_buckets``
    coarse buckets (hash of the key tuple) -> vectorized dedup per
    bucket. Size ``num_buckets`` ~ total_rows / desired_partition_rows
    at scale (each bucket must fit one task's memory); the default 64
    suits the sandbox tables. Grouping by the COARSE bucket instead of the raw key matters:
    ``map_groups`` pays per-group Python overhead, so at 10^5+ distinct
    keys a per-key grouping is 10-30x slower than per-bucket with a
    pandas ``drop_duplicates`` inside (measured)."""
    ascending = ascending or [True] * len(order_by)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_by, ascending=ascending, kind="mergesort")
        return df.drop_duplicates(keys, keep="first")

    def pick_and_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = pick(df)
        h = np.zeros(len(df), dtype=np.uint64)
        for k in keys:
            h = h * np.uint64(1000003) + pd.util.hash_array(df[k].to_numpy())
        df = df.assign(__bucket=(h % num_buckets).astype(np.int32))
        return df

    def pick_drop(df: pd.DataFrame) -> pd.DataFrame:
        if "__bucket" not in df.columns:  # whole-dataset-empty partition
            return df
        return pick(df).drop(columns="__bucket")

    # LAZY co-location (round-4 measured trade — see exchange.co_locate)
    from .exchange import _pd_partition, co_locate

    return co_locate(
        ds.map_batches(pick_and_bucket, batch_format="pandas",
                       batch_size=16384),
        "__bucket", num_buckets, _pd_partition(pick_drop))


def latest_per_key(ds: rd.Dataset, keys: list[str], ts_col: str,
                   tiebreak: str) -> rd.Dataset:
    """A-3 latest-snapshot per key (reference
    api/src/etl/krx/loader.py:224-235): keep the max-(ts, tiebreak) row."""
    return exact_dedup(ds, keys, [ts_col, tiebreak], [False, False])


def add_text_hash(ds: rd.Dataset, col: str, out: str = "text_hash") -> rd.Dataset:
    """Content hash (md5 hex) for exact-content dedup over documents.
    md5 stays here on purpose: it is one digest per DOC (not per token)
    and the hex value is reproducible in the DuckDB oracle."""

    def f(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode("utf-8")).hexdigest()
              for s in t.column(col).to_pylist()]
        return t.append_column(out, pa.array(hs, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


def minhash_signatures(ds: rd.Dataset, text_col: str, id_col: str,
                       num_perm: int = 64, shingle_k: int = 3) -> rd.Dataset:
    """Per-doc MinHash signature: one vectorized tokenize+hash pass per
    batch (functions/hashing.py), then ONE flat cache-blocked
    (num_perm x chunk) modmul over the whole batch's shingles (round 4 —
    the per-doc modmul loop paid ~10k kernel launches per 10k-doc
    batch). The Arrow list column is built from the flat signature
    buffer, no per-doc Python lists."""
    a, b = H.minhash_params(num_perm)

    def f(t: pa.Table) -> pa.Table:
        tok_hashes, offs = H.tokenize_batch(t.column(text_col))
        sigs = H.minhash_batch(tok_hashes, offs, a, b, k=shingle_k)
        return pa.table({
            id_col: t.column(id_col),
            "sig": pa.ListArray.from_arrays(
                pa.array(np.arange(len(sigs) + 1, dtype=np.int32)
                         * num_perm),
                pa.array(sigs.reshape(-1))),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds: rd.Dataset, id_col: str,
                        bands: int = 16, num_buckets: int = 64,
                        cluster_cap: int = 64) -> rd.Dataset:
    """Band the signatures, groupby (band, band_hash) — docs sharing a
    band bucket are candidate pairs. Returns (id_a, id_b) with a < b,
    deduplicated. Band hashes are uint64 wrap-sums (vectorized over the
    whole batch; round 1 md5-hexed every band of every doc in Python).

    Mega-cluster guard (round 3): a (band, band_hash) group of size c
    emits all c(c-1)/2 pairs only while c <= ``cluster_cap``; beyond
    that it emits STAR pairs (every member against the group's min id,
    c-1 pairs). A 10^6-copy boilerplate cluster would otherwise emit
    ~5*10^11 pairs from one group; the star keeps the cluster's
    CANDIDATE graph connected at O(c) output. Recall approximation:
    downstream Jaccard verification judges each (min-id, member) star
    edge on its own, so a member that is chain-connected through other
    members but below threshold against the representative itself drops
    out — the cap trades that tail of the cluster for the O(c) bound
    (exact all-pairs behavior holds for groups <= cluster_cap)."""

    def to_bands(t: pa.Table) -> pa.Table:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        sig_list = t.column("sig")
        n = len(ids)
        sigs = np.asarray(pc.list_flatten(sig_list).to_numpy()
                          ).reshape(n, -1).astype(np.uint64)
        bh = H.band_hashes(sigs, bands)           # (n, bands)
        return pa.table({
            id_col: pa.array(np.repeat(ids, bands)),
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "band_hash": pa.array(bh.reshape(-1), pa.uint64()),
            "__bucket": pa.array((bh.reshape(-1) % np.uint64(num_buckets))
                                 .astype(np.int32), pa.int32()),
        })

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """All same-(band, band_hash) pairs within one coarse bucket —
        pandas groupby inside, so map_groups pays for B groups, not one
        per band_hash. Output dtype pinned to the id column's dtype even
        when empty (an untyped empty frame becomes Arrow `null` and
        poisons downstream join schemas — observed)."""
        if id_col not in df.columns:     # whole-dataset-empty partition
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64)})
        id_dtype = df[id_col].dtype
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = np.sort(g[id_col].to_numpy())
            if len(ids) <= cluster_cap:
                ia, ib = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ia])
                out_b.append(ids[ib])
            else:
                # star pairing: O(c) pairs, cluster stays connected
                out_a.append(np.full(len(ids) - 1, ids[0], dtype=ids.dtype))
                out_b.append(ids[1:])
        if not out_a:
            return pd.DataFrame({"id_a": np.array([], dtype=id_dtype),
                                 "id_b": np.array([], dtype=id_dtype)})
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(id_dtype, copy=False),
            "id_b": np.concatenate(out_b).astype(id_dtype, copy=False),
        }).drop_duplicates()

    # LAZY co-location (round-4 measured trade — see exchange.co_locate):
    # one-shot lazy pipeline, the streaming groupby fuses per query
    from .exchange import _pd_partition, co_locate

    banded = sig_ds.map_batches(to_bands, batch_format="pyarrow")
    cand = co_locate(banded, "__bucket", num_buckets,
                     _pd_partition(pairs_in_bucket))

    # dedup pairs found in multiple bands: coarse-bucket again on id_a
    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if "__b2" not in df.columns:     # whole-dataset-empty partition
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64)})
        return df.drop_duplicates(["id_a", "id_b"]).drop(columns="__b2")

    def pre_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        return df.assign(
            __b2=(pd.util.hash_array(df["id_a"].to_numpy()) % num_buckets)
            .astype(np.int32))

    return co_locate(
        cand.map_batches(pre_dedup, batch_format="pandas"),
        "__b2", num_buckets, _pd_partition(dedup_bucket))


def _shingle_sets(col: pa.Array | pa.ChunkedArray, k: int) -> list[np.ndarray]:
    tok_hashes, offs = H.tokenize_batch(col)
    return H.shingle_hashes_from_tokens(tok_hashes, offs, k)


def jaccard_verify(pairs_ds: rd.Dataset, docs_ds: rd.Dataset, id_col: str,
                   text_col: str, shingle_k: int = 3,
                   threshold: float = 0.7,
                   num_partitions: int = 16) -> rd.Dataset:
    """Verify candidate pairs with true shingle-set Jaccard. Pair texts
    are fetched with TWO bucketed hash joins against the DISTRIBUTED
    docs dataset (id_a then id_b) — round 1 collected the whole corpus
    into a driver dict, which is a driver OOM at the 100 TB design
    point. Rounding is half-away-from-zero (the repo-wide oracle
    convention)."""
    from .joins import hash_join

    def rename(side: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{side}": t.column(id_col),
                             f"__text_{side}": t.column(text_col)})
        return f

    # static schemas: docs is typically a parquet read (metadata-only
    # schema); a schema() fetch on the lazy pairs pipeline would
    # re-execute its shuffles
    d_schema = docs_ds.schema().base_schema
    id_t = d_schema.field(id_col).type
    txt_t = d_schema.field(text_col).type
    pairs_schema = pa.schema([("id_a", id_t), ("id_b", id_t)])
    docs_a = docs_ds.map_batches(rename("a"), batch_format="pyarrow")
    docs_b = docs_ds.map_batches(rename("b"), batch_format="pyarrow")
    with_a = hash_join(pairs_ds, docs_a, on="id_a",
                       num_partitions=num_partitions,
                       left_schema=pairs_schema,
                       right_schema=pa.schema([("id_a", id_t),
                                               ("__text_a", txt_t)]))
    with_b = hash_join(with_a, docs_b, on="id_b",
                       num_partitions=num_partitions,
                       left_schema=pa.schema([("id_a", id_t), ("id_b", id_t),
                                              ("__text_a", txt_t)]),
                       right_schema=pa.schema([("id_b", id_t),
                                               ("__text_b", txt_t)]))

    def f(t: pa.Table) -> pa.Table:
        sa = _shingle_sets(t.column("__text_a"), shingle_k)
        sb = _shingle_sets(t.column("__text_b"), shingle_k)
        sims = H.pairwise_jaccard(sa, sb)
        out = pa.table({
            "id_a": t.column("id_a"),
            "id_b": t.column("id_b"),
            "jaccard": pc.round(pa.array(sims, pa.float64()), ndigits=6,
                                round_mode="half_towards_infinity"),
        })
        return out.filter(pc.greater_equal(out.column("jaccard"), threshold))

    return with_b.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_column(ds: rd.Dataset, text_col: str, out: str = "simhash") -> rd.Dataset:
    """64-bit SimHash over whitespace tokens (majority-bit votes of
    vectorized token hashes). Near-dup = small Hamming distance."""

    def f(t: pa.Table) -> pa.Table:
        tok_hashes, offs = H.tokenize_batch(t.column(text_col))
        sigs = H.simhash_from_tokens(tok_hashes, offs)
        return t.append_column(out, pa.array(sigs, pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def embedding_near_dup(ds: rd.Dataset, vec_col: str, id_col: str,
                       threshold: float = 0.95,
                       n_buckets: int | None = None,
                       target_bucket_rows: int = 256,
                       n_probe: int = 2) -> rd.Dataset:
    """Embedding-cosine near-dup: LSH-bucket by sign of random
    projections (deterministic seed), exact cosine within bucket.
    Returns (id_a, id_b, cos) pairs above threshold.

    Scale: ``n_buckets`` defaults to dataset_rows / target_bucket_rows
    (next power of two, >=8) so within-bucket work stays O(n x bucket)
    instead of O(n^2 / constant); each vector is multi-probed into its
    primary bucket plus the ``n_probe`` buckets reached by flipping its
    least-confident hyperplane signs, which restores the recall the
    extra planes would otherwise cost. Duplicate pairs from overlapping
    probes are removed by a bucketed pair-dedup."""
    if n_buckets is None:
        n_rows = ds.count()
        n_buckets = 8
        while n_buckets * target_bucket_rows < n_rows and n_buckets < (1 << 20):
            n_buckets *= 2
    n_planes = max(3, int(np.log2(n_buckets)))
    n_buckets = 1 << n_planes

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = vec_matrix(t.column(vec_col))
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        proj = vecs @ _lsh_planes(vecs.shape[1], n_planes)
        signs = proj > 0
        powers = (1 << np.arange(n_planes)).astype(np.int64)
        primary = signs @ powers
        # multi-probe: flip the n_probe planes with the smallest margin
        order = np.argsort(np.abs(proj), axis=1)[:, :n_probe]
        buckets = [primary]
        for j in range(n_probe):
            buckets.append(primary ^ powers[order[:, j]])
        all_buckets = np.concatenate(buckets)
        n = len(ids)
        rep_ids = np.tile(ids, n_probe + 1)
        rep_vecs = pa.chunked_array([t.column(vec_col).combine_chunks()]
                                    * (n_probe + 1))
        return pa.table({
            id_col: pa.array(rep_ids),
            vec_col: rep_vecs,
            "bucket": pa.array(all_buckets.astype(np.int64), pa.int64()),
        })

    _EMPTY_PAIRS = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("cos", pa.float64())])

    def within(t: pa.Table | None) -> pa.Table:
        if t is None or t.num_rows == 0:
            return _EMPTY_PAIRS.empty_table()
        ids_all = t.column(id_col).to_numpy(zero_copy_only=False)
        # drop multi-probe replicas of the same id within the bucket
        _, first = np.unique(ids_all, return_index=True)
        t = t.take(pa.array(np.sort(first)))
        vecs = vec_matrix(t.column(vec_col))
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        # half-away-from-zero (repo oracle convention; np.round is
        # banker's and disagrees on exact ties)
        cos = np.floor(np.abs(sims[ia, ib]) * 1e6 + 0.5) / 1e6 \
            * np.sign(sims[ia, ib])
        return pa.table({
            "id_a": pa.array(np.minimum(ids[ia], ids[ib])),
            "id_b": pa.array(np.maximum(ids[ia], ids[ib])),
            "cos": pa.array(cos, pa.float64()),
        })

    def pre_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["id_a", "id_b"])
        return df.assign(
            __b2=(pd.util.hash_array(df["id_a"].to_numpy()) % 64)
            .astype(np.int32))

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if "__b2" not in df.columns:     # whole-dataset-empty partition
            return pd.DataFrame({"id_a": np.array([], np.int64),
                                 "id_b": np.array([], np.int64),
                                 "cos": np.array([], np.float64)})
        return df.drop_duplicates(["id_a", "id_b"]).drop(columns="__b2")

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow")
    from .exchange import _pd_partition, co_locate
    pairs = co_locate(bucketed, "bucket", n_buckets, within)
    return co_locate(pairs.map_batches(pre_dedup, batch_format="pandas"),
                     "__b2", 64, _pd_partition(dedup_bucket))
