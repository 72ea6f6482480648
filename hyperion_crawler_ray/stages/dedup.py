"""Dedup family (SURVEY.md §2.7 + training-data near-dup operators).

Exact dedup re-derives the reference's ``check_duplicates`` first-wins
semantics (api/src/etl/base/loader.py:188-209) with a deterministic total
order; near-dup (MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine) are the large-scale training-data additions, each built as
map_batches sketching -> groupby banding -> verify.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


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
        return pick(df).drop(columns="__bucket")

    return (
        ds.map_batches(pick_and_bucket, batch_format="pandas",
                       batch_size=16384)
        .groupby("__bucket")
        .map_groups(pick_drop, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def latest_per_key(ds: rd.Dataset, keys: list[str], ts_col: str,
                   tiebreak: str) -> rd.Dataset:
    """A-3 latest-snapshot per key (reference
    api/src/etl/krx/loader.py:224-235): keep the max-(ts, tiebreak) row."""
    return exact_dedup(ds, keys, [ts_col, tiebreak], [False, False])


def add_text_hash(ds: rd.Dataset, col: str, out: str = "text_hash") -> rd.Dataset:
    """Content hash (md5 hex) for exact-content dedup over documents."""

    def f(t: pa.Table) -> pa.Table:
        hs = [hashlib.md5(s.encode("utf-8")).hexdigest()
              for s in t.column(col).to_pylist()]
        return t.append_column(out, pa.array(hs, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    return np.unique(np.array(
        [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
         for g in grams], dtype=np.uint64))


def minhash_signatures(ds: rd.Dataset, text_col: str, id_col: str,
                       num_perm: int = 64, shingle_k: int = 3) -> rd.Dataset:
    """Per-doc MinHash signature, vectorized over permutations (numpy
    broadcasting per doc: one (num_perm, n_shingles) modmul)."""
    a, b = _minhash_params(num_perm)

    def f(t: pa.Table) -> pa.Table:
        sigs = []
        for s in t.column(text_col).to_pylist():
            h = _shingle_hashes(s, shingle_k)
            # (P,1)*(1,S) mod p — universal hashing; min over shingles
            vals = (a[:, None] * h[None, :] + b[:, None]) % _MERSENNE
            sigs.append(vals.min(axis=1).astype(np.uint64))
        return pa.table({
            id_col: t.column(id_col),
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64())),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def lsh_candidate_pairs(sig_ds: rd.Dataset, id_col: str,
                        bands: int = 16) -> rd.Dataset:
    """Band the signatures, groupby (band, band_hash) — docs sharing a
    band bucket are candidate pairs. Returns (id_a, id_b) with a < b,
    deduplicated."""

    def to_bands(t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for i, sig in zip(t.column(id_col).to_pylist(),
                          t.column("sig").to_pylist()):
            arr = np.asarray(sig, dtype=np.uint64)
            rows = arr.reshape(bands, -1)
            for bi in range(bands):
                ids.append(i)
                band_ids.append(bi)
                band_hashes.append(hashlib.md5(rows[bi].tobytes()).hexdigest())
        return pa.table({
            id_col: pa.array(ids),
            "band": pa.array(band_ids, pa.int32()),
            "band_hash": pa.array(band_hashes, pa.string()),
        })

    def pairs_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """All same-(band, band_hash) pairs within one coarse bucket —
        pandas groupby inside, so map_groups pays for B groups, not one
        per band_hash."""
        out_a, out_b = [], []
        for _, g in df.groupby(["band", "band_hash"], sort=False):
            if len(g) < 2:
                continue
            ids = sorted(g[id_col].tolist())
            for x in range(len(ids)):
                for y in range(x + 1, len(ids)):
                    out_a.append(ids[x])
                    out_b.append(ids[y])
        return pd.DataFrame({"id_a": out_a, "id_b": out_b}).drop_duplicates()

    def bucketize(t: pa.Table) -> pa.Table:
        h = pd.util.hash_array(np.asarray(t.column("band_hash").to_pylist(),
                                          dtype=object))
        return t.append_column("__bucket",
                               pa.array((h % 64).astype(np.int32), pa.int32()))

    banded = sig_ds.map_batches(to_bands, batch_format="pyarrow") \
                   .map_batches(bucketize, batch_format="pyarrow")
    cand = banded.groupby("__bucket").map_groups(
        pairs_in_bucket, batch_format="pandas")
    # dedup pairs found in multiple bands: coarse-bucket again on id_a
    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id_a", "id_b"]).drop(columns="__b2")

    def pre_dedup(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        return df.assign(
            __b2=(pd.util.hash_array(df["id_a"].to_numpy()) % 64)
            .astype(np.int32))

    return (
        cand.map_batches(pre_dedup, batch_format="pandas")
        .groupby("__b2")
        .map_groups(dedup_bucket, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def jaccard_verify(pairs_ds: rd.Dataset, docs: pd.DataFrame, id_col: str,
                   text_col: str, shingle_k: int = 3,
                   threshold: float = 0.7) -> rd.Dataset:
    """Verify candidate pairs with true n-gram Jaccard; docs table is
    broadcast (small-side lookup)."""
    import ray

    lookup = {r[id_col]: r[text_col] for _, r in docs.iterrows()}
    ref = ray.put(lookup)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        lk = ray.get(ref)
        sims = []
        for a, b in zip(df["id_a"], df["id_b"]):
            sa = set(_shingle_hashes(lk[a], shingle_k).tolist())
            sb = set(_shingle_hashes(lk[b], shingle_k).tolist())
            union = len(sa | sb)
            sims.append(len(sa & sb) / union if union else 1.0)
        df = df.copy()
        df["jaccard"] = np.round(sims, 6)
        return df[df["jaccard"] >= threshold]

    return pairs_ds.map_batches(f, batch_format="pandas") \
                   .map_batches(lambda t: t, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_column(ds: rd.Dataset, text_col: str, out: str = "simhash") -> rd.Dataset:
    """64-bit SimHash over whitespace tokens (md5 token hashes, +/-1 bit
    votes). Near-dup = small Hamming distance between signatures."""

    def f(t: pa.Table) -> pa.Table:
        sigs = []
        shifts = np.arange(64, dtype=np.uint64)
        for s in t.column(text_col).to_pylist():
            votes = np.zeros(64, dtype=np.int64)
            for tok in s.split():
                h = np.uint64(int.from_bytes(
                    hashlib.md5(tok.encode()).digest()[:8], "little"))
                bits = (h >> shifts) & np.uint64(1)
                votes += np.where(bits == 1, 1, -1)
            sig = 0
            for bi in range(64):
                if votes[bi] > 0:
                    sig |= 1 << bi
            sigs.append(np.uint64(sig))
        return t.append_column(out, pa.array(sigs, pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")


def embedding_near_dup(ds: rd.Dataset, vec_col: str, id_col: str,
                       threshold: float = 0.95, n_buckets: int = 8) -> rd.Dataset:
    """Embedding-cosine near-dup: LSH-bucket by sign of random projections
    (deterministic seed), exact cosine within bucket. Returns
    (id_a, id_b, cos) pairs above threshold."""

    def bucketize(t: pa.Table) -> pa.Table:
        vecs = np.asarray(t.column(vec_col).to_pylist(), dtype=np.float64)
        dim = vecs.shape[1]
        rng = np.random.RandomState(13)
        planes = rng.standard_normal((dim, int(np.log2(n_buckets))))
        signs = (vecs @ planes) > 0
        bucket = signs @ (1 << np.arange(signs.shape[1]))
        return pa.table({
            id_col: t.column(id_col),
            vec_col: t.column(vec_col),
            "bucket": pa.array(bucket.astype(np.int32), pa.int32()),
        })

    def within(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.asarray(df[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sims = unit @ unit.T
        ids = df[id_col].to_numpy()
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame({
            "id_a": np.minimum(ids[ia], ids[ib]),
            "id_b": np.maximum(ids[ia], ids[ib]),
            "cos": np.round(sims[ia, ib], 6),
        })

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(within, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
