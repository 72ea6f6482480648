"""Vectorized 64-bit text-hashing kernels shared by the sketch stages
(minhash / simhash / LSH banding) and the crawl's per-page scoring.

No per-token Python loops and no hashlib in the hot path (the round-1
per-shingle md5 loop was the #1 suite cost at sf0.1): tokenization is an
Arrow kernel, token hashing is one ``pd.util.hash_array`` call over the
batch's flattened token array (C-loop SipHash-style, deterministic
across processes), and per-doc aggregation uses ``np.add.reduceat``
over contiguous doc runs — measured fastest of four candidate layouts
(the (T,64) 2-D reduceat and cumsum variants are 20-40x slower).

Hash-quality note (per review): shingle/permutation arithmetic wraps
mod 2^64, so these are wrapped polynomial mixes, NOT a universal hash
family — LSH collision-probability guarantees are empirical rather than
the textbook (a*x+b) mod p bound. That matches common production
MinHash stacks (datasketch shares the quirk) and is deterministic,
which is what the oracle-equality tests require.

Tokenization matches Python ``str.split()`` exactly:
``pc.utf8_split_whitespace`` emits empty tokens around runs/edges of
whitespace (measured), so empties are filtered before hashing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_P = np.uint64(1099511628211)      # FNV-64 prime, polynomial base
_EMPTY_DOC = np.uint64(0x9E3779B97F4A7C15)  # sentinel shingle of an empty doc
_SHINGLE_C = (np.uint64(0x9DDFEA08EB382D69),
              np.uint64(0xC2B2AE3D27D4EB4F),
              np.uint64(0x165667B19E3779F9),
              np.uint64(0x27D4EB2F165667C5),
              np.uint64(0x85EBCA77C2B2AE63))


def tokenize_batch(col: pa.Array | pa.ChunkedArray, return_tokens: bool = False):
    """Whitespace-tokenize a string column; returns
    ``(token_hashes, doc_offsets)`` where ``token_hashes`` is one uint64
    per (non-empty) token across the whole batch and ``doc_offsets``
    (len n_docs+1) delimits each document's token run. Token list per
    doc matches ``str.split()`` exactly. With ``return_tokens=True`` a
    third element carries the kept tokens as an Arrow string array (for
    stopword membership / length kernels over the same flat layout)."""
    la = pc.utf8_split_whitespace(col)
    if isinstance(la, pa.ChunkedArray):
        la = la.combine_chunks()
    flat = pc.list_flatten(la)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n_docs = len(la)
    list_offs = la.offsets.to_numpy().astype(np.int64)
    list_offs = list_offs - list_offs[0]  # normalize sliced arrays

    if len(flat) == 0:
        empty = (np.empty(0, np.uint64), np.zeros(n_docs + 1, np.int64))
        return (*empty, flat) if return_tokens else empty

    lens = pc.binary_length(flat).to_numpy()
    keep = lens > 0

    # per-doc count of NON-empty tokens -> doc offsets in kept-token
    # space. (reduceat quirks: an empty doc yields the next element
    # instead of 0 — patched below; a trailing offset == len would
    # raise — clipped.)
    doc_tok_counts = np.add.reduceat(
        keep.astype(np.int64),
        np.minimum(list_offs[:-1], len(keep) - 1))
    empty_docs = list_offs[:-1] == list_offs[1:]
    if empty_docs.any():
        doc_tok_counts[empty_docs] = 0
    doc_offsets = np.zeros(n_docs + 1, np.int64)
    np.cumsum(doc_tok_counts, out=doc_offsets[1:])

    all_kept = bool(keep.all())
    kept_arr = flat if all_kept else flat.filter(pa.array(keep))
    toks = flat.to_numpy(zero_copy_only=False)
    if not all_kept:
        toks = toks[keep]
    if len(toks) == 0:
        return ((np.empty(0, np.uint64), doc_offsets, kept_arr)
                if return_tokens else (np.empty(0, np.uint64), doc_offsets))
    hashes = pd.util.hash_array(toks).astype(np.uint64)
    return (hashes, doc_offsets, kept_arr) if return_tokens else (hashes, doc_offsets)


def simhash_from_tokens(tok_hashes: np.ndarray,
                        doc_offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc: per bit position, one vectorized
    shift/mask over the batch token-hash array + a 1-D reduceat over doc
    runs (measured ~20x faster than any (T,64)-matrix layout). A bit is
    set when strictly more than half the doc's tokens have it set — the
    same +/-1-vote rule as the round-1 per-token loop. Empty docs get
    signature 0."""
    n_docs = len(doc_offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok_hashes) == 0 or n_docs == 0:
        return out
    nonempty = doc_offsets[:-1] < doc_offsets[1:]
    starts = doc_offsets[:-1][nonempty]
    counts = (doc_offsets[1:] - doc_offsets[:-1])[nonempty]
    sig = np.zeros(len(starts), dtype=np.uint64)
    one = np.uint64(1)
    for j in range(64):
        bj = ((tok_hashes >> np.uint64(j)) & one).astype(np.int64)
        sums = np.add.reduceat(bj, starts)
        sig |= ((2 * sums > counts).astype(np.uint64) << np.uint64(j))
    out[nonempty] = sig
    return out


def shingle_hashes_from_tokens(tok_hashes: np.ndarray,
                               doc_offsets: np.ndarray, k: int):
    """k-gram shingle hashes per doc (list of uint64 arrays, UNIQUE per
    doc). A shingle hash is a constant-weighted wrap-sum of k
    consecutive token hashes, computed for the whole batch in k
    vectorized ops; docs shorter than k collapse to one shingle over
    all their tokens, empty docs to a sentinel."""
    n_docs = len(doc_offsets) - 1
    counts = doc_offsets[1:] - doc_offsets[:-1]
    n_tok = len(tok_hashes)
    with np.errstate(over="ignore"):
        if n_tok >= k:
            sh = np.zeros(n_tok - k + 1, dtype=np.uint64)
            for j in range(k):
                c = _SHINGLE_C[j % len(_SHINGLE_C)]
                sh += c * tok_hashes[j: n_tok - k + 1 + j]
        else:
            sh = np.empty(0, np.uint64)

        out = []
        for d in range(n_docs):
            s, e = int(doc_offsets[d]), int(doc_offsets[d + 1])
            if counts[d] >= k:
                out.append(np.unique(sh[s: e - k + 1]))
            elif counts[d] > 0:
                h = np.uint64(0)
                for j in range(s, e):
                    h = h * _P + tok_hashes[j]
                out.append(np.array([h], dtype=np.uint64))
            else:
                out.append(np.array([_EMPTY_DOC], dtype=np.uint64))
    return out


_MERSENNE61 = np.uint64((1 << 61) - 1)


def minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_from_shingles(shingles: np.ndarray, a: np.ndarray,
                          b: np.ndarray) -> np.ndarray:
    """MinHash signature of one doc's (unique) shingle-hash set: one
    (num_perm, n_shingles) wrapped modmul, min over shingles."""
    with np.errstate(over="ignore"):
        vals = (a[:, None] * shingles[None, :] + b[:, None]) % _MERSENNE61
    return vals.min(axis=1).astype(np.uint64)


def minhash_batch(tok_hashes: np.ndarray, doc_offsets: np.ndarray,
                  a: np.ndarray, b: np.ndarray, k: int = 3) -> list[np.ndarray]:
    """Per-doc MinHash signatures for a whole batch (shared by the crawl
    scoring stage and the standalone minhash operator)."""
    return [minhash_from_shingles(s, a, b)
            for s in shingle_hashes_from_tokens(tok_hashes, doc_offsets, k)]


def band_hashes(sigs: np.ndarray, bands: int) -> np.ndarray:
    """(n_docs, num_perm) signature matrix -> (n_docs, bands) uint64 band
    hashes (constant-weighted wrap-sum of each band's rows — replaces
    the round-1 per-band md5 loop)."""
    n, p = sigs.shape
    r = p // bands
    resh = sigs.reshape(n, bands, r)
    with np.errstate(over="ignore"):
        qpow = np.empty(r, np.uint64)
        qpow[0] = _P
        for i in range(1, r):
            qpow[i] = qpow[i - 1] * _P
        return (resh * qpow[None, None, :]).sum(axis=2, dtype=np.uint64)
