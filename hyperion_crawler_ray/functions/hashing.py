"""Vectorized 64-bit text-hashing kernels shared by the sketch stages
(minhash / simhash / LSH banding) and the crawl's per-page scoring.

No per-token Python loops and no hashlib in the hot path (the round-1
per-shingle md5 loop was the #1 suite cost at sf0.1): tokenization is an
Arrow kernel, token hashing reads the Arrow BYTE BUFFER directly
(``hash_tokens`` — round 4; the previous ``pd.util.hash_array`` route
materialized every token as a PyObject first, ~60% of tokenize cost),
and per-doc aggregation uses ``np.add.reduceat`` over contiguous doc
runs — measured fastest of four candidate layouts (the (T,64) 2-D
reduceat and cumsum variants are 20-40x slower).

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
import pyarrow as pa
import pyarrow.compute as pc

_P = np.uint64(1099511628211)      # FNV-64 prime, polynomial base
_EMPTY_DOC = np.uint64(0x9E3779B97F4A7C15)  # sentinel shingle of an empty doc
_SHINGLE_C = (np.uint64(0x9DDFEA08EB382D69),
              np.uint64(0xC2B2AE3D27D4EB4F),
              np.uint64(0x165667B19E3779F9),
              np.uint64(0x27D4EB2F165667C5),
              np.uint64(0x85EBCA77C2B2AE63))


_FMIX1 = np.uint64(0xFF51AFD7ED558CCD)   # murmur3 fmix64 constants
_FMIX2 = np.uint64(0xC4CEB9FE1A85EC53)
_P_INV = np.uint64(pow(int(_P), -1, 1 << 64))   # P odd -> invertible
_POWG = np.array([1], np.uint64)          # P^i,     grown on demand
_INVG = np.array([1], np.uint64)          # P^-i,    grown on demand


def _pow_tables(upto: int):
    """Global-position power tables P^i / P^-i (mod 2^64), grown on
    demand and cached per process — one sequential cumprod, amortized
    across every batch a worker ever hashes."""
    global _POWG, _INVG
    if len(_POWG) <= upto:
        size = max(upto + 1, 2 * len(_POWG))
        with np.errstate(over="ignore"):
            _POWG = np.concatenate(
                ([np.uint64(1)],
                 np.cumprod(np.full(size - 1, _P, np.uint64))))
            _INVG = np.concatenate(
                ([np.uint64(1)],
                 np.cumprod(np.full(size - 1, _P_INV, np.uint64))))
    return _POWG, _INVG


def hash_tokens(arr: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Deterministic 64-bit hash per string, computed DIRECTLY from the
    Arrow byte buffer — no Python-object materialization (round 4: the
    ``to_numpy(object)`` + ``pd.util.hash_array`` pair was ~60% of
    tokenize cost, all of it allocating and walking per-token PyObjects).

    Shape: ONE sequential pass — ``terms = byte[p] * P^p`` over the flat
    buffer (global position p, power table cached per process), one
    ``add.reduceat`` over the token runs, then a per-token multiply by
    ``P^-start`` (P is odd, so invertible mod 2^64) which shifts the
    polynomial back to token-relative exponents, making the hash a pure
    function of the token's bytes regardless of position. Length-fold +
    murmur3-style fmix64 avalanche per token gives the per-bit diffusion
    downstream SimHash majority-votes need. No per-byte index arrays are
    built at all on the dense path. Same quality caveat as the rest of
    this module: a fast deterministic mix, not a cryptographic or
    provably-universal family."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = arr.buffers()
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=off_dt)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    total = int(lens.sum())
    powg, invg = _pow_tables(total)

    with np.errstate(over="ignore"):
        if total:
            # token bytes, in token order (a freshly-built/filtered
            # array is dense — one slice; a sliced view gathers)
            dense = bool((starts[1:] == starts[:-1] + lens[:-1]).all())
            if dense:
                src = data[starts[0]: starts[0] + total]
            else:
                src = data[np.repeat(starts, lens) + _ranges(lens)]
            rel = np.zeros(n, np.int64)
            np.cumsum(lens[:-1], out=rel[1:])
            terms = src * powg[:total]
            sums = np.add.reduceat(terms, np.minimum(rel, total - 1))
            sums *= invg[rel]                # P^-start: position-free
            empty = lens == 0
            if empty.any():
                sums[empty] = 0              # reduceat echo on 0-len runs
        else:
            sums = np.zeros(n, np.uint64)
        h = sums ^ (lens.astype(np.uint64) * _P)
        h ^= h >> np.uint64(33)
        h *= _FMIX1
        h ^= h >> np.uint64(33)
        h *= _FMIX2
        h ^= h >> np.uint64(29)
    return h


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
    if len(kept_arr) == 0:
        return ((np.empty(0, np.uint64), doc_offsets, kept_arr)
                if return_tokens else (np.empty(0, np.uint64), doc_offsets))
    hashes = hash_tokens(kept_arr)
    return (hashes, doc_offsets, kept_arr) if return_tokens else (hashes, doc_offsets)


def _ranges(lens: np.ndarray) -> np.ndarray:
    """Concatenation of ``arange(l) for l in lens`` without a loop."""
    total = int(lens.sum())
    starts = np.zeros(len(lens), np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


_LANE = np.uint64(0x0101010101010101)   # one bit per byte lane


def simhash_from_tokens(tok_hashes: np.ndarray,
                        doc_offsets: np.ndarray) -> np.ndarray:
    """64-bit SimHash per doc. A bit is set when strictly more than half
    the doc's tokens have it set — the same +/-1-vote rule as the
    round-1 per-token loop. Empty docs get signature 0.

    Lane-packed popcount (round 4 — the crawl scoring stage is memory-
    bandwidth-bound, BASELINE.md): ``(h >> g) & 0x0101..01`` drops bits
    g, g+8, .., g+56 into the eight BYTE LANES of one uint64, so ONE
    ``add.reduceat`` accumulates eight bit-counts simultaneously — 8
    shift/mask/reduceat passes over the token array instead of round 3's
    64 (each of which also paid an int64 cast), ~8x less memory traffic.
    Byte lanes carry without interference only while a segment's token
    count <= 255, so doc runs longer than 255 tokens are split into
    <=255-token segments and the unpacked per-segment counts (tiny,
    segment-sized) are re-aggregated per doc. Byte-identical to the
    per-bit path (asserted in tests/test_textstats.py)."""
    n_docs = len(doc_offsets) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    if len(tok_hashes) == 0 or n_docs == 0:
        return out
    nonempty = doc_offsets[:-1] < doc_offsets[1:]
    starts = doc_offsets[:-1][nonempty]
    counts = (doc_offsets[1:] - doc_offsets[:-1])[nonempty]
    nd = len(starts)

    # split doc runs into <=255-token segments (lane-carry bound)
    n_seg = (counts + 254) // 255
    if int(n_seg.max()) == 1:
        seg_starts, doc_seg_offs = starts, None
    else:
        seg_doc = np.repeat(np.arange(nd, dtype=np.int64), n_seg)
        seg_starts = starts[seg_doc] + _ranges(n_seg) * 255
        doc_seg_offs = np.zeros(nd, np.int64)
        np.cumsum(n_seg[:-1], out=doc_seg_offs[1:])

    sig = np.zeros(nd, dtype=np.uint64)
    buf = np.empty_like(tok_hashes)
    for g in range(8):
        np.right_shift(tok_hashes, np.uint64(g), out=buf)
        np.bitwise_and(buf, _LANE, out=buf)
        ssum = np.add.reduceat(buf, seg_starts)     # 8 lane-counts packed
        for lane in range(8):
            cnt = (ssum >> np.uint64(8 * lane)) & np.uint64(0xFF)
            if doc_seg_offs is not None:
                cnt = np.add.reduceat(cnt.astype(np.int64), doc_seg_offs)
            sig |= ((2 * cnt.astype(np.int64) > counts).astype(np.uint64)
                    << np.uint64(g + 8 * lane))
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


def pairwise_jaccard(sets_a: list[np.ndarray],
                     sets_b: list[np.ndarray]) -> np.ndarray:
    """Jaccard similarity per (sets_a[i], sets_b[i]) pair, vectorized
    across the whole batch: ONE concatenate + ONE (pair_id, value)
    lexsort over every pair's elements instead of a per-pair
    ``np.intersect1d`` Python loop (the round-4 verdict's last
    per-pair hot spot). Each input array must be unique within itself
    (the ``shingle_hashes_from_tokens`` contract), so within one pair a
    value appears at most twice and the intersection size is the count
    of adjacent equal values after the sort. A pair whose union is
    empty scores 1.0, matching the scalar path (empty docs normally
    carry the 1-element sentinel set upstream, so this only triggers on
    genuinely 0-element inputs)."""
    n = len(sets_a)
    if n == 0:
        return np.empty(0, np.float64)
    la = np.fromiter((a.size for a in sets_a), np.int64, n)
    lb = np.fromiter((b.size for b in sets_b), np.int64, n)
    ids = np.arange(n, dtype=np.int64)
    flat = np.concatenate(list(sets_a) + list(sets_b))
    pid = np.concatenate([np.repeat(ids, la), np.repeat(ids, lb)])
    order = np.lexsort((flat, pid))
    fv, pv = flat[order], pid[order]
    dup = (fv[1:] == fv[:-1]) & (pv[1:] == pv[:-1])
    inter = np.bincount(pv[1:][dup], minlength=n)
    union = la + lb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


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


def shingle_flat(tok_hashes: np.ndarray, doc_offsets: np.ndarray,
                 k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat batch shingle array + per-doc segment offsets (len n_docs+1,
    every segment non-empty). Same shingle values as
    ``shingle_hashes_from_tokens`` — long docs keep their k-gram wrap-
    sums (NOT uniqued: duplicates don't change a min), short docs
    collapse to the same single rolling hash, empty docs to the
    sentinel — but built with zero per-doc Python work."""
    n_docs = len(doc_offsets) - 1
    counts = (doc_offsets[1:] - doc_offsets[:-1]).astype(np.int64)
    n_tok = len(tok_hashes)
    with np.errstate(over="ignore"):
        if n_tok >= k:
            sh = np.zeros(n_tok - k + 1, dtype=np.uint64)
            for j in range(k):
                c = _SHINGLE_C[j % len(_SHINGLE_C)]
                sh += c * tok_hashes[j: n_tok - k + 1 + j]
        else:
            sh = np.empty(0, np.uint64)

        long = counts >= k
        out_lens = np.where(long, counts - k + 1, 1).astype(np.int64)
        seg_offs = np.zeros(n_docs + 1, np.int64)
        np.cumsum(out_lens, out=seg_offs[1:])
        out = np.empty(int(seg_offs[-1]), np.uint64)

        if long.any():
            lens = out_lens[long]
            out[np.repeat(seg_offs[:-1][long], lens) + _ranges(lens)] = \
                sh[np.repeat(doc_offsets[:-1][long], lens) + _ranges(lens)]
        short = (~long) & (counts > 0)
        if short.any():
            s_starts = doc_offsets[:-1][short]
            s_counts = counts[short]
            h = np.zeros(int(short.sum()), np.uint64)
            for j in range(int(s_counts.max())):
                m = s_counts > j
                h[m] = h[m] * _P + tok_hashes[s_starts[m] + j]
            out[seg_offs[:-1][short]] = h
        empty = counts == 0
        if empty.any():
            out[seg_offs[:-1][empty]] = _EMPTY_DOC
    return out, seg_offs


def minhash_batch(tok_hashes: np.ndarray, doc_offsets: np.ndarray,
                  a: np.ndarray, b: np.ndarray, k: int = 3,
                  chunk: int = 1 << 15) -> np.ndarray:
    """Per-doc MinHash signatures for a whole batch as an
    (n_docs, num_perm) uint64 MATRIX (shared by the crawl scoring stage
    and the standalone minhash operator).

    Round 4 (the crawl scoring bandwidth diet): instead of one
    (num_perm x n_shingles) kernel launch PER DOC, the whole batch's
    shingles go through a flat, cache-blocked (num_perm x chunk) modmul
    with ``np.minimum.reduceat`` over the doc segments — tens of kernel
    launches per batch instead of tens of thousands, with the working
    block sized to stay cache-resident. The Mersenne-61 reduction is a
    fold (``(x & M) + (x >> 61)``, one conditional subtract — exact for
    any uint64 because 2^64 mod (2^61-1) folds in one step) instead of a
    hardware udiv per element. Byte-identical to the per-doc path
    (asserted in tests)."""
    flat_sh, seg_offs = shingle_flat(tok_hashes, doc_offsets, k)
    n_docs = len(doc_offsets) - 1
    num_perm = len(a)
    total = len(flat_sh)
    out = np.full((num_perm, n_docs), _MERSENNE61, np.uint64)
    if total == 0 or n_docs == 0:
        return out.T.copy()
    ac, bc = a[:, None], b[:, None]
    buf = np.empty((num_perm, min(chunk, total)), np.uint64)
    buf2 = np.empty_like(buf)
    pos = 0
    with np.errstate(over="ignore"):
        while pos < total:
            end = min(pos + chunk, total)
            w = end - pos
            v, v2 = buf[:, :w], buf2[:, :w]
            np.multiply(ac, flat_sh[None, pos:end], out=v)
            np.add(v, bc, out=v)
            # exact x mod (2^61-1) via fold: 2^61 ≡ 1 (mod M)
            np.right_shift(v, np.uint64(61), out=v2)
            np.bitwise_and(v, _MERSENNE61, out=v)
            np.add(v, v2, out=v)
            np.subtract(v, _MERSENNE61, out=v, where=v >= _MERSENNE61)
            # doc segments intersecting [pos, end): reduceat inside the
            # chunk, then fold into the running per-doc min (a doc that
            # straddles a chunk boundary min-merges across iterations)
            d0 = int(np.searchsorted(seg_offs, pos, side="right")) - 1
            d1 = int(np.searchsorted(seg_offs, end, side="left"))
            cuts = seg_offs[d0:d1].copy()
            cuts[0] = pos
            mins = np.minimum.reduceat(v, cuts - pos, axis=1)
            np.minimum(out[:, d0:d1], mins, out=out[:, d0:d1])
            pos = end
    return np.ascontiguousarray(out.T)


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
