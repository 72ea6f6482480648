"""Pure per-text scoring kernels shared by the crawl extract stage and
the standalone text-analysis operators: token counts, quality ratios,
SimHash fingerprint, MinHash signature, letter-frequency language
heuristic.

Kept Ray-free (like urlnorm/extract) so the oracle and unit tests can
call them directly; the batch wrappers in stages/text.py and the crawl's
extract+score stage (pipelines/frontier.py) both delegate here.

Round-2: the per-token Python md5 loops (the #2/#4 suite costs at
sf0.1) are replaced by the vectorized batch kernels in
functions/hashing.py — one Arrow split + one hash_array call + reduceat
aggregations per batch.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import hashing as H

STOPWORDS = frozenset(("the", "and", "of", "a", "to", "in", "data"))

_BPE_RE = re.compile(
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

_LANG_PROFILES = {
    "en": "etaoinshrdlu",
    "de": "enisratdhulg",
    "fr": "esaitnrulodc",
    "es": "eaosrnidltcm",
}
_PROFILES = {lang: {c: i for i, c in enumerate(p)}
             for lang, p in _LANG_PROFILES.items()}

_MH_A, _MH_B = H.minhash_params(32)
_STOP_ARR = pa.array(sorted(STOPWORDS), pa.string())


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over a token list (majority-bit votes of per-token
    hashes). Thin per-doc wrapper over the batch kernel — single source
    of truth with the crawl scoring stage."""
    if not tokens:
        return 0
    hs = H.hash_tokens(pa.array(tokens, pa.string()))
    offs = np.array([0, len(hs)], dtype=np.int64)
    return int(H.simhash_from_tokens(hs, offs)[0])


def minhash_sig(tokens: list[str], k: int = 3) -> np.ndarray:
    """32-perm MinHash over word k-shingles (near-dup signature stored
    per crawled page so downstream dedup needs no second text pass)."""
    if tokens:
        hs = H.hash_tokens(pa.array(tokens, pa.string()))
    else:
        hs = np.empty(0, np.uint64)
    offs = np.array([0, len(hs)], dtype=np.int64)
    sh = H.shingle_hashes_from_tokens(hs, offs, k)[0]
    return H.minhash_from_shingles(sh, _MH_A, _MH_B)


def langid(text: str) -> str:
    """Deterministic letter-frequency language heuristic (public
    letter-frequency approach, no trained model)."""
    counts: dict[str, int] = {}
    for ch in text.lower():
        if "a" <= ch <= "z":
            counts[ch] = counts.get(ch, 0) + 1
    if not counts:
        return "und"
    top = [c for c, _ in sorted(counts.items(),
                                key=lambda kv: (-kv[1], kv[0]))[:12]]
    best_lang, best = "und", -1.0
    for lang, prof in _PROFILES.items():
        score = sum(12 - abs(i - prof[c]) for i, c in enumerate(top)
                    if c in prof)
        if score > best:
            best, best_lang = score, lang
    return best_lang


def langid_batch(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized ``langid`` over a string column: one arrow lowercase
    kernel + ONE numpy bincount over the batch's UTF-8 bytes for the
    per-doc letter histograms (the per-character Python loop was 40% of
    the scoring stage); only the tiny top-12-vs-profile ranking stays
    per doc. Byte-identical results to ``langid`` (multi-byte UTF-8
    bytes are >= 0x80 and fall outside a-z, same as the scalar path;
    asserted in tests)."""
    lower = pc.utf8_lower(col)
    if isinstance(lower, pa.ChunkedArray):
        lower = lower.combine_chunks()
    n = len(lower)
    out = np.empty(n, object)
    if n == 0:
        return out
    bufs = lower.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[
        lower.offset: lower.offset + n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)[offs[0]: offs[-1]]
    offs = offs - offs[0]
    byte_lens = offs[1:] - offs[:-1]
    doc_ids = np.repeat(np.arange(n, dtype=np.int32), byte_lens)
    code = data.astype(np.int32)               # int32: the id build is
    valid = (code >= 97) & (code <= 122)       # bandwidth-bound (round 4)
    ids = doc_ids * 27 + np.where(valid, code - 96, 0)
    counts = np.bincount(ids, minlength=n * 27).reshape(n, 27)[:, 1:]

    # vectorized ranking (round 4 — the per-doc Python loop was 40% of
    # the whole scoring bundle): stable argsort on -counts sorts by
    # count desc then letter asc (letters start in ascending order), so
    # ranks[:, :12] IS the scalar path's top-12; zero-count slots are
    # masked. Per-language scores are one (n, 12) gather + sum; argmax
    # over the language axis keeps the scalar first-wins tie rule
    # because languages stack in _PROFILES order.
    ranks = np.argsort(-counts, axis=1, kind="stable")[:, :12]  # (n, 12)
    top_counts = np.take_along_axis(counts, ranks, axis=1)
    present = top_counts > 0                                     # (n, 12)
    pos = np.arange(12, dtype=np.int64)[None, :]
    langs = list(_PROFILES)
    prof_pos = np.full((len(langs), 26), -1, np.int64)
    for li, lang in enumerate(langs):
        for ch, p in _PROFILES[lang].items():
            prof_pos[li, ord(ch) - 97] = p
    scores = np.empty((len(langs), n), np.int64)
    for li in range(len(langs)):
        pp = prof_pos[li][ranks]                                 # (n, 12)
        contrib = (12 - np.abs(pos - pp)) * ((pp >= 0) & present)
        scores[li] = contrib.sum(axis=1)
    best = np.argmax(scores, axis=0)            # first max wins, as scalar
    lang_arr = np.array(langs, object)
    out[:] = lang_arr[best]
    out[~present[:, 0]] = "und"                 # no letters at all
    return out


def score_texts(texts: list[str]) -> dict[str, np.ndarray]:
    """Full per-page scoring bundle (the crawl's enrichment stage):
    n_tokens, n_bpe_tokens, stopword_ratio, mean_word_len, simhash,
    minhash signature (an (n, num_perm) uint64 matrix), lang_pred. One
    tokenize + hash pass per batch; minhash is the flat cache-blocked
    kernel and simhash the lane-packed 8-pass kernel (round-4 bandwidth
    diet — this bundle is what saturates a socket at high cpu counts);
    only the BPE regex remains per-doc (inherent lookahead)."""
    n = len(texts)
    col = pa.array(texts, pa.string())
    tok_hashes, offs, toks = H.tokenize_batch(col, return_tokens=True)
    counts = (offs[1:] - offs[:-1]).astype(np.int64)

    # stopword ratio + mean word length: flat-token Arrow kernels +
    # one reduceat each over the doc runs
    stop_ratio = np.zeros(n, np.float64)
    mean_wlen = np.zeros(n, np.float64)
    nonempty = counts > 0
    if len(tok_hashes):
        is_stop = pc.is_in(toks, value_set=_STOP_ARR).to_numpy(
            zero_copy_only=False).astype(np.int64)
        tlens = pc.utf8_length(toks).to_numpy().astype(np.int64)
        starts = offs[:-1][nonempty]
        stop_ratio[nonempty] = np.round(
            np.add.reduceat(is_stop, starts) / counts[nonempty], 6)
        mean_wlen[nonempty] = np.round(
            np.add.reduceat(tlens, starts) / counts[nonempty], 6)

    sims = H.simhash_from_tokens(tok_hashes, offs)
    # (n, num_perm) uint64 matrix — stays flat end-to-end; the Arrow
    # list column is built from the flat buffer (frontier.extract_batch)
    minhashes = H.minhash_batch(tok_hashes, offs, _MH_A, _MH_B)

    n_bpe = np.fromiter((len(_BPE_RE.findall(s)) for s in texts),
                        dtype=np.int64, count=n)
    langs = langid_batch(col)

    return {
        "n_tokens": counts,
        "n_bpe_tokens": n_bpe,
        "stopword_ratio": stop_ratio,
        "mean_word_len": mean_wlen,
        "simhash": sims,
        "minhash": minhashes,
        "lang_pred": langs,
    }
