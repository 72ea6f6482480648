"""Pure per-text scoring kernels shared by the crawl extract stage and
the standalone text-analysis operators: token counts, quality ratios,
SimHash fingerprint, letter-frequency language heuristic.

Kept Ray-free (like urlnorm/extract) so the oracle and unit tests can
call them directly; the batch wrappers in stages/text.py and the crawl's
extract+score stage (pipelines/frontier.py) both delegate here.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

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

_SHIFTS = np.arange(64, dtype=np.uint64)
_ONE = np.uint64(1)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over tokens (md5 token hashes, +/-1 bit votes)."""
    votes = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = np.uint64(int.from_bytes(hashlib.md5(tok.encode()).digest()[:8],
                                     "little"))
        bits = (h >> _SHIFTS) & _ONE
        votes += np.where(bits == 1, 1, -1)
    sig = 0
    for bi in range(64):
        if votes[bi] > 0:
            sig |= 1 << bi
    return sig


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


_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_params(num_perm: int = 32, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


_MH_A, _MH_B = _minhash_params()


def minhash_sig(tokens: list[str], k: int = 3) -> np.ndarray:
    """32-perm MinHash over word k-shingles (near-dup signature stored
    per crawled page so downstream dedup needs no second text pass)."""
    if len(tokens) < k:
        grams = [" ".join(tokens)] if tokens else [""]
    else:
        grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    h = np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
         for g in grams), dtype=np.uint64, count=len(grams))
    vals = (_MH_A[:, None] * h[None, :] + _MH_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def score_texts(texts: list[str]) -> dict[str, np.ndarray]:
    """Full per-page scoring bundle (the crawl's enrichment stage):
    n_tokens, n_bpe_tokens, stopword_ratio, mean_word_len, simhash,
    minhash signature, lang_pred."""
    n = len(texts)
    n_tokens = np.empty(n, np.int64)
    n_bpe = np.empty(n, np.int64)
    stop_ratio = np.empty(n, np.float64)
    mean_wlen = np.empty(n, np.float64)
    sims = np.empty(n, np.uint64)
    minhashes = np.empty(n, object)
    langs = np.empty(n, object)
    for i, s in enumerate(texts):
        toks = s.split()
        nt = len(toks)
        n_tokens[i] = nt
        n_bpe[i] = len(_BPE_RE.findall(s))
        if nt:
            stop_ratio[i] = round(sum(t in STOPWORDS for t in toks) / nt, 6)
            mean_wlen[i] = round(sum(len(t) for t in toks) / nt, 6)
        else:
            stop_ratio[i] = 0.0
            mean_wlen[i] = 0.0
        sims[i] = np.uint64(simhash64(toks))
        minhashes[i] = minhash_sig(toks).tolist()
        langs[i] = langid(s)
    return {
        "n_tokens": n_tokens,
        "n_bpe_tokens": n_bpe,
        "stopword_ratio": stop_ratio,
        "mean_word_len": mean_wlen,
        "simhash": sims,
        "minhash": minhashes,
        "lang_pred": langs,
    }
