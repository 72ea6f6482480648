"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language-ID heuristic, fingerprinting. All vectorized or
tight-loop per batch; the stateful variants (compiled patterns, stopword
sets, n-gram profiles) live in a callable class run as an actor pool.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

STOPWORDS = ("the", "and", "of", "a", "to", "in", "data")

# Tiny deterministic char-frequency profiles for the language-ID heuristic
# (public-knowledge letter-frequency approach; NOT a trained model).
_LANG_PROFILES = {
    "en": "etaoinshrdlu",
    "de": "enisratdhulg",
    "fr": "esaitnrulodc",
    "es": "eaosrnidltcm",
}


def token_count(ds: rd.Dataset, text_col: str, out: str = "n_tokens") -> rd.Dataset:
    """Whitespace token count, pure Arrow kernels (split + list_value_length)."""

    def f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(t.column(text_col)), r"\s+")
        return t.append_column(out, pc.cast(pc.list_value_length(parts),
                                            pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


def bpe_ish_token_count(ds: rd.Dataset, text_col: str,
                        out: str = "n_bpe_tokens") -> rd.Dataset:
    """BPE-ish token estimate: GPT-2-style pre-tokenizer regex (public
    pattern family: contractions, letter runs, digit runs, punct runs)."""
    pat = re.compile(r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+")

    def f(t: pa.Table) -> pa.Table:
        counts = [len(pat.findall(s)) for s in t.column(text_col).to_pylist()]
        return t.append_column(out, pa.array(counts, pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow")


class QualityScorer:
    """Actor-pool stage: per-doc quality signals (length, stopword ratio,
    mean word length, alpha ratio). Stopword set + patterns built once per
    actor (__init__), applied per batch (__call__) — the ST-1 pattern."""

    def __init__(self, stopwords: tuple[str, ...] = STOPWORDS):
        self.stop = frozenset(stopwords)
        self.word_re = re.compile(r"\S+")

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"]
        toks = texts.map(self.word_re.findall)
        n_tok = toks.map(len)
        df = df.copy()
        df["n_chars_actual"] = texts.str.len().astype("int64")
        df["n_tokens"] = n_tok.astype("int64")
        df["stopword_ratio"] = np.round(
            [sum(w in self.stop for w in ws) / max(1, n)
             for ws, n in zip(toks, n_tok)], 6)
        df["mean_word_len"] = np.round(
            [float(np.mean([len(w) for w in ws])) if ws else 0.0
             for ws in toks], 6)
        return df


def quality_score(ds: rd.Dataset, concurrency: int = 4,
                  batch_size: int = 2048) -> rd.Dataset:
    """num_cpus=0.5 per actor so the pool never reserves every core — a
    pool that takes the whole node starves the read stage and the
    pipeline deadlocks (observed on a 4-CPU test cluster)."""
    return ds.map_batches(QualityScorer, batch_format="pandas",
                          concurrency=concurrency, batch_size=batch_size,
                          num_cpus=0.5) \
             .map_batches(lambda t: t, batch_format="pyarrow")


class LangId:
    """Heuristic letter-frequency language scorer (actor pool).
    Deterministic, no external model: ranks languages by rank-correlation
    of the doc's most frequent letters with tiny per-language profiles.
    Delegates to the shared vectorized kernel
    (functions/textstats.py::langid_batch) — one bincount over the
    batch's UTF-8 bytes instead of a per-character Python loop."""

    def __init__(self):
        from ..functions.textstats import langid_batch
        self._batch = langid_batch

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["lang_pred"] = self._batch(
            pa.array(df["text"].tolist(), pa.string()))
        return df


def fingerprint(ds: rd.Dataset, text_col: str, out: str = "fingerprint",
                hex_len: int = 8) -> rd.Dataset:
    """Document fingerprint: truncated md5 hex (stable content id).
    A rolling/Karp-Rabin variant is ``rolling_fingerprint``."""

    def f(t: pa.Table) -> pa.Table:
        fps = [hashlib.md5(s.encode()).hexdigest()[:hex_len]
               for s in t.column(text_col).to_pylist()]
        return t.append_column(out, pa.array(fps, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def rolling_fingerprint(ds: rd.Dataset, text_col: str,
                        out: str = "rhash", window: int = 16,
                        base: int = 257, mod: int = (1 << 61) - 1) -> rd.Dataset:
    """Karp-Rabin rolling hash: min rolling-window hash over the doc
    (winnowing-style representative fingerprint)."""

    def f(t: pa.Table) -> pa.Table:
        outv = []
        for s in t.column(text_col).to_pylist():
            b = s.encode("utf-8")
            if len(b) < window:
                h = 0
                for ch in b:
                    h = (h * base + ch) % mod
                outv.append(h)
                continue
            h = 0
            pw = pow(base, window - 1, mod)
            best = None
            for i, ch in enumerate(b):
                if i >= window:
                    h = (h - b[i - window] * pw) % mod
                h = (h * base + ch) % mod
                if i >= window - 1:
                    best = h if best is None else min(best, h)
            outv.append(best)
        return t.append_column(out, pa.array(outv, pa.uint64()))

    return ds.map_batches(f, batch_format="pyarrow")
