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


# ---------------------------------------------------------------------------
# TF-IDF top terms (corpus-level statistic -> per-doc ranking)
# ---------------------------------------------------------------------------

def tfidf_top_terms(ds: rd.Dataset, id_col: str, text_col: str,
                    n_docs: int, k: int = 3,
                    round_to: int = 6) -> rd.Dataset:
    """Top-``k`` TF-IDF terms per document. tfidf = tf * ln(N / df),
    no smoothing (expressible verbatim in SQL for the oracle).

    Shape — two shuffles, ZERO joins:
      1. per-batch explode to (doc, term, tf) via one Arrow
         split_pattern_regex + a pandas (doc, term) size-groupby
         (the per-batch combiner: duplicate terms collapse before any
         shuffle);
      2. groupby(term) co-locates each term's postings; df = group row
         count, so idf attaches WITHOUT a doc-frequency join;
      3. groupby(doc) ranks terms and keeps k.
    ``n_docs`` is passed in (a metadata-only count at the caller — a
    parquet footer read, not a scan). Skew note: ubiquitous terms
    (stopwords) make hot groups in step 2; at corpus scale, cap df
    tracking by dropping terms whose in-batch df already exceeds a
    threshold (they rank last anyway — idf -> 0), which bounds the hot
    groups before the shuffle.

    Ordering contract (oracle-stable): rank by ROUNDED tfidf desc, then
    term asc — ranking on the rounded value keeps Ray and SQL in the
    same order even when two raw doubles differ below round_to digits.
    """
    lg_n = float(n_docs)

    def explode_tf(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_lower(t.column(text_col)), r"[^a-z0-9]+")
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        lens = pc.list_value_length(toks).to_numpy()
        ids = np.repeat(t.column(id_col).to_numpy(zero_copy_only=False),
                        lens)
        df = pd.DataFrame({id_col: ids, "term": flat})
        df = df[df["term"] != ""]
        g = df.groupby([id_col, "term"], as_index=False, sort=False) \
              .size().rename(columns={"size": "tf"})
        return pa.Table.from_pandas(g, preserve_index=False)

    # coarse buckets, not raw term/doc groups: map_groups pays per-GROUP
    # Python overhead, so at vocab/corpus cardinality we group by a
    # 64-way hash bucket and do the per-key work vectorized inside
    # (pandas transform) — the same 10-30x trick as stages/dedup.py
    def bucket_by(col: str, nb: int = 64):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                __tb=(pd.util.hash_array(df[col].to_numpy()) % nb)
                .astype(np.int32))
        return f

    def idf_bucket(df: pd.DataFrame) -> pd.DataFrame:
        dfreq = df.groupby("term", sort=False)[id_col].transform("size") \
            .to_numpy(dtype=np.float64)
        x = df["tf"].to_numpy(dtype=np.float64) * np.log(lg_n / dfreq)
        tfidf = (np.floor(np.abs(x) * 10**round_to + 0.5)
                 / 10**round_to) * np.sign(x)
        return pd.DataFrame({id_col: df[id_col], "term": df["term"],
                             "tfidf": tfidf})

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        df = df.groupby(id_col, sort=False).head(k).reset_index(drop=True)
        df["rn"] = df.groupby(id_col, sort=False).cumcount() + 1
        return df.drop(columns="__tb")

    return (
        ds.map_batches(explode_tf, batch_format="pyarrow")
        .map_batches(bucket_by("term"), batch_format="pandas")
        .groupby("__tb")
        .map_groups(idf_bucket, batch_format="pandas")
        .map_batches(bucket_by(id_col), batch_format="pandas")
        .groupby("__tb")
        .map_groups(topk_bucket, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
