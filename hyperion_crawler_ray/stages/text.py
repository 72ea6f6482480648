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
    mean word length). Stopword set built once per actor (__init__),
    applied per batch (__call__) — the ST-1 pattern.

    Round 4: the per-row ``\\S+`` findall + Python list comprehensions
    are replaced by the shared flat-token kernels (one Arrow tokenize,
    one ``is_in``/``utf8_length`` pass, reduceat per doc) — identical
    values: ``\\S+`` tokens == ``str.split()`` == the Arrow whitespace
    split, integer sums divide exactly as the scalar loops did, and
    rounding stays ``np.round`` (banker's), byte-for-byte what the
    DuckDB oracle reproduces."""

    def __init__(self, stopwords: tuple[str, ...] = STOPWORDS):
        self.stop_arr = pa.array(sorted(set(stopwords)), pa.string())

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.hashing import tokenize_batch

        col = pa.array(df["text"].astype(str).tolist(), pa.string())
        _, offs, kept = tokenize_batch(col, return_tokens=True)
        counts = (offs[1:] - offs[:-1]).astype(np.int64)
        n = len(col)
        stop_ratio = np.zeros(n, np.float64)
        mean_wlen = np.zeros(n, np.float64)
        nonempty = counts > 0
        if len(kept):
            is_stop = pc.is_in(kept, value_set=self.stop_arr) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            tlens = pc.utf8_length(kept).to_numpy().astype(np.int64)
            starts = offs[:-1][nonempty]
            stop_ratio[nonempty] = np.round(
                np.add.reduceat(is_stop, starts) / counts[nonempty], 6)
            mean_wlen[nonempty] = np.round(
                np.add.reduceat(tlens, starts) / counts[nonempty], 6)
        df = df.copy()
        df["n_chars_actual"] = pc.utf8_length(col).to_numpy() \
            .astype(np.int64)
        df["n_tokens"] = counts
        df["stopword_ratio"] = stop_ratio
        df["mean_word_len"] = mean_wlen
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


_M61 = np.uint64((1 << 61) - 1)


def _mulmod_m61_small(x, y):
    """(x * y) mod (2^61 - 1) for x < 2^61, y < 2^16, exact in uint64:
    split x into (hi, lo) halves so every partial product fits, then use
    2^61 ≡ 1 (mod M) to fold the high half back down."""
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    with np.errstate(over="ignore"):
        hi = (x >> np.uint64(45)) * y                 # < 2^16 * 2^16
        lo = (x & np.uint64((1 << 45) - 1)) * y       # < 2^45 * 2^16
        res = lo + ((hi >> np.uint64(16))
                    + ((hi & np.uint64((1 << 16) - 1)) << np.uint64(45)))
        res = (res & _M61) + (res >> np.uint64(61))
        res = np.where(res >= _M61, res - _M61, res)
    return res


def rolling_fingerprint(ds: rd.Dataset, text_col: str,
                        out: str = "rhash", window: int = 16,
                        base: int = 257, mod: int = (1 << 61) - 1) -> rd.Dataset:
    """Karp-Rabin rolling hash: min rolling-window hash over the doc
    (winnowing-style representative fingerprint).

    Round 4: vectorized ACROSS docs — docs sorted by length descending
    so the per-position active set is a prefix slice, then one loop over
    byte POSITIONS updating all active docs' states with exact
    Mersenne-61 modular arithmetic (``_mulmod_m61_small``). Replaces the
    per-character Python loop (the dominant cost of the text_scores
    bundle at sf0.1); byte-identical values (asserted vs the scalar
    reference in tests/test_stages.py)."""
    assert mod == (1 << 61) - 1 and base < (1 << 16)
    pw = np.uint64(pow(base, window - 1, mod))
    base_u = np.uint64(base)

    def f(t: pa.Table) -> pa.Table:
        col = t.column(text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return t.append_column(out, pa.array([], pa.uint64()))
        bufs = col.buffers()
        off_dt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        offs = np.frombuffer(bufs[1], dtype=off_dt)[
            col.offset: col.offset + n + 1].astype(np.int64)
        data = np.frombuffer(bufs[2], dtype=np.uint8)
        starts, lens = offs[:-1], offs[1:] - offs[:-1]

        order = np.argsort(-lens, kind="stable")   # longest first
        s_sorted = starts[order]
        l_sorted = lens[order]
        h = np.zeros(n, np.uint64)
        best = np.full(n, _M61, np.uint64)         # +inf sentinel (< M max)
        maxlen = int(l_sorted[0]) if n else 0
        with np.errstate(over="ignore"):
            for i in range(maxlen):
                k = int(np.searchsorted(-l_sorted, -(i + 1), side="right"))
                if k == 0:
                    break
                hv = h[:k]
                ch = data[s_sorted[:k] + i]
                if i >= window:
                    out_b = data[s_sorted[:k] + (i - window)]
                    sub = _mulmod_m61_small(pw, out_b)
                    hv = hv + (_M61 - sub)         # < 2M, fold below
                    hv = np.where(hv >= _M61, hv - _M61, hv)
                hv = _mulmod_m61_small(hv, base_u) + ch
                hv = np.where(hv >= _M61, hv - _M61, hv)
                h[:k] = hv
                if i >= window - 1:
                    np.minimum(best[:k], hv, out=best[:k])
        res_sorted = np.where(l_sorted < window, h, best)
        res = np.empty(n, np.uint64)
        res[order] = res_sorted
        return t.append_column(out, pa.array(res, pa.uint64()))

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
        return pa.Table.from_pandas(g, preserve_index=False) \
            .replace_schema_metadata(None)

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
        if "term" not in df.columns:     # whole-dataset-empty partition
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "term": np.array([], object),
                                 "tfidf": np.array([], np.float64)})
        dfreq = df.groupby("term", sort=False)[id_col].transform("size") \
            .to_numpy(dtype=np.float64)
        x = df["tf"].to_numpy(dtype=np.float64) * np.log(lg_n / dfreq)
        tfidf = (np.floor(np.abs(x) * 10**round_to + 0.5)
                 / 10**round_to) * np.sign(x)
        return pd.DataFrame({id_col: df[id_col], "term": df["term"],
                             "tfidf": tfidf})

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if "term" not in df.columns:     # whole-dataset-empty partition
            return pd.DataFrame({id_col: np.array([], np.int64),
                                 "term": np.array([], object),
                                 "tfidf": np.array([], np.float64),
                                 "rn": np.array([], np.int64)})
        df = df.sort_values([id_col, "tfidf", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        df = df.groupby(id_col, sort=False).head(k).reset_index(drop=True)
        df["rn"] = df.groupby(id_col, sort=False).cumcount() + 1
        return df.drop(columns="__tb")

    # LAZY co-locations (round-4 measured trade — see exchange.co_locate)
    from .exchange import _pd_partition, co_locate

    tf = ds.map_batches(explode_tf, batch_format="pyarrow") \
        .map_batches(bucket_by("term"), batch_format="pandas")
    scored = co_locate(tf, "__tb", 64, _pd_partition(idf_bucket))
    rebucketed = scored.map_batches(bucket_by(id_col),
                                    batch_format="pandas")
    return co_locate(rebucketed, "__tb", 64, _pd_partition(topk_bucket))
