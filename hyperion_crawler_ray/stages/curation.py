"""Training-data curation operators (round 3): PII redaction,
Gopher-style repetition/quality rules, benchmark decontamination.

These are the filter/scrub passes a 100-TB pretraining pipeline runs
between crawl and packing. All three follow the repo's stage shapes:
pure-Arrow kernels where the op vectorizes (redaction), an actor-pool
callable class holding compiled state where it doesn't (repetition
rules), and a broadcast-set membership probe for the decontamination
sweep (`ray.put` the benchmark's n-gram hashes once, probe per batch —
never a shuffle join against the benchmark).

Public-knowledge basis: the repetition/quality thresholds re-derive the
published Gopher data-cleaning rules (Rae et al. 2021, "Scaling Language
Models", Appendix A1.1); decontamination-by-13-gram-overlap is the
published GPT-3/PaLM practice (Brown et al. 2020 §C). No reference-repo
analog exists — these extend SURVEY §2 the way the dedup/ANN families do.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions import hashing as H

# RE2-compatible (works in both pyarrow and DuckDB regexp_replace — the
# SQL oracle runs the very same patterns)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}[ .\-]?\(?[0-9]{2,4}\)?[ .\-]?[0-9]{3,4}[ .\-]?[0-9]{3,4}"


def redact_pii(ds: rd.Dataset, text_col: str,
               out: str = "text_redacted") -> rd.Dataset:
    """Replace email addresses and phone-number-shaped spans with
    constant tags, and count the replacements per doc. Pure
    ``pyarrow.compute`` regex kernels — zero Python in the row path;
    SQL-expressible verbatim via DuckDB ``regexp_replace(..., 'g')``."""

    def f(t: pa.Table) -> pa.Table:
        txt = t.column(text_col)
        n_email = pc.count_substring_regex(txt, EMAIL_RE)
        red = pc.replace_substring_regex(txt, EMAIL_RE, "<EMAIL>")
        n_phone = pc.count_substring_regex(red, PHONE_RE)
        red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
        return (t.append_column(out, red)
                .append_column("n_emails", pc.cast(n_email, pa.int64()))
                .append_column("n_phones", pc.cast(n_phone, pa.int64())))

    return ds.map_batches(f, batch_format="pyarrow")


class GopherRules:
    """Actor-pool stage computing the Gopher repetition/quality signals
    per document (compiled patterns once per actor):

    - ``dup_line_frac``      fraction of lines that repeat a previous line
    - ``dup_line_char_frac`` fraction of characters inside repeated lines
    - ``top2gram_frac``      chars covered by the most frequent word 2-gram
    - ``symbol_word_ratio``  '#'/'...' symbols per word
    - ``bullet_line_frac``   lines starting with a bullet
    - ``ellipsis_line_frac`` lines ending with an ellipsis
    - ``gopher_pass``        the published keep/drop verdict over these

    Thresholds follow Rae et al. 2021 A1.1 (dup lines <= 0.30,
    top-2-gram <= 0.20, symbol ratio <= 0.10, bullets <= 0.90,
    ellipsis <= 0.30)."""

    def __init__(self):
        self.word_re = re.compile(r"\S+")
        self.bullet_re = re.compile(r"^\s*(?:[-*•]|\d+[.)])\s")
        self.symbol_re = re.compile(r"#|\.\.\.|…")

    def _doc(self, text: str) -> tuple:
        lines = [ln for ln in text.split("\n") if ln.strip()]
        n_lines = len(lines)
        seen: set[str] = set()
        dup_lines = dup_chars = bullet = ellipsis = 0
        total_chars = 0
        for ln in lines:
            total_chars += len(ln)
            if ln in seen:
                dup_lines += 1
                dup_chars += len(ln)
            else:
                seen.add(ln)
            if self.bullet_re.match(ln):
                bullet += 1
            if ln.rstrip().endswith(("...", "…")):
                ellipsis += 1
        words = self.word_re.findall(text)
        n_words = len(words)
        top2 = 0
        if n_words >= 2:
            counts: dict[tuple, int] = {}
            best = 0
            best_len = 0
            for i in range(n_words - 1):
                g = (words[i], words[i + 1])
                c = counts.get(g, 0) + 1
                counts[g] = c
                if c > best:
                    best, best_len = c, len(g[0]) + len(g[1]) + 1
            top2 = best * best_len
        chars = max(1, len(text))
        nl = max(1, n_lines)
        return (
            dup_lines / nl,
            dup_chars / max(1, total_chars),
            min(1.0, top2 / chars),
            len(self.symbol_re.findall(text)) / max(1, n_words),
            bullet / nl,
            ellipsis / nl,
        )

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        vals = np.array([self._doc(s) for s in df["text"]],
                        dtype=np.float64).reshape(len(df), 6)
        out = df.copy()
        for i, name in enumerate(["dup_line_frac", "dup_line_char_frac",
                                  "top2gram_frac", "symbol_word_ratio",
                                  "bullet_line_frac",
                                  "ellipsis_line_frac"]):
            out[name] = np.round(vals[:, i], 6)
        out["gopher_pass"] = (
            (vals[:, 0] <= 0.30) & (vals[:, 2] <= 0.20)
            & (vals[:, 3] <= 0.10) & (vals[:, 4] <= 0.90)
            & (vals[:, 5] <= 0.30))
        return out

    @staticmethod
    def stage(ds: rd.Dataset, concurrency: int = 4) -> rd.Dataset:
        return ds.map_batches(GopherRules, batch_format="pandas",
                              concurrency=concurrency, num_cpus=0.5) \
            .map_batches(lambda t: t, batch_format="pyarrow")


def benchmark_ngram_hashes(texts: list[str], n: int = 13) -> np.ndarray:
    """Hash every word n-gram of the benchmark texts (driver-side — the
    benchmark side is small by definition). Returns sorted uint64."""
    hs: list[np.ndarray] = []
    for t in texts:
        tok_hashes, offs = H.tokenize_batch(pa.array([t], pa.string()))
        sh = H.shingle_hashes_from_tokens(tok_hashes, offs, n)
        if sh and len(sh[0]):
            hs.append(sh[0])
    if not hs:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(hs))


def decontaminate(ds: rd.Dataset, text_col: str, id_col: str,
                  bench_hashes: np.ndarray, n: int = 13,
                  max_overlap: int = 0, append: bool = False) -> rd.Dataset:
    """Flag training docs that share any word ``n``-gram with a held-out
    benchmark (GPT-3-style 13-gram decontamination). The benchmark's
    hash set is broadcast ONCE via ``ray.put``; each batch computes its
    docs' n-gram hashes with the same vectorized tokenizer the MinHash
    path uses and probes membership with a sorted ``np.isin`` — no
    shuffle, no join, corpus streams through untouched. Emits
    (id, n_overlap, contaminated) — or, with ``append=True``, the input
    table with the two columns appended; filter on ``~contaminated`` to
    scrub."""
    ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=np.uint64)))

    def probe(t: pa.Table) -> pa.Table:
        bench = ray.get(ref)
        tok_hashes, offs = H.tokenize_batch(t.column(text_col))
        shingles = H.shingle_hashes_from_tokens(tok_hashes, offs, n)
        n_over = np.array(
            [int(np.isin(s, bench, assume_unique=False).sum())
             if len(s) else 0 for s in shingles], dtype=np.int64)
        n_arr = pa.array(n_over, pa.int64())
        c_arr = pa.array(n_over > max_overlap, pa.bool_())
        if append:
            return t.append_column("n_overlap", n_arr) \
                    .append_column("contaminated", c_arr)
        return pa.table({id_col: t.column(id_col), "n_overlap": n_arr,
                         "contaminated": c_arr})

    return ds.map_batches(probe, batch_format="pyarrow")
