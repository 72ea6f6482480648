"""Cross-document repeated n-gram detection — the exact-substring
duplication signal for corpus curation (distinct from the WITHIN-doc
repetition the Gopher rules in ``stages/curation.py`` measure).

For every document: how many of its distinct n-gram hashes also occur in
at least ``min_docs - 1`` OTHER documents, and what fraction of the doc
that is. High ``dup_ngram_frac`` marks boilerplate/templated text that
near-dup pair producers miss when no single pair clears their threshold
(the motivation of exact-substring dedup in Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499 — this is the hashed n-gram approximation of their
suffix-array method, the standard trade at corpus scale).

Shape (one explode all-to-all, zero joins):

    map_batches      explode per-doc UNIQUE n-gram hashes
                     (vectorized: one tokenize + k wrap-sum passes per
                     batch — functions/hashing.py kernels) into
                     (gram, doc, bucket=gram mod B) rows
    groupby(bucket)  the ONE full-size shuffle; within a bucket, one
      .map_groups    np.unique run marks grams appearing in >= min_docs
                     rows (rows are unique (gram, doc) pairs, so group
                     size == doc frequency), then two bincounts emit the
                     per-(doc, bucket) partial totals — NEVER the grams
                     themselves, so the stage output is tiny
    groupby(doc)     sum partials -> (doc, n_grams, n_shared, frac)

Scale notes: the explode is the inherent cost of the operator (T gram
rows for a T-token corpus — same as any n-gram index build); everything
after the bucket stage is O(docs), not O(tokens). Buckets are gram-hash
ranges, so hub documents do NOT skew any bucket (a doc's grams spread
uniformly); B is sized so a bucket's rows fit a worker's heap. Docs
shorter than ``n`` collapse to one whole-doc hash (kernel semantics) and
are compared as whole documents; empty docs share a sentinel hash, so
two or more empty docs count each other as duplicated text — both
behaviors inherited from ``shingle_hashes_from_tokens`` and asserted in
tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions import hashing as H


def cross_doc_ngram_stats(ds: rd.Dataset, text_col: str, id_col: str,
                          n: int = 13, min_docs: int = 2,
                          n_buckets: int = 64) -> rd.Dataset:
    """(id_col, n_grams, n_shared_ngrams, dup_ngram_frac) per document.

    ``n_grams`` counts the doc's DISTINCT n-gram hashes;
    ``n_shared_ngrams`` those occurring in >= ``min_docs`` docs overall
    (itself included); ``dup_ngram_frac`` their ratio (0 for empty)."""

    def explode(t: pa.Table) -> pa.Table:
        # round 4: flat batch shingles + ONE lexsort-dedup instead of a
        # per-doc np.unique loop (same unique (doc, gram) rows)
        tok_hashes, offs = H.tokenize_batch(t.column(text_col))
        flat_sh, seg_offs = H.shingle_flat(tok_hashes, offs, n)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        counts = seg_offs[1:] - seg_offs[:-1]
        doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), counts)
        order = np.lexsort((flat_sh, doc_rep))
        d, g = doc_rep[order], flat_sh[order]
        if len(g):
            keep = np.ones(len(g), bool)
            keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
            d, g = d[keep], g[keep]
        return pa.table({
            "gram": g,
            "doc": ids[d],
            "bucket": (g % np.uint64(n_buckets)).astype(np.int64),
        })

    def bucket_fn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "n_grams": pd.Series([], dtype=np.int64),
                                 "n_shared": pd.Series([], dtype=np.int64)})
        g = df["gram"].to_numpy()
        d = df["doc"].to_numpy()
        _, inv, cnt = np.unique(g, return_inverse=True, return_counts=True)
        shared = cnt[inv] >= min_docs      # rows are unique (gram, doc)
        docs_u, dinv = np.unique(d, return_inverse=True)
        return pd.DataFrame({
            id_col: docs_u.astype(np.int64),
            "n_grams": np.bincount(dinv).astype(np.int64),
            "n_shared": np.bincount(
                dinv, weights=shared.astype(np.float64)).astype(np.int64),
        })

    # LAZY co-location (round-4 measured trade — see exchange.co_locate)
    from .exchange import _pd_partition, co_locate

    partials = co_locate(ds.map_batches(explode, batch_format="pyarrow"),
                         "bucket", n_buckets, _pd_partition(bucket_fn))
    totals = partials.groupby(id_col).sum(["n_grams", "n_shared"])

    def finish(t: pa.Table) -> pa.Table:
        tot = t.column("sum(n_grams)").to_numpy(zero_copy_only=False)
        sh = t.column("sum(n_shared)").to_numpy(zero_copy_only=False)
        frac = np.divide(sh, tot, out=np.zeros_like(sh, np.float64),
                         where=tot > 0)
        return pa.table({
            id_col: t.column(id_col).cast(pa.int64()),
            "n_grams": pa.array(tot.astype(np.int64)),
            "n_shared_ngrams": pa.array(sh.astype(np.int64)),
            "dup_ngram_frac": pa.array(np.round(frac, 6), pa.float64()),
        })

    return totals.map_batches(finish, batch_format="pyarrow")
