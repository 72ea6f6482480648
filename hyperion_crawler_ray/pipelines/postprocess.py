"""Post-crawl corpus curation: fuzzy-dedup the crawled pages.

Composes the round-3 dedup family end-to-end over a finished crawl's
output — the "crawl, then curate the corpus" pipeline a training-data
user runs after every crawl:

    read_crawl_pages        the crawl's partitioned parquet output
    -> LSH banding          over the MinHash signatures the crawl
                            already computed per page at fetch time
                            (score_pages=True — no re-tokenization)
    -> Jaccard verify       exact verification of candidate pairs
                            against page text (partitioned joins)
    -> connected components transitive closure of the pair graph
    -> anti join            keep ONE page per duplicate cluster

The page id used for the closure is ``(round << 32) | seq`` — the
crawl order — so the cluster representative (min id) is the page the
crawl fetched FIRST, the standard keep-earliest policy. Everything is
the stages' distributed machinery; nothing page-sized reaches the
driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..stages.components import fuzzy_dedup_docs
from ..stages.dedup import jaccard_verify, lsh_candidate_pairs
from .frontier import read_crawl_pages

_PAGE_ID = "__page_id"


def _with_page_id(pages: rd.Dataset) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        rnd = t.column("round").to_numpy(zero_copy_only=False).astype(np.int64)
        seq = t.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(_PAGE_ID,
                               pa.array((rnd << 32) | seq, pa.int64()))
    return pages.map_batches(f, batch_format="pyarrow")


def dedup_pages(pages: rd.Dataset, threshold: float = 0.5,
                bands: int = 16, num_partitions: int = 8) -> rd.Dataset:
    """Core of the post-crawl dedup over any pages Dataset carrying
    (round, seq, text, minhash) — see ``dedup_crawled_pages``."""
    pages = _with_page_id(pages).materialize()

    sigs = pages.select_columns([_PAGE_ID, "minhash"]).map_batches(
        lambda t: pa.table({_PAGE_ID: t.column(_PAGE_ID),
                            "sig": t.column("minhash")}),
        batch_format="pyarrow")
    pairs = lsh_candidate_pairs(sigs, _PAGE_ID, bands=bands)
    verified = jaccard_verify(
        pairs, pages.select_columns([_PAGE_ID, "text"]), _PAGE_ID, "text",
        threshold=threshold, num_partitions=num_partitions)
    return fuzzy_dedup_docs(pages, verified, id_col=_PAGE_ID,
                            num_partitions=num_partitions) \
        .drop_columns([_PAGE_ID])


def dedup_crawled_pages(crawl_dir: str, threshold: float = 0.5,
                        bands: int = 16, num_partitions: int = 8,
                        write_to: str | None = None) -> rd.Dataset:
    """Fuzzy-dedup a finished crawl's pages; returns the kept pages
    (original schema), optionally writing them as partitioned parquet.
    Requires the crawl to have run with ``score_pages=True`` (the
    default) so the stored ``minhash`` column exists."""
    kept = dedup_pages(read_crawl_pages(crawl_dir), threshold=threshold,
                       bands=bands, num_partitions=num_partitions)
    if write_to:
        kept = kept.materialize()
        kept.write_parquet(write_to)
    return kept
