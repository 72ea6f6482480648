"""Deterministic stratified sampling (O-3 validation-sampling family,
reference api/src/config/etl_config.yaml validation_sampling_rate —
generalized to per-stratum quotas for training-data curation).

Unlike ``Dataset.random_sample`` (seeded but partition-layout-dependent),
this sampler is a pure function of the data: each row is ranked inside
its stratum by a Knuth multiplicative hash of its id, and the ``n`` best
ranks win. The same rows are selected at any parallelism, any block
layout, and by a SQL engine running the same expression — which is what
makes the sample auditable (and driver-oracle-checkable).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(1 << 32)


def sample_rank_hash(ids: np.ndarray) -> np.ndarray:
    """(id * 2654435761) mod 2^32, exact in uint64 for ids < 2^32.

    SQL parity note: the product overflows signed BIGINT for ids above
    ~2^31.7, so the DuckDB oracle must widen before multiplying —
    ``(id * 2654435761::HUGEINT) % 4294967296`` — to match numpy's
    uint64 arithmetic across the full documented id < 2^32 range."""
    return (ids.astype(np.uint64) * KNUTH) % MOD32


def stratified_sample(ds: rd.Dataset, stratum: str, id_col: str,
                      n_per_stratum: int) -> rd.Dataset:
    """Keep the ``n_per_stratum`` rows with the smallest
    (hash(id), id) per stratum.

    Shape: per-batch combiner (each batch keeps at most n rows per
    stratum it sees) -> groupby(stratum) -> final top-n per group. The
    combiner bounds shuffle traffic at n x strata x blocks rows, so the
    all-to-all moves a sample, not the dataset."""

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            __h=sample_rank_hash(df[id_col].to_numpy()).astype(np.int64))
        df = df.sort_values(["__h", id_col], kind="mergesort")
        return df.groupby(stratum, sort=False).head(n_per_stratum)

    def drop_h(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__h"])

    return (
        ds.map_batches(topn, batch_format="pandas")
        .groupby(stratum)
        .map_groups(topn, batch_format="pandas")
        .map_batches(drop_h, batch_format="pyarrow")
    )
