"""Keyed merge sinks (SURVEY.md §2.1 S-5..S-10).

Ray Data has no mutable sink; the reference's Postgres UPSERT/REPLACE
(api/src/etl/base/loader.py:144-186, api/src/etl/krx/loader.py:163-176)
become **snapshot merges**: union(existing, incoming) -> groupby(key) ->
deterministic latest-wins -> new snapshot. REPLACE is partition
overwrite on a Hive-partitioned layout. All merges are shuffle-on-key
only (no driver materialization).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..stages.dedup import exact_dedup


def upsert(existing: rd.Dataset, incoming: rd.Dataset, keys: list[str],
           version_col: str = "__version") -> rd.Dataset:
    """S-5 UPSERT: new-wins on key collision, old rows otherwise kept.
    Implemented as union + keyed dedup preferring the higher version
    (incoming stamped 1, existing 0) — deterministic."""

    def stamp(v: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df[version_col] = v
            return df
        return f

    merged = existing.map_batches(stamp(0), batch_format="pandas").union(
        incoming.map_batches(stamp(1), batch_format="pandas"))
    out = exact_dedup(merged, keys, [version_col], [False])
    return out.drop_columns([version_col])


def update_only(existing: rd.Dataset, incoming: rd.Dataset,
                keys: list[str]) -> rd.Dataset:
    """S-8 'update' mode: like upsert but incoming rows whose key does
    NOT already exist are dropped. The gate is a DISTRIBUTED bucketed
    semi-join against the existing snapshot's keys — the key set of a
    snapshot is O(dataset), so collecting it to the driver (round 1)
    was a scale-killer."""
    from ..stages.joins import semi_join_large

    gated = semi_join_large(incoming, existing, keys, how="semi")
    return upsert(existing, gated, keys)


def replace_partitions(existing: rd.Dataset, incoming: rd.Dataset,
                       partition_col: str) -> rd.Dataset:
    """S-7 REPLACE: drop every existing row in a partition touched by the
    incoming batch, then union incoming (partition-granularity overwrite,
    reference api/src/etl/krx/loader.py:163-176)."""
    import ray

    parts = frozenset(
        incoming.select_columns([partition_col]).unique(partition_col))
    ref = ray.put(parts)

    def drop_touched(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return df[~df[partition_col].isin(ks)]

    return existing.map_batches(drop_touched, batch_format="pandas") \
                   .union(incoming) \
                   .map_batches(lambda t: t, batch_format="pyarrow")


def write_partitioned(ds: rd.Dataset, path: str,
                      partition_cols: list[str]) -> None:
    """Resumable sink layout: Hive-partitioned parquet + _SUCCESS marker
    (one dir per key range; a rerun can skip finished partitions)."""
    ds.write_parquet(path, partition_cols=partition_cols)
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok")
