"""Joins & lookups (SURVEY.md §2.4), shuffle-avoiding by default.

Small sides are broadcast once via ``ray.put`` and applied inside
``map_batches`` (reference J-1, the 4-way ticker join of
api/src/etl/krx/extractor.py:64-84, joined driver-side against small
frames). Large-large joins hash-partition both sides on an explicit
bucket count (the portable partitioned hash join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def broadcast_join(ds: rd.Dataset, small: pd.DataFrame, on: str | list[str],
                   how: str = "left") -> rd.Dataset:
    """Left/inner join against a broadcast small side. The small frame is
    put in the object store ONCE; every task reads the same copy
    (zero-copy for numerics) instead of re-shipping per batch."""
    ref = ray.put(small)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return df.merge(rhs, on=on, how=how)

    return ds.map_batches(f, batch_format="pandas")


def semi_join(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """J-2 FK-existence semi-join (reference
    api/src/etl/krx/loader.py:187-193): keep rows whose key exists in the
    broadcast key set."""
    ref = ray.put(frozenset(keys))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return df[df[col].isin(ks)]

    return ds.map_batches(f, batch_format="pandas")


def anti_join(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """Negation of J-2 — the reject set (dead-letter side)."""
    ref = ray.put(frozenset(keys))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(ref)
        return df[~df[col].isin(ks)]

    return ds.map_batches(f, batch_format="pandas")


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str,
              num_partitions: int = 16, how: str = "inner") -> rd.Dataset:
    """Partitioned hash join for two LARGE sides: bucket both on
    ``hash(key) % B`` (B explicit), co-group, pandas-merge each bucket.
    The groupby is the one unavoidable all-to-all; skewed keys should be
    pre-salted by the caller."""

    def tag(side: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__bucket"] = pd.util.hash_array(
                df[on].to_numpy()) % num_partitions
            df["__side"] = side
            return df
        return f

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")

    def merge_bucket(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == "l"].drop(columns=["__bucket", "__side"])
        r = df[df["__side"] == "r"].drop(columns=["__bucket", "__side"])
        r = r.dropna(axis=1, how="all")
        l = l.dropna(axis=1, how="all")
        return l.merge(r, on=on, how=how)

    out = lt.union(rt).groupby("__bucket").map_groups(
        merge_bucket, batch_format="pandas")
    return out.map_batches(lambda t: t, batch_format="pyarrow")
