"""Mergeable sketches (approximate aggregates at 100 TB scale).

The reference has no sketches (SURVEY §2.5); the target adds membership
(the cuckoo filter, state/cuckoo.py) and here **HyperLogLog** distinct
counting (Flajolet et al. 2007, public algorithm) as the canonical
combiner-before-shuffle aggregate: one register array per (key, batch)
leaves each map task, and merging is an elementwise max — exactly the
sketch-merge pattern the ray_guide prescribes for large groupbys.

Deterministic: hashing is md5 of the value bytes, so the estimate is a
pure function of the value set at any parallelism.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


class HLL:
    """Plain HyperLogLog with 2^p registers."""

    def __init__(self, p: int = 12, registers: np.ndarray | None = None):
        self.p = p
        self.m = 1 << p
        self.reg = (registers if registers is not None
                    else np.zeros(self.m, dtype=np.uint8))

    def add_hashes(self, h: np.ndarray) -> None:
        """h: uint64 hashes of values."""
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of remaining bits + 1
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        rest_work = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for bit in range(64 - self.p + 1):
            hit = (~done) & ((rest_work & mask) != 0)
            lz[hit] = bit + 1
            done |= hit
            rest_work = rest_work << np.uint64(1)
        np.maximum.at(self.reg, idx, lz)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.p, np.maximum(self.reg, other.reg))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.reg.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.reg == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return e


def _hash_values(values) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "little")
         for v in values), dtype=np.uint64, count=len(values))


def hll_distinct(ds: rd.Dataset, key: str, value: str,
                 p: int = 12) -> pd.DataFrame:
    """Approximate distinct ``value`` per ``key``: per-batch HLL partials
    -> groupby(key) register-max merge -> estimates. Returns a small
    DataFrame (key, approx_distinct)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_regs = [], []
        for k, g in df.groupby(key, sort=False):
            h = HLL(p)
            h.add_hashes(_hash_values(g[value].to_numpy()))
            out_keys.append(k)
            out_regs.append(h.reg.tobytes())
        return pd.DataFrame({key: out_keys, "reg": out_regs})

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        acc = HLL(p)
        for raw in df["reg"]:
            acc = acc.merge(HLL(p, np.frombuffer(raw, dtype=np.uint8).copy()))
        return pd.DataFrame({key: [df[key].iloc[0]],
                             "approx_distinct": [int(round(acc.estimate()))]})

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(merge_group, batch_format="pandas")
    )
    return out.to_pandas().sort_values(key).reset_index(drop=True)
