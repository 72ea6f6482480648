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


# ---------------------------------------------------------------------------
# DDSketch-style quantile sketch (Masson/Rim/Lee, VLDB 2019 — public
# algorithm): log-spaced bins with FIXED boundaries, so the sketch is
# commutative, associative and fully deterministic under any merge order
# (unlike t-digest) — estimates are a pure function of the value multiset
# at any parallelism. Relative-error guarantee: the returned quantile is
# within a factor of gamma = (1+alpha)/(1-alpha) of the true value.
# ---------------------------------------------------------------------------


class DDSketch:
    """Positive-value DDSketch with contiguous bin storage.

    Bin index for x>0 is ceil(log(x)/log(gamma)); values <= min_value
    land in a dedicated zero bin, values past the last bin in a dedicated
    overflow bin (with default alpha=0.01/min_value=1e-9/max_bins=2048 the
    covered range tops out near ~5e8 — ``over > 0`` signals that the alpha
    relative-error guarantee does not hold for the upper tail, instead of
    silently collapsing large values into the last bin). State is one
    small int64 count vector plus two scalars, mergeable by elementwise
    sum — the combiner-before-shuffle shape."""

    def __init__(self, alpha: float = 0.01, min_value: float = 1e-9,
                 max_bins: int = 2048,
                 counts: np.ndarray | None = None, zero: int = 0,
                 over: int = 0):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self.lg = np.log(self.gamma)
        self.min_value = min_value
        self.offset = int(np.ceil(np.log(min_value) / self.lg))
        self.max_bins = max_bins
        self.counts = (counts if counts is not None
                       else np.zeros(max_bins, dtype=np.int64))
        self.zero = zero
        self.over = over

    @property
    def max_representable(self) -> float:
        """Largest value the binned range covers; anything above lands in
        the overflow bin and increments ``over``."""
        return float(self.gamma ** (self.max_bins - 1 + self.offset))

    def add(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float64)
        small = x <= self.min_value
        self.zero += int(small.sum())
        pos = x[~small]
        if len(pos):
            idx = np.ceil(np.log(pos) / self.lg).astype(np.int64) - self.offset
            big = idx > self.max_bins - 1
            self.over += int(big.sum())
            idx = np.clip(idx[~big], 0, self.max_bins - 1)
            np.add.at(self.counts, idx, 1)

    def merge(self, other: "DDSketch") -> "DDSketch":
        return DDSketch(self.alpha, self.min_value, self.max_bins,
                        self.counts + other.counts, self.zero + other.zero,
                        self.over + other.over)

    def quantile(self, q: float) -> float:
        total = self.zero + int(self.counts.sum()) + self.over
        if total == 0:
            return float("nan")
        rank = q * (total - 1)
        if rank < self.zero:
            return 0.0
        cum = self.zero + np.cumsum(self.counts)
        if rank >= cum[-1]:
            # rank falls in the overflow bin — only a lower bound is known
            return self.max_representable
        i = int(np.searchsorted(cum, rank, side="right"))
        i = min(i, self.max_bins - 1)
        # bin i covers (gamma^(i+offset-1), gamma^(i+offset)]; midpoint
        # estimate = 2*gamma^b/(gamma+1) is within alpha relative error
        b = i + self.offset
        return float(2.0 * self.gamma ** b / (self.gamma + 1.0))


def dd_quantiles(ds: rd.Dataset, key: str, value: str,
                 qs: dict[str, float], alpha: float = 0.01) -> pd.DataFrame:
    """Approximate per-key quantiles via mergeable DDSketch partials:
    one (key, counts) row per (key, batch) leaves each map task, the
    groupby merges by vector sum, estimates come out per key. The scale
    path promised by aggregates.grouped_quantiles — sketch state is
    O(bins), not O(group rows), so unbounded groups stream. Returns a
    small DataFrame (key, *qs)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_counts, out_zero, out_over = [], [], [], []
        for k, g in df.groupby(key, sort=False):
            sk = DDSketch(alpha)
            sk.add(g[value].to_numpy())
            out_keys.append(k)
            out_counts.append(sk.counts.tobytes())
            out_zero.append(sk.zero)
            out_over.append(sk.over)
        return pd.DataFrame({key: out_keys, "cnt": out_counts,
                             "zero": out_zero, "over": out_over})

    def merge_group(df: pd.DataFrame) -> pd.DataFrame:
        acc = DDSketch(alpha)
        for raw, z, ov in zip(df["cnt"], df["zero"], df["over"]):
            acc = acc.merge(DDSketch(
                alpha, counts=np.frombuffer(raw, dtype=np.int64).copy(),
                zero=int(z), over=int(ov)))
        row = {key: [df[key].iloc[0]]}
        for out, q in qs.items():
            row[out] = [acc.quantile(q)]
        return pd.DataFrame(row)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key)
        .map_groups(merge_group, batch_format="pandas")
    )
    return out.to_pandas().sort_values(key).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (Misra & Gries 1982; merge per Agarwal et al.
# 2013, "Mergeable Summaries" — public algorithms): k-counter summary
# whose count error after any merges is bounded by n/k. The corpus-stats
# op for "most frequent terms/hosts/n-grams" where an exact groupby of
# the full key space would be a giant shuffle.
# ---------------------------------------------------------------------------


class MisraGries:
    """k-counter heavy-hitters summary over string keys."""

    def __init__(self, k: int = 256):
        self.k = k
        self.counts: dict = {}

    def add(self, keys, weights=None) -> None:
        import collections
        c = collections.Counter(keys) if weights is None else None
        if c is None:
            c = collections.Counter()
            for key, w in zip(keys, weights):
                c[key] += int(w)
        for key, n in c.items():
            self.counts[key] = self.counts.get(key, 0) + n
        self._shrink()

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        # decrement by the (k+1)-th largest count and drop non-positive
        kth = sorted(self.counts.values(), reverse=True)[self.k]
        self.counts = {key: n - kth for key, n in self.counts.items()
                       if n > kth}

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(self.k)
        out.counts = dict(self.counts)
        for key, n in other.counts.items():
            out.counts[key] = out.counts.get(key, 0) + n
        out._shrink()
        return out

    def top(self, n: int) -> list:
        return sorted(self.counts.items(),
                      key=lambda kv: (-kv[1], kv[0]))[:n]


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 256,
                  top_n: int = 20) -> pd.DataFrame:
    """Approximate top-``top_n`` most frequent values of ``col``:
    one MG summary per block (<= k counters each, independent of rows)
    -> O(blocks) driver reduce. Count error <= n_rows/k (tested); use
    for the candidate set, then one cheap exact pass filtered to the
    candidates when exact counts matter.

    Summaries travel as parallel list columns typed after ``col`` (not
    JSON, which coerces non-string keys to str), so int/str/etc. key
    dtypes round-trip the shuffle unchanged."""

    def partial(t: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        mg.add(t.column(col).to_pylist())
        key_type = t.schema.field(col).type
        return pa.table({
            "keys": pa.array([list(mg.counts.keys())], pa.list_(key_type)),
            "cnts": pa.array([list(mg.counts.values())],
                             pa.list_(pa.int64()))})

    acc = MisraGries(k)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for keys, cnts in zip(batch.column("keys").to_pylist(),
                              batch.column("cnts").to_pylist()):
            other = MisraGries(k)
            other.counts = dict(zip(keys, cnts))
            acc = acc.merge(other)
    return pd.DataFrame(acc.top(top_n), columns=[col, "approx_count"])
