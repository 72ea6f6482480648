"""Windowed aggregates over the ``events`` log (streaming-shaped
semantics per SURVEY §2.9 / ray_guide: the input is treated as an ordered
partitioned log; windows are computed per key over ts-sorted groups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from ray.data.aggregate import Count, Sum



def tumbling_window(ds: rd.Dataset, ts_col: str, key: str, value: str,
                    freq: str = "D") -> rd.Dataset:
    """Tumbling count/sum per (key, window). Window start emitted as a
    '%Y-%m-%d' string (matches DuckDB date_trunc/strftime)."""

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, ts_col, value]].copy()
        df["window_start"] = df[ts_col].dt.floor(freq).dt.strftime("%Y-%m-%d")
        g = df.groupby([key, "window_start"], as_index=False, sort=False)
        return g.agg(n=(value, "size"), sum_value=(value, "sum"))

    return (
        ds.map_batches(assign, batch_format="pandas")
        .groupby([key, "window_start"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_value", alias_name="sum_value"))
    )


def sliding_window(ds: rd.Dataset, ts_col: str, key: str, value: str,
                   window_days: int = 2, slide_days: int = 1) -> rd.Dataset:
    """Sliding/hopping window: each event lands in
    ``window_days / slide_days`` overlapping windows. Implemented as a
    per-batch fan-out (one row per covering window) + groupby — no
    cross-row state needed, so it streams."""
    n_hops = window_days // slide_days

    def fanout(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, ts_col, value]].copy()
        day = df[ts_col].dt.floor(f"{slide_days}D")
        parts = []
        for hop in range(n_hops):
            p = df.copy()
            p["window_start"] = (day - pd.Timedelta(days=hop * slide_days)) \
                .dt.strftime("%Y-%m-%d")
            parts.append(p)
        allp = pd.concat(parts, ignore_index=True)
        g = allp.groupby([key, "window_start"], as_index=False, sort=False)
        return g.agg(n=(value, "size"), sum_value=(value, "sum"))

    return (
        ds.map_batches(fanout, batch_format="pandas")
        .groupby([key, "window_start"])
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sum_value", alias_name="sum_value"))
    )


def key_window_funcs(ds: rd.Dataset, key: str, order_by: list[str],
                     value: str, id_col: str, roll_n: int = 3,
                     num_buckets: int = 32) -> rd.Dataset:
    """SQL-window-function family over a keyed log — Ray Data has no
    ``OVER (PARTITION BY ... ORDER BY ...)``, so this composes it as
    hash-partition by key (coarse ``num_buckets`` so ``map_groups`` pays
    per-bucket, not per-key, Python overhead) -> per-bucket vectorized
    pandas pass computing, per key in ``order_by`` order:

    - ``rn``          row_number()
    - ``lag_value``   lag(value, 1)
    - ``lead_value``  lead(value, 1)
    - ``cum_cents``   running sum of round(value*100) as int64 — integer
      cents so the running sum is EXACT and never drifts from a SQL
      engine's float summation order
    - ``roll{n}_mean`` trailing-``roll_n``-row mean (current + n-1
      preceding), computed from the exact cents sum
    - ``rank_value`` / ``dense_rank_value``  rank of ``value`` within
      the key (ties: min / dense)

    Partitioning assumption: one key's rows fit a task (same contract as
    asof_join, joins.py:269); window semantics never cross keys, so
    key-hash bucketing is lossless."""
    roll_col = f"roll{roll_n}_mean"

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            __wb=(pd.util.hash_array(df[key].to_numpy()) % num_buckets)
            .astype(np.int32))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, *order_by], kind="mergesort") \
               .reset_index(drop=True)
        g = df.groupby(key, sort=False)
        v = df[value].to_numpy()
        cents = (np.floor(np.abs(v) * 100.0 + 0.5)
                 * np.sign(v)).astype(np.int64)
        df["__cents"] = cents
        gc = df.groupby(key, sort=False)["__cents"]
        cum = gc.cumsum()
        rn = (g.cumcount() + 1).astype(np.int64)
        # trailing-window sum from the exact cents cumsum: cum[i] minus
        # the per-key cum shifted roll_n back (positionally aligned —
        # groups are contiguous after the sort)
        cum_back = df.assign(__cum=cum).groupby(key, sort=False)["__cum"] \
            .shift(roll_n).fillna(0).astype(np.int64)
        roll_sum = cum.to_numpy() - cum_back.to_numpy()
        roll_cnt = np.minimum(rn.to_numpy(), roll_n)
        roll_mean = roll_sum / (roll_cnt * 100.0)
        roll_mean = (np.floor(np.abs(roll_mean) * 1e4 + 0.5)
                     * np.sign(roll_mean)) / 1e4
        return pd.DataFrame({
            id_col: df[id_col],
            key: df[key],
            "rn": rn,
            "lag_value": g[value].shift(1),
            "lead_value": g[value].shift(-1),
            "cum_cents": cum.astype(np.int64),
            roll_col: roll_mean,
            "rank_value": g[value].rank(method="min").astype(np.int64),
            "dense_rank_value": g[value].rank(method="dense")
            .astype(np.int64),
        })

    # NOTE: stays on the lazy groupby path (not the eager exchange_map):
    # window queries union several legs over one read, and a lazy plan
    # lets Ray stream all legs in one execution; exchange_map's
    # materialize barrier would serialize them. The sort-shuffle cost is
    # acceptable because this runs once, not per crawl round.
    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__wb")
        .map_groups(per_bucket, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def session_windows(ds: rd.Dataset, ts_col: str, key: str,
                    gap_minutes: int = 30,
                    value: str | None = None,
                    num_buckets: int = 32) -> rd.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Emits (key, session_start_us,
    n_events[, sum_value]).

    Shape (round 3): hash keys into ``num_buckets`` coarse buckets and
    sessionize EVERY key in a bucket in one vectorized pass — sort by
    (key, ts), break on key-change-or-gap, reduceat over session starts
    — so ``map_groups`` pays per-bucket, not per-key, Python overhead
    (the same 10-30x trick as key_window_funcs / exact_dedup).
    Partitioning assumption: one key's rows fit a task; sessions never
    cross keys, so key-hash bucketing is lossless."""
    gap = np.timedelta64(gap_minutes * 60, "s")
    cols = [key, "session_start_us", "n_events"] + \
        (["sum_value"] if value is not None else [])

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(
            __wb=(pd.util.hash_array(df[key].to_numpy()) % num_buckets)
            .astype(np.int32))

    def sessionize_bucket(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        if n == 0:
            out = {key: df[key].to_numpy()[:0],
                   "session_start_us": np.array([], np.int64),
                   "n_events": np.array([], np.int64)}
            if value is not None:
                out["sum_value"] = df[value].to_numpy()[:0]
            return pd.DataFrame(out)[cols]
        df = df.sort_values([key, ts_col], kind="mergesort")
        k = df[key].to_numpy()
        ts = df[ts_col].to_numpy()
        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (k[1:] != k[:-1]) | (np.diff(ts) > gap)
        starts = np.flatnonzero(brk)
        out = {
            key: k[starts],
            # robust across pandas datetime64 resolutions (ns vs us)
            "session_start_us": ts[starts].astype("datetime64[us]")
            .astype(np.int64),
            "n_events": np.diff(np.append(starts, n)).astype(np.int64),
        }
        if value is not None:
            out["sum_value"] = np.add.reduceat(
                df[value].to_numpy(), starts)
        return pd.DataFrame(out)[cols]

    # lazy groupby on purpose — see key_window_funcs note
    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("__wb")
        .map_groups(sessionize_bucket, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
