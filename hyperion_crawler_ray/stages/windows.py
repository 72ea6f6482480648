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


def session_windows(ds: rd.Dataset, ts_col: str, key: str,
                    gap_minutes: int = 30) -> rd.Dataset:
    """Session windows per key: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Emits (key, session_start_us,
    n_events). Ordering assumption: events sorted by ts WITHIN each
    per-key group (done inside map_groups — groups fit in memory because
    they're per-user slices of the log)."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([ts_col], kind="mergesort")
        ts = df[ts_col].to_numpy()
        brk = np.zeros(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap).astype(np.int64)
        sid = np.cumsum(brk)
        df = df.assign(__sid=sid)
        g = df.groupby("__sid", sort=True)
        out = g.agg(session_start=(ts_col, "min"), n_events=(ts_col, "size"))
        out[key] = df[key].iloc[0]
        # robust across pandas datetime64 resolutions (ns vs us)
        out["session_start_us"] = (
            out["session_start"].to_numpy(dtype="datetime64[us]")
            .astype("int64"))
        return out[[key, "session_start_us", "n_events"]].reset_index(drop=True)

    return (
        ds.groupby(key)
        .map_groups(sessionize, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
