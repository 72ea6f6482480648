"""Aggregations (SURVEY.md §2.5) with the combiner-before-shuffle pattern.

``preagg_sum`` computes partial aggregates inside each batch and ships
only one row per (key, batch) into the groupby — the scale-critical trick
for 100 TB groupbys (SURVEY §7.3). ``grouped_consensus`` re-derives A-1
``calculate_consensus`` (reference api/src/etl/base/transformer.py:221-237).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def preagg_sum(ds: rd.Dataset, keys: list[str],
               sums: dict[str, str], count_as: str | None = None) -> rd.Dataset:
    """Partial-aggregate sums/counts per batch, then a small global
    groupby over the partials. ``sums``: {out_name: source_col}."""

    import pyarrow as pa
    import pyarrow.compute as pc

    srcs = list(sums.values())

    def partial(t: pa.Table) -> pa.Table:
        # Arrow-native hash aggregation: ~10x faster than a pandas
        # groupby per batch (no arrow<->pandas conversion; measured
        # 7.5s -> 0.7s on 600k rows). Options built here — pyarrow
        # *Options don't survive closure serialization.
        arrow_aggs = [(src, "sum") for src in srcs]
        if count_as:
            arrow_aggs.append((srcs[0], "count",
                               pc.CountOptions(mode="all")))
        g = t.group_by(keys).aggregate(arrow_aggs)
        cols = {k: g.column(k) for k in keys}
        for out, src in sums.items():
            cols[out] = g.column(f"{src}_sum")
        if count_as:
            cols[count_as] = pc.cast(g.column(f"{srcs[0]}_count"), pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    aggs = [Sum(out, alias_name=out) for out in sums]
    if count_as:
        aggs.append(Sum(count_as, alias_name=count_as))
    return partials.groupby(keys[0] if len(keys) == 1 else keys).aggregate(*aggs)


def grouped_consensus(ds: rd.Dataset, key: str, value: str,
                      round_to: int = 4) -> rd.Dataset:
    """A-1 consensus: per-key mean / count / min / max (value-distribution
    histogram variant: ``grouped_histogram``)."""
    out = ds.groupby(key).aggregate(
        Mean(value, alias_name="avg_value"),
        Count(alias_name="n"),
        Min(value, alias_name="min_value"),
        Max(value, alias_name="max_value"),
    )

    def rnd(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        i = t.schema.get_field_index("avg_value")
        # half_towards_infinity = DuckDB's round() convention
        return t.set_column(i, "avg_value",
                            pc.round(t.column("avg_value"), ndigits=round_to,
                                     round_mode="half_towards_infinity"))

    return out.map_batches(rnd, batch_format="pyarrow")


def grouped_histogram(ds: rd.Dataset, key: str, value: str,
                      bin_width: float) -> rd.Dataset:
    """A-1's value-distribution histogram as a first-class groupby:
    count per (key, floor(value / bin_width)) with per-batch combining."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[[key, value]].copy()
        df["bin"] = np.floor(df[value].to_numpy() / bin_width).astype(np.int64)
        return df.groupby([key, "bin"], as_index=False, sort=False).agg(
            n=(value, "size"))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby([key, "bin"])
        .aggregate(Sum("n", alias_name="n"))
    )


def grouped_quantiles(ds: rd.Dataset, key: str, value: str,
                      qs: dict[str, float],
                      round_to: int = 6) -> rd.Dataset:
    """Exact per-key quantiles (linear interpolation — matches SQL
    ``quantile_cont``). ``qs``: {out_col: q in [0,1]}.

    Shape: groupby(key).map_groups with a numpy quantile per group.
    Partitioning assumption: one key's values fit a task (exact
    quantiles are holistic — they need the whole group; for sketch-sized
    state at unbounded group size, use a t-digest-style mergeable sketch
    instead, same combiner shape as stages/sketches.py HLL)."""

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value].to_numpy(dtype=np.float64)
        row = {key: [df[key].iloc[0]]}
        for out, q in qs.items():
            x = float(np.quantile(v, q))
            row[out] = [np.floor(abs(x) * 10**round_to + 0.5)
                        / 10**round_to * (1 if x >= 0 else -1)]
        return pd.DataFrame(row)

    return (
        ds.groupby(key)
        .map_groups(per_group, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def table_counts(paths: dict[str, str]) -> pd.DataFrame:
    """A-4 stage-boundary counters: metadata-only row counts per table
    (parquet footer reads — no data scan)."""
    import pyarrow.parquet as pq

    return pd.DataFrame([{
        f"{name}_rows": pq.ParquetFile(path).metadata.num_rows
        for name, path in paths.items()
    }])
