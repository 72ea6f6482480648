"""Direct hash exchange (stages/exchange.py): equivalence with
groupby().map_groups, empty-partition contract, layout independence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.stages.exchange import exchange_map


def _table(seed=3, n=5000, n_keys=7):
    rng = np.random.RandomState(seed)
    return pa.table({
        "part": pa.array(rng.randint(0, n_keys, n).astype(np.int64)),
        "val": pa.array(rng.standard_normal(n)),
        "rid": pa.array(np.arange(n, dtype=np.int64)),
    })


def _make_summarize():
    """Built per-test: a closure is cloudpickled BY VALUE into the
    exchange's remote tasks; a test-module top-level function would be
    pickled by reference to a module Ray workers can't import."""
    def summarize(t):
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64()),
                          "s": pa.array([], pa.float64())})
        if t is None or t.num_rows == 0:
            return empty
        df = t.to_pandas()
        return pa.table({
            "part": pa.array([int(df["part"].iloc[0])], pa.int64()),
            "n": pa.array([len(df)], pa.int64()),
            "s": pa.array([round(float(df["val"].sum()), 9)],
                          pa.float64()),
        })
    return summarize


def test_exchange_matches_groupby():
    t = _table()
    ds = rd.from_arrow(t).repartition(9)
    got = exchange_map(ds, "part", 7, _make_summarize()).to_pandas() \
        .sort_values("part").reset_index(drop=True)
    want = t.to_pandas().groupby("part", as_index=False) \
        .agg(n=("val", "size"), s=("val", "sum"))
    want["s"] = want["s"].round(9)
    want["n"] = want["n"].astype(np.int64)
    pd.testing.assert_frame_equal(got, want.sort_values("part")
                                  .reset_index(drop=True))


def test_exchange_empty_partitions_and_empty_input():
    # only partitions 0 and 5 populated out of 8
    t = pa.table({"part": pa.array([0, 0, 5], pa.int64()),
                  "val": pa.array([1.0, 2.0, 3.0]),
                  "rid": pa.array([0, 1, 2], pa.int64())})
    out = exchange_map(rd.from_arrow(t), "part", 8, _make_summarize()).to_pandas()
    assert sorted(out["part"]) == [0, 5]
    assert out.set_index("part")["n"].to_dict() == {0: 2, 5: 1}
    # fully empty input
    out2 = exchange_map(rd.from_arrow(t.slice(0, 0)), "part", 4,
                        _make_summarize()).to_pandas()
    # (column names are not asserted on the all-empty result: Ray 2.49's
    # to_pandas drops the schema of a fully-empty dataset — the
    # documented empty-partition behavior in BASELINE.md)
    assert len(out2) == 0


def test_exchange_layout_independent_row_values():
    t = _table(seed=11, n=2000, n_keys=4)
    a = exchange_map(rd.from_arrow(t).repartition(2), "part", 4,
                     _make_summarize()).to_pandas().sort_values("part")
    b = exchange_map(rd.from_arrow(t).repartition(17), "part", 4,
                     _make_summarize()).to_pandas().sort_values("part")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_exchange_single_partition():
    t = _table(seed=5, n=300, n_keys=1)
    out = exchange_map(rd.from_arrow(t).repartition(3), "part", 1,
                       _make_summarize()).to_pandas()
    assert len(out) == 1 and int(out["n"].iloc[0]) == 300
