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


def _make_identity_sorted():
    def f(t):
        empty = pa.table({"part": pa.array([], pa.int64()),
                          "rid": pa.array([], pa.int64())})
        if t is None or t.num_rows == 0:
            return empty
        df = t.to_pandas().sort_values("rid")
        return pa.table({"part": pa.array(df["part"], pa.int64()),
                         "rid": pa.array(df["rid"], pa.int64())})
    return f


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(st.integers(min_value=0, max_value=5),
                    min_size=0, max_size=60),
           st.integers(min_value=1, max_value=9),
           st.integers(min_value=1, max_value=7))
    def test_exchange_property_random_layouts(parts, n_blocks, n_parts):
        """Round-4 property test (the exchange is load-bearing for crawl
        admission and SemDeDup): for ANY partition-id multiset, ANY
        block layout and ANY partition count >= max id + 1, exchange_map
        with an identity fn returns exactly the input rows, each in its
        partition, deterministically ordered."""
        n_parts = max(n_parts, (max(parts) + 1) if parts else 1)
        t = pa.table({
            "part": pa.array(parts, pa.int64()),
            "rid": pa.array(np.arange(len(parts), dtype=np.int64)),
        })
        ds = rd.from_arrow(t).repartition(n_blocks)
        out = exchange_map(ds, "part", n_parts, _make_identity_sorted()) \
            .to_pandas()
        if not parts:
            assert len(out) == 0
            return
        got = out.sort_values(["part", "rid"]).reset_index(drop=True)
        want = t.to_pandas().sort_values(["part", "rid"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
except ImportError:  # pragma: no cover
    pass


def test_exchange_out_of_range_partition_raises():
    """ADVICE round 3: an out-of-range partition id must raise, not
    silently drop rows."""
    import pytest as _pytest
    import ray as _ray

    t = pa.table({"part": pa.array([0, 1, 7], pa.int64()),
                  "rid": pa.array([0, 1, 2], pa.int64())})
    with _pytest.raises((_ray.exceptions.RayTaskError, ValueError),
                        match="out of range"):
        exchange_map(rd.from_arrow(t), "part", 4,
                     _make_identity_sorted()).to_pandas()
