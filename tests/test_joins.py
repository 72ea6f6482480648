"""Partitioned join stages (stages/joins.py) vs pandas oracles,
including the round-1 failure modes: dtype stability across buckets,
all-null columns inside a bucket, one-sided buckets, composite keys."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd
from hypothesis import given, settings
from hypothesis import strategies as st

from hyperion_crawler_ray.stages.joins import hash_join, semi_join_large


def _ds(df: pd.DataFrame) -> rd.Dataset:
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_hash_join_preserves_int_key_dtype_with_disjoint_buckets():
    """Round-1 bug: pandas union NaN-filled the missing side and coerced
    int64 keys to float64 whenever a bucket held rows from one side."""
    left = pd.DataFrame({"k": np.arange(100, dtype=np.int64),
                         "a": np.arange(100)})
    right = pd.DataFrame({"k": np.arange(90, 190, dtype=np.int64),
                          "b": np.arange(100) * 2})
    out = hash_join(_ds(left), _ds(right), on="k",
                    num_partitions=16).to_pandas()
    assert out["k"].dtype == np.int64
    assert out["a"].dtype == np.int64 and out["b"].dtype == np.int64
    want = left.merge(right, on="k")
    assert len(out) == len(want) == 10
    assert sorted(out["k"]) == sorted(want["k"])


def test_hash_join_keeps_all_null_column_in_sparse_bucket():
    """dropna(axis=1) (round 1) silently dropped a legit column that was
    all-null within one bucket."""
    left = pd.DataFrame({"k": [1, 2, 3, 4],
                         "note": pd.array([None, None, None, None],
                                          dtype="string")})
    right = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    out = hash_join(_ds(left), _ds(right), on="k",
                    num_partitions=4).to_pandas()
    assert "note" in out.columns
    assert len(out) == 4
    assert out["note"].isna().all()


def test_hash_join_left_outer():
    left = pd.DataFrame({"k": [1, 2, 3], "a": ["x", "y", "z"]})
    right = pd.DataFrame({"k": [2], "b": [99]})
    out = hash_join(_ds(left), _ds(right), on="k", how="left",
                    num_partitions=4).to_pandas().sort_values("k")
    assert list(out["k"]) == [1, 2, 3]
    assert out.loc[out["k"] == 2, "b"].iloc[0] == 99
    assert out.loc[out["k"] != 2, "b"].isna().all()


def test_hash_join_rejects_column_collision():
    left = pd.DataFrame({"k": [1], "x": [1]})
    right = pd.DataFrame({"k": [1], "x": [2]})
    with pytest.raises(ValueError, match="collision"):
        hash_join(_ds(left), _ds(right), on="k")


def test_semi_join_large_composite_key_semi_and_anti():
    left = pd.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "y", "x", "y", "x"],
                         "v": [10, 11, 12, 13, 14]})
    right = pd.DataFrame({"a": [1, 2, 9], "b": ["y", "x", "q"],
                          "junk": [0, 0, 0]})
    semi = semi_join_large(_ds(left), _ds(right), on=["a", "b"],
                           how="semi").to_pandas().sort_values("v")
    anti = semi_join_large(_ds(left), _ds(right), on=["a", "b"],
                           how="anti").to_pandas().sort_values("v")
    assert list(semi["v"]) == [11, 12]
    assert list(anti["v"]) == [10, 13, 14]
    assert set(semi.columns) == {"a", "b", "v"}  # right cols never leak


def test_semi_join_large_single_key_nulls_and_list_payload():
    """Single-key semi/anti takes the pc.is_in path: SQL null semantics
    (null keys never match — semi drops them, anti keeps them) and
    list-typed payload columns, which the acero join rejects outright."""
    left = pa.table({
        "k": pa.array([1, 2, 3, None, 5], pa.int64()),
        "sig": pa.array([[1, 2], [3], [], [4, 5], [6]],
                        pa.list_(pa.uint64())),
    })
    right = pa.table({"k": pa.array([2, None, 5], pa.int64())})
    semi = semi_join_large(rd.from_arrow(left), rd.from_arrow(right),
                           on="k", how="semi").to_pandas()
    anti = semi_join_large(rd.from_arrow(left), rd.from_arrow(right),
                           on="k", how="anti").to_pandas()
    assert sorted(semi["k"]) == [2, 5]
    assert [list(s) for s in semi.sort_values("k")["sig"]] == [[3], [6]]
    assert sorted(anti["k"].fillna(-1)) == [-1, 1, 3]  # null key kept
    assert len(semi) + len(anti) == len(left)


@settings(max_examples=15, deadline=None)
@given(
    lkeys=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    rkeys=st.lists(st.integers(0, 30), min_size=0, max_size=60),
    nparts=st.sampled_from([1, 4, 16]),
)
def test_hash_join_matches_pandas_merge(lkeys, rkeys, nparts):
    left = pd.DataFrame({"k": np.asarray(lkeys, np.int64),
                         "a": np.arange(len(lkeys), dtype=np.int64)})
    right_df = pd.DataFrame({"k": np.asarray(rkeys, np.int64)})
    right_df = right_df.drop_duplicates("k")
    right_df["b"] = right_df["k"] * 7
    if len(left) == 0 or len(right_df) == 0:
        return  # empty datasets have no schema to join on
    out = hash_join(_ds(left), _ds(right_df), on="k",
                    num_partitions=nparts).to_pandas()
    want = left.merge(right_df, on="k")
    assert len(out) == len(want)
    if len(want) == 0:
        return
    key = lambda df: sorted(map(tuple, df[["k", "a", "b"]].to_numpy()))
    assert key(out) == key(want)


def test_asof_join_matches_pandas_and_duckdb():
    """As-of join (custom operator Ray Data lacks): per-key latest right
    row at-or-before each left ts. Oracled against BOTH a global
    pd.merge_asof and DuckDB's ASOF JOIN."""
    rng = np.random.RandomState(3)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "sym": rng.choice(["A", "B", "C", "D"], n_l),
        "ts": rng.randint(0, 10000, n_l).astype(np.int64),
        "order_id": np.arange(n_l, dtype=np.int64),
    }).drop_duplicates(["sym", "ts"])
    right = pd.DataFrame({
        "sym": rng.choice(["A", "B", "C", "E"], n_r),
        "ts": rng.randint(0, 10000, n_r).astype(np.int64),
        "px": np.round(rng.uniform(1, 100, n_r), 2),
    }).drop_duplicates(["sym", "ts"])

    from hyperion_crawler_ray.stages.joins import asof_join

    got = asof_join(_ds(left), _ds(right), key="sym", ts="ts",
                    num_partitions=8).to_pandas()
    got = got.sort_values("order_id").reset_index(drop=True)

    want = pd.merge_asof(left.sort_values(["ts", "sym"], kind="mergesort"),
                         right.sort_values(["ts", "sym"], kind="mergesort"),
                         on="ts", by="sym", direction="backward")
    want = want.sort_values("order_id").reset_index(drop=True)
    assert len(got) == len(left)
    assert list(got["order_id"]) == list(want["order_id"])
    assert got["px"].fillna(-1).tolist() == want["px"].fillna(-1).tolist()

    import duckdb
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    dk = con.execute("""
        SELECT l.order_id, r.px
        FROM l ASOF LEFT JOIN r ON l.sym = r.sym AND l.ts >= r.ts
        ORDER BY l.order_id
    """).fetchdf()
    assert got["px"].fillna(-1).tolist() == dk["px"].fillna(-1).tolist()


def test_salted_hash_join_equals_unsalted_on_skewed_keys():
    """Hot-key salting (left rows spread over salt sub-buckets, hot right
    rows replicated) must be invisible in the result: equality with the
    unsalted join and with pandas merge on a 60%-one-key skew."""
    rng = np.random.RandomState(5)
    n = 4000
    keys = np.where(rng.uniform(size=n) < 0.6, 7,
                    rng.randint(0, 200, n)).astype(np.int64)
    left = pd.DataFrame({"k": keys, "a": np.arange(n, dtype=np.int64)})
    right = pd.DataFrame({"k": np.arange(0, 200, dtype=np.int64)})
    right["b"] = right["k"] * 3

    got = hash_join(_ds(left), _ds(right), on="k", num_partitions=8,
                    hot_keys=[7], salt=4).to_pandas()
    want = left.merge(right, on="k")
    assert len(got) == len(want)
    key = lambda df: sorted(map(tuple, df[["k", "a", "b"]].to_numpy()))
    assert key(got) == key(want)
    assert got["k"].dtype == np.int64

    # left-outer with a hot key that has NO right match keeps its rows
    right2 = right[right["k"] != 7]
    got2 = hash_join(_ds(left), _ds(right2), on="k", how="left",
                     num_partitions=8, hot_keys=[7], salt=4).to_pandas()
    want2 = left.merge(right2, on="k", how="left")
    assert len(got2) == len(want2)
    assert got2["b"].isna().sum() == want2["b"].isna().sum()


def test_detect_hot_keys_finds_planted_skew():
    from hyperion_crawler_ray.stages.joins import detect_hot_keys
    rng = np.random.RandomState(9)
    n = 20000
    keys = np.where(rng.uniform(size=n) < 0.5, 42,
                    rng.randint(1000, 9000, n)).astype(np.int64)
    ds = _ds(pd.DataFrame({"k": keys}))
    hot = detect_hot_keys(ds, "k", sample_frac=0.25, threshold=0.05, seed=1)
    assert hot == [42]


def test_range_join_matches_pandas_and_duckdb():
    """Range (interval-containment) join: every right interval
    [lo, hi] containing the left row's value, per key. Oracled against
    a pandas cross-merge filter and a DuckDB inequality join."""
    rng = np.random.RandomState(7)
    n_l, n_r = 500, 200
    left = pd.DataFrame({
        "host": rng.choice(["a.com", "b.com", "c.com"], n_l),
        "val": rng.randint(0, 1000, n_l).astype(np.int64),
        "row_id": np.arange(n_l, dtype=np.int64),
    })
    lo = rng.randint(0, 950, n_r).astype(np.int64)
    right = pd.DataFrame({
        "host": rng.choice(["a.com", "b.com", "d.com"], n_r),
        "lo": lo,
        "hi": lo + rng.randint(0, 120, n_r).astype(np.int64),
        "band_id": np.arange(n_r, dtype=np.int64),
    })

    from hyperion_crawler_ray.stages.joins import range_join

    got = range_join(_ds(left), _ds(right), key="host",
                     left_val="val", right_lo="lo", right_hi="hi",
                     num_partitions=8).to_pandas()
    got_pairs = sorted(map(tuple, got[["row_id", "band_id"]].to_numpy()))

    want = left.merge(right, on="host")
    want = want[(want["val"] >= want["lo"]) & (want["val"] <= want["hi"])]
    want_pairs = sorted(map(tuple, want[["row_id", "band_id"]].to_numpy()))
    assert got_pairs == want_pairs
    assert len(got_pairs) > 0  # non-degenerate fixture
    assert got["row_id"].dtype == np.int64 and got["band_id"].dtype == np.int64

    import duckdb
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    dk = con.execute("""
        SELECT l.row_id, r.band_id FROM l JOIN r
        ON l.host = r.host AND l.val BETWEEN r.lo AND r.hi
        ORDER BY l.row_id, r.band_id
    """).fetchdf()
    assert got_pairs == sorted(map(tuple, dk.to_numpy()))


def test_range_join_one_sided_bucket_and_empty_result():
    left = pd.DataFrame({"k": ["only-left"], "val": np.array([5], np.int64),
                         "row_id": np.array([0], np.int64)})
    right = pd.DataFrame({"k": ["only-right"], "lo": np.array([0], np.int64),
                          "hi": np.array([10], np.int64),
                          "band_id": np.array([0], np.int64)})
    from hyperion_crawler_ray.stages.joins import range_join
    out = range_join(_ds(left), _ds(right), key="k", left_val="val",
                     right_lo="lo", right_hi="hi", num_partitions=4)
    # schema survives an all-empty result (to_pandas drops columns on
    # zero rows — a Ray quirk — so assert on the Dataset schema)
    assert set(out.schema().names) == {"k", "val", "row_id", "lo", "hi",
                                       "band_id"}
    assert out.count() == 0


def test_hash_join_right_and_full_outer_match_pandas():
    rng = np.random.RandomState(5)
    left = pd.DataFrame({"k": rng.randint(0, 20, 50).astype(np.int64),
                         "lv": np.arange(50, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.randint(10, 30, 40).astype(np.int64),
                          "rv": np.arange(40, dtype=np.int64)})

    for how in ("right", "outer"):
        got = hash_join(_ds(left), _ds(right), on="k",
                        num_partitions=5, how=how).to_pandas()
        want = left.merge(right, on="k", how=how)
        gk = sorted(map(tuple, got.fillna(-1)[["k", "lv", "rv"]].to_numpy()))
        wk = sorted(map(tuple, want.fillna(-1)[["k", "lv", "rv"]].to_numpy()))
        assert gk == wk, how
        assert list(got.columns) == ["k", "lv", "rv"]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        hash_join(_ds(left), _ds(right), on="k", how="outer",
                  hot_keys=[10])


def test_bloom_filter_membership_and_merge():
    from hyperion_crawler_ray.stages.joins import BloomFilter
    rng = np.random.RandomState(2)
    present = rng.randint(0, 1 << 62, 5000).astype(np.uint64)
    absent = (rng.randint(0, 1 << 62, 20000).astype(np.uint64)
              | np.uint64(1 << 62))  # disjoint range
    a, b = BloomFilter(), BloomFilter()
    a.add_hashes(present[:2500]); b.add_hashes(present[2500:])
    m = a.merge(b)
    assert m.contains_hashes(present).all()  # no false negatives, ever
    assert m.contains_hashes(absent).mean() < 0.02  # fp rate sane


def test_hash_join_bloom_prefilter_equals_plain_inner():
    rng = np.random.RandomState(9)
    # selective join: only 5% of left keys exist on the right
    left = pd.DataFrame({"k": rng.randint(0, 10000, 5000).astype(np.int64),
                         "lv": np.arange(5000, dtype=np.int64)})
    right = pd.DataFrame({"k": rng.randint(0, 500, 300).astype(np.int64),
                          "rv": np.arange(300, dtype=np.int64)})
    plain = hash_join(_ds(left), _ds(right), on="k",
                      num_partitions=6).to_pandas()
    bloomed = hash_join(_ds(left), _ds(right), on="k", num_partitions=6,
                        prefilter="bloom").to_pandas()
    key = ["k", "lv", "rv"]
    assert sorted(map(tuple, plain[key].to_numpy())) \
        == sorted(map(tuple, bloomed[key].to_numpy()))
    with pytest.raises(ValueError):
        hash_join(_ds(left), _ds(right), on="k", how="left",
                  prefilter="bloom")
