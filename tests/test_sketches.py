"""HyperLogLog sketch (stages/sketches.py): accuracy + merge = exact-set
semantics + distribution-independence."""

import numpy as np
import pandas as pd
import ray.data as rd

from hyperion_crawler_ray.stages.sketches import HLL, _hash_values, hll_distinct


def test_hll_accuracy_within_rel_error():
    h = HLL(p=12)
    h.add_hashes(_hash_values([f"v{i}" for i in range(50_000)]))
    est = h.estimate()
    assert abs(est - 50_000) / 50_000 < 0.05  # 1.04/sqrt(4096) ≈ 1.6%


def test_hll_merge_equals_union():
    a, b = HLL(12), HLL(12)
    a.add_hashes(_hash_values([f"x{i}" for i in range(10_000)]))
    b.add_hashes(_hash_values([f"x{i}" for i in range(5_000, 15_000)]))
    u = HLL(12)
    u.add_hashes(_hash_values([f"x{i}" for i in range(15_000)]))
    assert a.merge(b).estimate() == u.estimate()  # merge is exact on registers


def test_hll_duplicates_dont_inflate():
    h1, h2 = HLL(12), HLL(12)
    vals = [f"d{i}" for i in range(2_000)]
    h1.add_hashes(_hash_values(vals))
    h2.add_hashes(_hash_values(vals * 5))
    assert h1.estimate() == h2.estimate()


def test_hll_distinct_grouped():
    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "k": ["a"] * 6000 + ["b"] * 3000,
        "v": [f"u{i % 1000}" for i in range(6000)] + [f"w{i}" for i in range(3000)],
    })
    out = hll_distinct(rd.from_pandas(df), "k", "v", p=12)
    got = dict(zip(out["k"], out["approx_distinct"]))
    assert abs(got["a"] - 1000) / 1000 < 0.06
    assert abs(got["b"] - 3000) / 3000 < 0.06
