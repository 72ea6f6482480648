"""Bench the DISTRIBUTED connected-components path at size (round-4
punch item: sf-scale graphs take the driver union-find fast path, so the
iterative min-label propagation had never been measured at its design
load).

Builds a deterministic synthetic near-dup pair graph shaped like real
dedup output — star clusters (the capped LSH/SemDeDup emission shape)
plus chains (worst-case diameter for label propagation) — forces
``driver_small_edges=0``, and reports rounds x per-round seconds plus a
union-find equality check against the bounded driver path.

    PYTHONPATH=/root/repo python tools/components_bench.py [n_pairs]

Results are recorded in BASELINE.md; tests/test_components.py carries an
always-on smaller regression bound and a GRAFT_SLOW=1-gated full-size
run.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd


def synth_pairs(n_pairs: int, star_frac: float = 0.8,
                star_size: int = 64, chain_len: int = 6,
                seed: int = 7) -> pd.DataFrame:
    """Deterministic pair graph: ``star_frac`` of pairs come from
    star-shaped clusters of ``star_size`` members (each member paired
    with the cluster min — exactly what the capped LSH emission looks
    like), the rest from chains of ``chain_len`` nodes (diameter
    stress). Node ids are disjoint across clusters."""
    rng = np.random.RandomState(seed)
    n_star_pairs = int(n_pairs * star_frac)
    n_stars = max(1, n_star_pairs // (star_size - 1))
    base = 0
    a_parts, b_parts = [], []
    for s in range(n_stars):
        ids = base + np.arange(star_size, dtype=np.int64)
        a_parts.append(np.full(star_size - 1, ids[0]))
        b_parts.append(ids[1:])
        base += star_size
    n_chain_pairs = n_pairs - (n_stars * (star_size - 1))
    n_chains = max(1, n_chain_pairs // (chain_len - 1))
    for c in range(n_chains):
        ids = base + np.arange(chain_len, dtype=np.int64)
        a_parts.append(ids[:-1])
        b_parts.append(ids[1:])
        base += chain_len
    a = np.concatenate(a_parts)
    b = np.concatenate(b_parts)
    perm = rng.permutation(len(a))        # shuffle row order (layout)
    return pd.DataFrame({"id_a": a[perm], "id_b": b[perm]})


def main() -> int:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from hyperion_crawler_ray.stages.components import (
        _driver_components_oracle_check, connected_components)  # noqa: F401

    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    df = synth_pairs(n_pairs)
    ds = rd.from_pandas(df).repartition(32).materialize()

    t0 = time.perf_counter()
    rt: list[float] = []
    comp = connected_components(ds, driver_small_edges=0,
                                num_partitions=16, round_times=rt) \
        .materialize()
    total = time.perf_counter() - t0
    got = comp.to_pandas().sort_values("node").reset_index(drop=True)

    # union-find oracle on the same pairs (driver-side, exact)
    want = _driver_components_oracle_check(df)
    ok = bool((got["node"].to_numpy() == want["node"].to_numpy()).all()
              and (got["component"].to_numpy()
                   == want["component"].to_numpy()).all())

    print(json.dumps({
        "metric": "connected_components_distributed",
        "n_pairs": n_pairs,
        "n_directed_edges": 2 * n_pairs,
        "n_nodes": int(got["node"].nunique()),
        "rounds": len(rt),
        "round_secs": rt,
        "total_sec": round(total, 3),
        "edges_per_sec": round(2 * n_pairs / total),
        "matches_union_find": ok,
    }))
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
