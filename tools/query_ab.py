"""Interleaved same-process A/B timer for operator queries (round-5
punch #2: BENCH_r04 showed quality_score/windows +43-62% on unchanged
code; single-sample BENCH rows can't separate that from the box's
documented ±2x drift).

Runs each named query R rounds in interleaved order (q1, q2, ..., q1,
q2, ...) inside ONE Ray session and prints per-query min/median/max —
the only comparison protocol BASELINE.md trusts for <2x effects.

    python tools/query_ab.py quality_score windows [--rounds 5] [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import statistics
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    # same worker warm-up as bench.py
    rd.range(args.cpus * 8, override_num_blocks=args.cpus * 8).map_batches(
        lambda b: __import__("pandas") and b, batch_format="pandas").count()

    from hyperion_crawler_ray.pipelines.queries import QUERIES

    times: dict[str, list[float]] = {q: [] for q in args.queries}
    for r in range(args.rounds):
        for q in args.queries:
            t0 = time.perf_counter()
            res = QUERIES[q](args.sf)
            if isinstance(res, rd.Dataset):
                res.to_pandas()
            times[q].append(round(time.perf_counter() - t0, 3))
    out = {}
    for q, ts in times.items():
        out[q] = {"min": min(ts), "median": round(statistics.median(ts), 3),
                  "max": max(ts), "all": ts}
    print(json.dumps({"metric": "query_ab", "cpus": args.cpus,
                      "sf": args.sf, "results": out}))
    ray.shutdown()


if __name__ == "__main__":
    main()
