"""Cluster job entrypoint for the frontier crawl (the north-rule launch
surface: ``ray job submit`` onto a fixed-size multi-node cluster).

    ray job submit --working-dir . -- \
        python tools/crawl_job.py --pages /data/corpus/pages \
            --seeds /data/corpus/seeds.parquet \
            --robots /data/corpus/robots.parquet \
            --out /data/crawl --rounds 16 [--resume]

Inside ``ray job submit`` the driver joins the cluster Ray started for
the job, so ``ray.init`` here is guarded (standalone local runs still
work: Ray auto-sizes to the box). The crawl itself is the same code
path the tests and bench drive — checkpointed rounds, exact resume with
``--resume``, per-round lineage parquet under <out>/rounds/.

Sandbox note (BASELINE.md): no multi-node cluster exists in this
container; multi-node behavior is evidenced by the two-parallelism
scaling protocol in ``bench.py --scaling``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True,
                    help="corpus pages parquet dir/file")
    ap.add_argument("--seeds", required=True, help="seeds parquet")
    ap.add_argument("--robots", required=True, help="robots parquet")
    ap.add_argument("--out", required=True, help="crawl output dir")
    ap.add_argument("--rounds", type=int, default=16)
    ap.add_argument("--per-host", type=int, default=8,
                    help="politeness budget per host per round")
    ap.add_argument("--shards", type=int, default=8,
                    help="seen-set cuckoo shards")
    ap.add_argument("--buckets", type=int, default=32,
                    help="fetch-index hash buckets")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the last checkpointed round")
    ap.add_argument("--control-plane", choices=["task", "dataset"],
                    default="task",
                    help="distributed-round control plane: 'task' = the "
                         "static co-partitioned task graph (default), "
                         "'dataset' = the Ray Data round loop (A/B twin)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # workers must import the package even when the driver runs
        # outside the repo dir (ray job submit --working-dir covers the
        # cluster case; this covers standalone local runs)
        ray.init(include_dashboard=False, runtime_env={
            "env_vars": {"PYTHONPATH": _REPO + os.pathsep
                         + os.environ.get("PYTHONPATH", "")}})

    import pyarrow.parquet as pq

    from hyperion_crawler_ray.pipelines.frontier import CrawlConfig, crawl

    cfg = CrawlConfig(max_rounds=args.rounds,
                      max_per_host_per_round=args.per_host,
                      n_shards=args.shards, n_buckets=args.buckets,
                      control_plane=args.control_plane)
    seeds = pq.read_table(args.seeds)
    robots = pq.read_table(args.robots)
    summary = crawl(args.pages, args.out, cfg, seeds, robots,
                    resume=args.resume)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
