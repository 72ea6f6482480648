"""Cluster job entrypoint for post-crawl corpus curation (fuzzy dedup).

    ray job submit --working-dir . -- \
        python tools/dedup_job.py --crawl /data/crawl \
            --out /data/crawl_deduped [--threshold 0.5]

Runs ``pipelines/postprocess.py::dedup_crawled_pages`` over a finished
crawl's pages: stored per-page MinHash signatures -> LSH banding ->
Jaccard verification -> connected-component closure -> keep the
earliest-crawled page per duplicate cluster, writing the kept pages as
partitioned parquet. Same guarded ``ray.init`` convention as
``tools/crawl_job.py`` — inside ``ray job submit`` the driver joins the
job's cluster; standalone it auto-sizes to the box.
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
    ap.add_argument("--crawl", required=True,
                    help="finished crawl output dir (score_pages crawls)")
    ap.add_argument("--out", required=True,
                    help="deduplicated pages parquet output dir")
    ap.add_argument("--threshold", type=float, default=0.5,
                    help="Jaccard threshold for a verified duplicate pair")
    ap.add_argument("--bands", type=int, default=16,
                    help="LSH bands over the stored 64-perm signatures")
    ap.add_argument("--partitions", type=int, default=8,
                    help="hash-join / anti-join partition count")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # workers must import the package even when the driver runs
        # outside the repo dir (ray job submit --working-dir covers the
        # cluster case; this covers standalone local runs)
        ray.init(include_dashboard=False, runtime_env={
            "env_vars": {"PYTHONPATH": _REPO + os.pathsep
                         + os.environ.get("PYTHONPATH", "")}})

    from hyperion_crawler_ray.pipelines.postprocess import dedup_crawled_pages

    kept = dedup_crawled_pages(args.crawl, threshold=args.threshold,
                               bands=args.bands,
                               num_partitions=args.partitions,
                               write_to=args.out)
    print(json.dumps({"kept_pages": kept.count(), "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
