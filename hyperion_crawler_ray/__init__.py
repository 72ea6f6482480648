"""hyperion_crawler_ray — a brand-new Ray-Data-native data-processing engine.

Re-derives the capabilities of the reference ETL service
(`fount-hyperion/hyperion_crawler`, surveyed in /root/repo/SURVEY.md) as a
URL-frontier + fetch scheduler and a relational operator library expressed
Ray-Data-first: ``ray.data.Dataset`` pipelines of ``map_batches`` over
zero-copy Arrow, stateful actor pools for the URL-seen filter and politeness
budgets, ``groupby(host)`` shuffles for frontier expansion, and partitioned
Parquet checkpoints for exact resume.

Layout:
- ``functions/``  pure scalar/batch functions (URL canonicalization, HTML
  text extraction, text statistics) — deterministic, versioned.
- ``stages/``     Dataset -> Dataset operator library (transforms, joins,
  aggregates, dedup, ANN, multimodal plumbing).
- ``sources/``    readers/writers (pruned parquet reads, snapshot merge
  sinks implementing insert/upsert/replace/append).
- ``state/``      stateful actors (cuckoo-filter seen shards, politeness,
  robots gate).
- ``pipelines/``  end-to-end pipelines (frontier crawl loop, oracle
  single-threaded reference, driver-facing query registry).
"""

__version__ = "0.1.0"
