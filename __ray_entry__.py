"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (nor in hyperion_crawler_ray) calls ``ray.init()``/``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the frontier crawl (SURVEY.md §7) over the
    deterministic sf0.001-scale synthetic page universe — read pages →
    canonicalize → robots gate → cuckoo seen-filter → politeness
    groupby(host) → fetch → extract. Returns the crawled pages Dataset."""
    from hyperion_crawler_ray.pipelines.queries import q_crawl_frontier

    return q_crawl_frontier("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (plus the training-data-scale additions: dedup family, ANN,
    text analysis, multimodal plumbing, crawl pipelines)."""
    from hyperion_crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query (same column
    names, same rounding). Near-dup sketches, ANN variants, multimodal
    and crawl pipelines are rows-only by design."""
    from hyperion_crawler_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
