"""Direct hash exchange: co-locate rows by a small-cardinality integer
partition column WITHOUT a sort-based shuffle.

``Dataset.groupby(key)`` in Ray 2.49 pays a sample + range-sort + reduce
exchange to achieve what a fixed-width hash partition needs: every row
with the same key in one task. When the partition id is already a small
dense integer (a k-means cluster id, a seen-filter shard, a bucket
hash), the sort is pure overhead — measured 2-12 s of fixed cost per
execution on this box regardless of data size (the admit stage of the
crawl and the SemDeDup pair stage both hit it).

The exchange here is two task layers on raw Ray core, the idiomatic
escape hatch the Ray Data docs point to when the Dataset API can't
express a fixed partitioning:

    block --(split task, num_returns=n)--> n zero-copy slices
    partition p <--(merge task)-- slice p of every block

Intermediate object count is blocks x n, identical to any shuffle; each
merge task fetches ONLY its partition's bytes. Ordering inside a
partition is block order then row order (stable argsort), so downstream
per-partition functions see a deterministic, layout-reproducible row
order.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _split_task(tbl: pa.Table, col: str, n: int):
    """Partition one block by its integer ``col`` (values in [0, n))
    into ``n`` zero-copy slices via stable argsort + searchsorted."""
    v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v, kind="stable")
    t2 = tbl.take(pa.array(order))
    bounds = np.searchsorted(v[order], np.arange(n + 1))
    out = tuple(t2.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                for k in range(n))
    return out if n > 1 else out[0]


@ray.remote
def _merge_task(fn, *pieces: pa.Table) -> pa.Table:
    live = [p for p in pieces if p is not None and p.num_rows]
    if not live:
        return fn(None)
    return fn(pa.concat_tables(live, promote_options="default"))


def exchange_map(ds: rd.Dataset, part_col: str, n_parts: int,
                 fn: Callable[[pa.Table | None], pa.Table]) -> rd.Dataset:
    """Run ``fn`` once per partition over all rows whose ``part_col``
    equals that partition id. ``fn`` receives ``None`` for an empty
    partition and must return a (possibly empty) typed Arrow table —
    the per-group contract of ``groupby().map_groups`` without the sort.
    """
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    if not refs:
        return rd.from_arrow(fn(None))
    splits = [_split_task.options(num_returns=n_parts)
              .remote(ref, part_col, n_parts) for ref in refs]
    if n_parts == 1:
        splits = [[s] for s in splits]
    merged = [_merge_task.remote(fn, *[sp[k] for sp in splits])
              for k in range(n_parts)]
    return rd.from_arrow_refs(merged)
