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
    if not isinstance(tbl, pa.Table):
        # Ray 2.49 passes fully-EMPTY pandas blocks through map
        # operators without invoking the UDF, so the arrow-normalizing
        # identity map upstream cannot catch them (observed: an empty
        # groupby().map_groups output block)
        import pandas as pd

        assert isinstance(tbl, pd.DataFrame), type(tbl)
        # strip the b'pandas' schema metadata from_pandas attaches — a
        # schema WITH metadata is unhashable and defeats Ray's
        # unify_schemas early-exit on every downstream block merge
        tbl = pa.Table.from_pandas(tbl, preserve_index=False) \
            .replace_schema_metadata(None)
    if col not in tbl.schema.names:
        if tbl.num_rows == 0:
            # Ray 2.49 artifact: repartition of an empty dataset emits
            # schema-LESS zero-row blocks (found by the hypothesis
            # layout property test); they carry nothing to partition
            out = tuple(tbl.slice(0, 0) for _ in range(n))
            return out if n > 1 else out[0]
        raise KeyError(f"exchange partition column {col!r} missing from "
                       f"block schema {tbl.schema.names}")
    v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
    if len(v) and (v.min() < 0 or v.max() >= n):
        # out-of-range ids would silently vanish in the searchsorted
        # bounds below — fail loud instead of dropping rows
        raise ValueError(
            f"exchange partition column {col!r} out of range: "
            f"[{v.min()}, {v.max()}] not within [0, {n})")
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
        # empty partition: hand fn a TYPED zero-row slice of the input
        # schema — a pandas/arrow per-partition fn then produces typed
        # empty output without a separate empty-case path. Prefer a
        # piece that actually HAS columns (schema-less zero-row blocks
        # exist after an empty repartition — see _split_task); when no
        # piece anywhere is typed, fall back to fn(None), the documented
        # whole-dataset-empty contract.
        typed = next((p for p in pieces
                      if p is not None and p.num_columns), None)
        return fn(typed.slice(0, 0) if typed is not None else None)
    return fn(pa.concat_tables(live, promote_options="default"))


def coalesce_tiny(mat, rows_per_block: int = 8192):
    """Tiny-block coalesce: small inputs arrive as dozens of ~1k-row
    blocks (read parallelism targets cores, not rows), and the exchange
    pays per (block x partition) intermediate object. At scale blocks
    are large and this is a no-op; when blocks are pathologically small
    it collapses them so object count stays sane."""
    nb, n = mat.num_blocks(), mat.count()
    tgt = max(1, min(nb, n // rows_per_block + 1))
    if nb > 2 * tgt:
        return mat.repartition(tgt).materialize()
    return mat


def _pd_partition(f: Callable[["pd.DataFrame"], "pd.DataFrame"]):
    """Adapt a pandas per-group fn (the ``map_groups`` style already
    used across the stages) to the exchange's Arrow contract."""
    import pandas as pd

    def g(t: pa.Table | None) -> pa.Table:
        df = pd.DataFrame() if t is None else t.to_pandas()
        # metadata-free schema: keeps downstream unify_schemas hashable
        return pa.Table.from_pandas(f(df), preserve_index=False) \
            .replace_schema_metadata(None)

    return g


def co_locate(ds: rd.Dataset, part_col: str, n_parts: int,
              fn: Callable[[pa.Table | None], pa.Table]) -> rd.Dataset:
    """LAZY co-location with ``exchange_map``'s fn contract, on the
    sort-based groupby shuffle. Measured trade (round 4, interleaved
    same-process A/B at sf0.1): for ONE-SHOT lazy pipelines — the
    operator suite — the streaming groupby beats the eager exchange
    1.5-3x per query, because the exchange pays a full extra input
    materialization per call while the groupby fuses into the single
    streaming execution. The exchange wins where its input is ALREADY
    materialized and its output is consumed repeatedly (the crawl's
    admit/select round loop: measured +600 pps in round 3, and SemDeDup
    cluster co-location). Pick per call site; both take the same
    partition fn (here it only ever sees non-empty groups, plus Ray
    2.49's occasional empty pandas block, which every in-repo fn
    guards). Shares ``exchange_map``'s fail-loud contract: a partition
    id outside [0, n_parts) raises instead of silently flowing through
    (ADVICE round 4 — the two variants are swap-in interchangeable)."""

    def checked(t):
        if isinstance(t, pa.Table) and part_col in t.schema.names \
                and t.num_rows:
            v = t.column(part_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            if v.min() < 0 or v.max() >= n_parts:
                raise ValueError(
                    f"co_locate partition column {part_col!r} out of "
                    f"range: [{v.min()}, {v.max()}] not within "
                    f"[0, {n_parts})")
        return fn(t)

    return ds.groupby(part_col).map_groups(checked, batch_format="pyarrow")


def exchange_map(ds: rd.Dataset, part_col: str, n_parts: int,
                 fn: Callable[[pa.Table | None], pa.Table]) -> rd.Dataset:
    """Run ``fn`` once per partition over all rows whose ``part_col``
    equals that partition id. For an empty partition ``fn`` receives a
    typed zero-row table (input schema); only when the whole dataset
    has no blocks does it receive ``None``. It must return a (possibly
    empty) Arrow table — the per-group contract of
    ``groupby().map_groups`` without the sort-based shuffle.
    """
    # normalize to Arrow blocks first (fuses with the upstream map): a
    # pandas-blocked upstream would hand _split_task DataFrames
    mat = coalesce_tiny(
        ds.map_batches(lambda t: t, batch_format="pyarrow").materialize())
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
