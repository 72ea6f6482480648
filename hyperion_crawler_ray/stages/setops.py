"""Distributed distinct set operations (INTERSECT / EXCEPT) — the
reference's whitelist-intersect (SURVEY §2.7 D-4) generalized to
arbitrary two-dataset set algebra, Ray-Data-first.

Shape: tag each side with a presence bit, union the (cheap, column-
pruned) streams, then ONE groupby over the key columns with Max
aggregates on the bits — a single all-to-all instead of a join, and the
combiner pre-aggregates duplicate keys inside each block before the
shuffle. Works at any key cardinality because no side is ever collected
or broadcast.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max


def _tagged(ds: rd.Dataset, cols: list[str], a: int, b: int) -> rd.Dataset:
    def f(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        n = t.num_rows
        return t.append_column("__a", pa.array([a] * n, pa.int8())) \
                .append_column("__b", pa.array([b] * n, pa.int8()))

    return ds.map_batches(f, batch_format="pyarrow")


def _presence(left: rd.Dataset, right: rd.Dataset,
              cols: list[str]) -> rd.Dataset:
    both = _tagged(left, cols, 1, 0).union(_tagged(right, cols, 0, 1))
    return both.groupby(cols).aggregate(Max("__a", alias_name="__in_a"),
                                        Max("__b", alias_name="__in_b"))


def intersect_distinct(left: rd.Dataset, right: rd.Dataset,
                       cols: list[str]) -> rd.Dataset:
    """Distinct keys present in BOTH datasets (SQL INTERSECT)."""
    pres = _presence(left, right, cols)

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.equal(t.column("__in_a"), 1),
                       pc.equal(t.column("__in_b"), 1))
        return t.filter(keep).select(cols)

    return pres.map_batches(f, batch_format="pyarrow")


def except_distinct(left: rd.Dataset, right: rd.Dataset,
                    cols: list[str]) -> rd.Dataset:
    """Distinct keys in ``left`` and NOT in ``right`` (SQL EXCEPT)."""
    pres = _presence(left, right, cols)

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.and_(pc.equal(t.column("__in_a"), 1),
                       pc.equal(t.column("__in_b"), 0))
        return t.filter(keep).select(cols)

    return pres.map_batches(f, batch_format="pyarrow")
