"""Pruned readers (SURVEY.md §2.1 S-1/S-3).

Column pruning + row-group predicate pushdown at the read — the S-3
date-range extract (reference api/src/etl/dart/extractor.py:19-50,
``get_filing_date_range`` api/src/etl/base/extractor.py:102-117) becomes
a pyarrow dataset filter expression passed to ``read_parquet`` so only
matching row groups leave storage.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.dataset as pads
import ray.data as rd


def _strip_meta(t: pa.Table) -> pa.Table:
    return t.replace_schema_metadata(None)


def strip_schema_metadata(ds: rd.Dataset) -> rd.Dataset:
    """Drop the ``b'pandas'`` schema metadata parquet readers attach to
    every Arrow block. A ``pa.Schema`` that carries metadata is
    UNHASHABLE (the metadata dict poisons ``hash(schema)``), so Ray's
    block-merge schema deduplication (`transform_pyarrow.unify_schemas`
    early-exit on ``set(schemas)``) fails on every unify downstream of a
    parquet read whose UDFs preserve the input schema — each sort/union/
    groupby merge then logs "Failed to hash the schemas" per worker and
    pays the full unify scan. Zero-copy (schema-only view), fused into
    the read stage, ``batch_size=None`` so blocks pass through whole."""
    return ds.map_batches(_strip_meta, batch_format="pyarrow",
                          batch_size=None)


def read_date_range(path: str, ts_col: str, start, end,
                    columns: list[str] | None = None) -> rd.Dataset:
    """Rows with ``start <= ts_col < end``; filter pushed to the scan."""
    expr = (pads.field(ts_col) >= start) & (pads.field(ts_col) < end)
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns, filter=expr))


def read_keyed(path: str, key_col: str, values: list,
               columns: list[str] | None = None) -> rd.Dataset:
    """Key-whitelist scan (D-4 at the read instead of post-filter)."""
    expr = pads.field(key_col).isin(values)
    return strip_schema_metadata(
        rd.read_parquet(path, columns=columns, filter=expr))
