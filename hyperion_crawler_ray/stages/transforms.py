"""Stateless per-batch transforms (SURVEY.md §2.2, §2.8).

Each function mirrors a reference operator (file:line cited per function)
re-expressed as a vectorized ``map_batches`` stage over zero-copy Arrow.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_NON_NUMERIC_RE = "[^0-9.\\-]"


def normalize_date(ds: rd.Dataset, col: str, out: str) -> rd.Dataset:
    """T-1 ``normalize_date`` (reference api/src/etl/base/transformer.py:61-76):
    timestamp/date column -> canonical '%Y-%m-%d' string, NULL on failure."""

    def f(t: pa.Table) -> pa.Table:
        s = pc.strftime(t.column(col), format="%Y-%m-%d")
        return t.append_column(out, s)

    return ds.map_batches(f, batch_format="pyarrow")


def clean_numeric(ds: rd.Dataset, col: str, out: str) -> rd.Dataset:
    """T-2 ``clean_numeric`` (reference api/src/etl/base/transformer.py:78-95):
    strip currency symbols/commas from a string column, cast to float64,
    NULL on failure."""

    def f(t: pa.Table) -> pa.Table:
        stripped = pc.replace_substring_regex(t.column(col), _NON_NUMERIC_RE, "")
        empty = pc.equal(stripped, "")
        safe = pc.if_else(empty, pa.scalar(None, pa.string()), stripped)
        num = pc.cast(safe, pa.float64(), safe=False)
        return t.append_column(out, num)

    return ds.map_batches(f, batch_format="pyarrow")


def map_fields(ds: rd.Dataset, mapping: dict[str, str]) -> rd.Dataset:
    """T-3/T-4 ``map_fields`` + ``get_nested_value`` (reference
    api/src/etl/base/transformer.py:97-123): projection + rename with
    dotted paths into struct columns (``a.b`` -> pc.struct_field)."""

    def f(t: pa.Table) -> pa.Table:
        cols, names = [], []
        for target, source in mapping.items():
            if "." in source:
                root, *path = source.split(".")
                col = t.column(root)
                for p in path:
                    col = pc.struct_field(col, p)
            else:
                col = t.column(source)
            cols.append(col)
            names.append(target)
        return pa.table(dict(zip(names, cols)))

    return ds.map_batches(f, batch_format="pyarrow")


def pack_struct(ds: rd.Dataset, fields: list[str], out: str,
                drop: bool = True) -> rd.Dataset:
    """Inverse of dotted-path access: pack flat columns into a struct
    column (models the reference's nested ``ohlcv`` record,
    api/src/etl/krx/extractor.py:69-84)."""

    def f(t: pa.Table) -> pa.Table:
        struct = pc.make_struct(*[t.column(c) for c in fields],
                                field_names=fields)
        if drop:
            t = t.drop_columns(fields)
        return t.append_column(out, struct)

    return ds.map_batches(f, batch_format="pyarrow")


def apply_defaults(ds: rd.Dataset, defaults: dict[str, object]) -> rd.Dataset:
    """T-5 ``apply_default_values`` (reference
    api/src/etl/base/transformer.py:125-131): coalesce NULLs per column."""

    def f(t: pa.Table) -> pa.Table:
        for colname, default in defaults.items():
            i = t.schema.get_field_index(colname)
            t = t.set_column(i, colname, pc.fill_null(t.column(colname), default))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def filter_fields(ds: rd.Dataset, allowed: list[str]) -> rd.Dataset:
    """T-6 ``filter_fields`` (reference api/src/etl/base/transformer.py:133-135)."""
    return ds.select_columns(allowed)


def derived_column(ds: rd.Dataset, out: str, fn) -> rd.Dataset:
    """T-7/T-8 derived measures (reference
    api/src/etl/base/transformer.py:144-154): ``fn(table) -> array``,
    vectorized (pyarrow.compute)."""

    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out, fn(t))

    return ds.map_batches(f, batch_format="pyarrow")


def conditional_scale(ds: rd.Dataset, col: str, out: str, threshold: float,
                      factor: float) -> rd.Dataset:
    """T-9 ``normalize_market_cap`` (reference
    api/src/etl/base/transformer.py:156-169): values below ``threshold``
    are unit-rescaled by ``factor``."""

    def f(t: pa.Table) -> pa.Table:
        x = t.column(col)
        scaled = pc.if_else(pc.less(x, threshold),
                            pc.multiply(x, pa.scalar(float(factor))), x)
        return t.append_column(out, scaled)

    return ds.map_batches(f, batch_format="pyarrow")


def normalize_identifier(ds: rd.Dataset, col: str, out: str, *,
                         upper: bool = True, pad_to: int | None = None) -> rd.Dataset:
    """T-10 ``normalize_company_identifier`` (reference
    api/src/etl/base/transformer.py:192-201): upper-case and/or
    zero-pad identifiers."""

    def f(t: pa.Table) -> pa.Table:
        x = pc.cast(t.column(col), pa.string())
        if upper:
            x = pc.utf8_upper(x)
        if pad_to is not None:
            x = pc.utf8_lpad(x, pad_to, "0")
        return t.append_column(out, x)

    return ds.map_batches(f, batch_format="pyarrow")


def filter_expr(ds: rd.Dataset, mask_fn) -> rd.Dataset:
    """T-13/T-17 row-predicate filters (reference
    api/src/etl/krx/transformer.py:197-231, api/src/etl/base/loader.py:228-238):
    vectorized boolean mask inside map_batches (faster than row filter)."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(mask_fn(t))

    return ds.map_batches(f, batch_format="pyarrow")


def validate_split(ds: rd.Dataset, mask_fn) -> tuple[rd.Dataset, rd.Dataset]:
    """S-9 dead-letter routing (reference error rows -> first-10 error
    list + dead_letter_queue config, api/src/etl/base/loader.py:24-59,
    api/src/config/etl_config.yaml:143): rows passing ``mask_fn`` and the
    reject set, as two lazy datasets over the same parent."""
    passed = filter_expr(ds, mask_fn)
    import pyarrow.compute as _pc

    rejected = filter_expr(ds, lambda t: _pc.invert(mask_fn(t)))
    return passed, rejected


def whitelist(ds: rd.Dataset, col: str, allowed: list) -> rd.Dataset:
    """D-4 whitelist intersect (reference api/src/etl/krx/extractor.py:113-115):
    ``pc.is_in`` filter."""
    allowed_arr = pa.array(allowed)
    return filter_expr(ds, lambda t: pc.is_in(t.column(col), value_set=allowed_arr))


def add_metadata(ds: rd.Dataset, constants: dict[str, object]) -> rd.Dataset:
    """T-18 ``add_metadata`` (reference api/src/etl/base/loader.py:211-220):
    stamp constant provenance columns."""

    def f(t: pa.Table) -> pa.Table:
        for name, value in constants.items():
            t = t.append_column(name, pa.array([value] * t.num_rows))
        return t

    return ds.map_batches(f, batch_format="pyarrow")


def categorical_map(ds: rd.Dataset, col: str, out: str,
                    mapping: dict, default=None) -> rd.Dataset:
    """Categorical lookup (reference ``rating_map``,
    api/src/etl/base/transformer.py:212-216): ``pc.index_in`` + take on a
    lookup array — the Arrow-native dict CASE."""
    keys = pa.array(list(mapping.keys()))
    vals = pa.array(list(mapping.values()) + [default])

    def f(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t.column(col), value_set=keys)
        idx = pc.fill_null(idx, len(keys))  # miss -> default slot
        return t.append_column(out, pc.take(vals, idx))

    return ds.map_batches(f, batch_format="pyarrow")


def split_column(ds: rd.Dataset, col: str, out: str, pattern: str = r"\s+",
                 part: int | None = None) -> rd.Dataset:
    """T-19 ``parse_symbols`` (reference api/src/etl/base/extractor.py:126-137):
    regex split; whole list or a single part."""

    def f(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern_regex(pc.utf8_trim_whitespace(t.column(col)),
                                       pattern)
        if part is not None:
            parts = pc.list_element(parts, part)
        return t.append_column(out, parts)

    return ds.map_batches(f, batch_format="pyarrow")
