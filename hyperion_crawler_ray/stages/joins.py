"""Joins & lookups (SURVEY.md §2.4), shuffle-avoiding by default.

Small sides are broadcast once via ``ray.put`` and applied inside
``map_batches`` (reference J-1, the 4-way ticker join of
api/src/etl/krx/extractor.py:64-84, joined driver-side against small
frames). Large-large joins hash-partition both sides on an explicit
bucket count (the portable partitioned hash join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def broadcast_join(ds: rd.Dataset, small: pd.DataFrame, on: str | list[str],
                   how: str = "left") -> rd.Dataset:
    """Left/inner join against a broadcast small side. The small frame is
    put in the object store ONCE; every task reads the same copy
    (zero-copy for numerics) instead of re-shipping per batch."""
    ref = ray.put(small)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return df.merge(rhs, on=on, how=how)

    return ds.map_batches(f, batch_format="pandas")


def semi_join(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """J-2 FK-existence semi-join (reference
    api/src/etl/krx/loader.py:187-193): keep rows whose key exists in the
    broadcast key set. Pure-Arrow: zero-copy blocks + one pc.is_in kernel
    per batch against the one object-store copy of the key set."""
    ref = ray.put(pa.array(sorted(set(keys))))

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ks = ray.get(ref)
        return t.filter(pc.is_in(t.column(col), value_set=ks))

    return ds.map_batches(f, batch_format="pyarrow")


def anti_join(ds: rd.Dataset, col: str, keys) -> rd.Dataset:
    """Negation of J-2 — the reject set (dead-letter side)."""
    ref = ray.put(pa.array(sorted(set(keys))))

    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ks = ray.get(ref)
        hit = pc.is_in(t.column(col), value_set=ks)
        return t.filter(pc.invert(pc.fill_null(hit, False)))

    return ds.map_batches(f, batch_format="pyarrow")


class BloomFilter:
    """Vectorized Bloom filter over uint64 key hashes (double hashing,
    Kirsch-Mitzenmacher): fixed ``n_bits`` bit array packed in uint64
    words, mergeable by OR — the partial-per-batch / reduce shape. At
    default 2^20 bits / k=4 the filter is 128 KiB; sized for ~1e5 keys
    at <2% false-positive rate (fp only costs shuffle bytes, never
    correctness)."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 4,
                 words: np.ndarray | None = None):
        assert n_bits % 64 == 0
        self.n_bits = n_bits
        self.k = k
        self.words = (words if words is not None
                      else np.zeros(n_bits // 64, dtype=np.uint64))

    def _probes(self, h: np.ndarray) -> np.ndarray:
        h = h.astype(np.uint64)
        with np.errstate(over="ignore"):
            h2 = h * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1)
            idx = np.empty((self.k, len(h)), dtype=np.uint64)
            for i in range(self.k):
                idx[i] = (h + np.uint64(i) * h2) % np.uint64(self.n_bits)
        return idx

    def add_hashes(self, h: np.ndarray) -> None:
        for row in self._probes(h):
            np.bitwise_or.at(self.words, (row >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (row & np.uint64(63)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        hit = np.ones(len(h), dtype=bool)
        for row in self._probes(h):
            w = self.words[(row >> np.uint64(6)).astype(np.int64)]
            hit &= (w >> (row & np.uint64(63))) & np.uint64(1) != 0
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        return BloomFilter(self.n_bits, self.k, self.words | other.words)


def build_bloom(ds: rd.Dataset, on: list[str] | str,
                n_bits: int = 1 << 20, k: int = 4) -> BloomFilter:
    """Build a Bloom filter of a dataset's join keys: one fixed-size
    partial per BLOCK leaves each task (n_bits/8 bytes, independent of
    rows), OR-reduced on the driver — driver traffic is O(blocks), not
    O(keys)."""
    on = [on] if isinstance(on, str) else list(on)

    def partial(t: pa.Table) -> pa.Table:
        bf = BloomFilter(n_bits, k)
        bf.add_hashes(_key_hash(t, on))
        return pa.table({"words": pa.array([bf.words.tobytes()],
                                           pa.binary())})

    acc = BloomFilter(n_bits, k)
    for batch in ds.map_batches(partial, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
        for raw in batch.column("words").to_pylist():
            acc = acc.merge(BloomFilter(
                n_bits, k, np.frombuffer(raw, dtype=np.uint64).copy()))
    return acc


def bloom_prune(ds: rd.Dataset, on: list[str] | str,
                bloom: BloomFilter) -> rd.Dataset:
    """Drop rows whose key is definitely absent from ``bloom`` (one
    broadcast object-store copy; per-batch vectorized membership). Only
    sound where dropping non-matching rows preserves semantics (inner /
    semi joins)."""
    on = [on] if isinstance(on, str) else list(on)
    ref = ray.put(bloom)

    def f(t: pa.Table) -> pa.Table:
        bf = ray.get(ref)
        return t.filter(pa.array(bf.contains_hashes(_key_hash(t, on))))

    return ds.map_batches(f, batch_format="pyarrow")


def _key_hash(t: pa.Table, on: list[str]) -> np.ndarray:
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in on:
            h = h * np.uint64(1000003) + pd.util.hash_array(
                t.column(c).to_numpy(zero_copy_only=False))
    return h


def detect_hot_keys(ds: rd.Dataset, col: str, sample_frac: float = 0.05,
                    threshold: float = 0.01, seed: int = 0,
                    top_per_batch: int = 64) -> list:
    """Sampling-based skew probe for `hash_join(hot_keys=...)`: return
    key values holding more than ``threshold`` of a seeded sample.
    Driver traffic is bounded at ``top_per_batch`` (value, count) rows
    per sampled block — a truly hot key is by definition inside every
    block's top — never the sample itself."""
    import pyarrow.compute as pc

    def top_counts(t: pa.Table) -> pa.Table:
        vc = t.select([col]).group_by(col).aggregate([(col, "count")])
        vc = vc.rename_columns([col, "cnt"])
        order = pc.select_k_unstable(
            vc, k=min(top_per_batch, vc.num_rows),
            sort_keys=[("cnt", "descending")])
        return vc.take(order)

    sampled = ds.random_sample(sample_frac, seed=seed) if sample_frac < 1.0 \
        else ds
    parts = sampled.map_batches(top_counts, batch_format="pyarrow") \
                   .to_pandas()
    if len(parts) == 0:
        return []
    counts = parts.groupby(col, sort=False)["cnt"].sum()
    total = counts.sum()
    return counts[counts > threshold * total].index.tolist()


def hash_join(left: rd.Dataset, right: rd.Dataset, on: str | list[str],
              num_partitions: int = 16, how: str = "inner",
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None,
              hot_keys=None, salt: int = 8,
              prefilter: str | None = None) -> rd.Dataset:
    """Partitioned hash join for two LARGE sides: bucket both on
    ``hash(key) % B`` (B explicit), co-group, Arrow-native join per
    bucket. The groupby is the one unavoidable all-to-all.

    Skew: pass ``hot_keys`` (e.g. from `detect_hot_keys`) to spread each
    hot key's LEFT rows over ``salt`` sub-buckets and replicate only the
    hot RIGHT rows ``salt``× — the classic salted join, so one hot key
    no longer serializes into a single straggler task. Single-column
    keys only (the common skew shape).

    Schema stability: both sides are unioned under ONE explicit Arrow
    schema (each side's missing columns appended as typed nulls), so no
    block ever changes dtype mid-stream (a pandas union silently coerced
    int64 key columns to float64 via NaN fill) and per-bucket splits
    recover each side by its captured column list — an all-null column
    inside one bucket survives intact."""
    on = [on] if isinstance(on, str) else list(on)
    # normalize to Arrow blocks first: schema() on a pandas-blocked
    # upstream yields a PandasBlockSchema, not a pa.Schema. Callers that
    # know their schemas statically should pass them — a schema() fetch
    # on a lazy shuffle-bearing upstream triggers an extra execution.
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = left_schema or left.schema().base_schema
    r_schema = right_schema or right.schema().base_schema
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - set(on)
    if overlap:
        raise ValueError(f"hash_join: non-key column collision {overlap}; "
                         "rename before joining")
    join_types = {"inner": "inner", "left": "left outer",
                  "right": "right outer", "outer": "full outer"}
    if how not in join_types:
        raise ValueError(f"hash_join: unsupported how={how!r}")
    if hot_keys is not None and len(on) != 1:
        raise ValueError("hash_join: hot-key salting supports single-column "
                         "keys only")
    if hot_keys and how in ("right", "outer"):
        # a replicated unmatched hot right row would surface salt× in a
        # right/full outer result — salting is inner/left only
        raise ValueError("hash_join: hot-key salting is incompatible with "
                         f"how={how!r}")
    join_type = join_types[how]
    if prefilter == "bloom":
        # shuffle-volume reducer for selective INNER joins: a Bloom
        # filter of the right keys (fixed-size partial per block,
        # OR-reduce) prunes non-matching left rows BEFORE the all-to-all
        # — at a 1% match rate this drops ~99% of left shuffle bytes for
        # one extra pass over the (smaller) right side. False positives
        # only cost bytes; the in-bucket join still decides membership.
        if how != "inner":
            raise ValueError("hash_join: bloom prefilter is only sound for "
                             "inner joins (pruned left rows would vanish "
                             f"from a {how!r} result)")
        right = right.materialize()  # consumed twice: bloom + join
        left = bloom_prune(left, on, build_bloom(right, on))
    out = _bucketed_join(left, right, on, l_cols, r_cols, l_schema, r_schema,
                         num_partitions, join_type, r_select=r_cols,
                         hot_keys=list(hot_keys) if hot_keys else None,
                         salt=salt)
    return out


def semi_join_large(left: rd.Dataset, right: rd.Dataset, on: str | list[str],
                    how: str = "semi", num_partitions: int = 16,
                    left_schema: pa.Schema | None = None,
                    right_schema: pa.Schema | None = None) -> rd.Dataset:
    """Distributed semi/anti join for a LARGE right side (S-8 'update'
    gate at scale): bucket both sides on the key hash, per bucket keep
    left rows whose key does (semi) / does not (anti) appear among the
    right side's keys. Unlike ``semi_join``/``anti_join`` (broadcast key
    set), nothing is collected to the driver — the right side's key set
    can be O(dataset)."""
    on = [on] if isinstance(on, str) else list(on)
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t.select(on), batch_format="pyarrow")
    l_schema = left_schema or left.schema().base_schema
    r_schema = right_schema or right.schema().base_schema
    r_schema = pa.schema([r_schema.field(c) for c in on])
    join_type = "left semi" if how == "semi" else "left anti"
    return _bucketed_join(left, right, on, list(l_schema.names), on,
                          l_schema, r_schema, num_partitions, join_type,
                          r_select=on)


def _co_group(lt: rd.Dataset, rt: rd.Dataset, n_buckets: int,
              fn, empty_schema: pa.Schema) -> rd.Dataset:
    """Per-bucket co-group of the tagged union. LAZY groupby shuffle on
    purpose: joins sit inside one-shot lazy query pipelines, where the
    streaming sort-shuffle fuses into a single execution — measured
    (round 4, interleaved A/B at sf0.1) 1.2-2x faster per query than
    the eager hash exchange, which pays an extra full materialization
    of the tagged union per join. (The exchange variant remains the
    right call for already-materialized, reused inputs — the crawl's
    admit/select loop uses it.)"""
    from .exchange import co_locate

    def part_fn(t: pa.Table | None) -> pa.Table:
        if t is None:
            return empty_schema.empty_table()
        return fn(t)

    return co_locate(lt.union(rt), "__bucket", n_buckets, part_fn)


def _bucketed_join(left: rd.Dataset, right: rd.Dataset, on: list[str],
                   l_cols: list[str], r_cols: list[str],
                   l_schema: pa.Schema, r_schema: pa.Schema,
                   num_partitions: int, join_type: str,
                   r_select: list[str], hot_keys: list | None = None,
                   salt: int = 1) -> rd.Dataset:
    """Shared core: tag both sides under ONE unified Arrow schema (typed
    nulls for the other side's columns — schema-stable across blocks,
    no pandas NaN dtype coercion), shuffle on the explicit bucket, and
    run the Arrow hash join inside each bucket.

    With ``hot_keys``: a hot key's left rows round-robin over ``salt``
    sub-buckets; its right rows are appended once per sub-bucket, so
    every (key, sub-bucket) pair still co-locates. Non-hot rows keep
    sub-bucket 0 — correctness is unchanged for any assignment."""
    salted = bool(hot_keys) and salt > 1
    hot_arr = pa.array(sorted(set(hot_keys))) if salted else None
    unified = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_cols if c not in l_cols]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            h = _key_hash(t, on)
            bucket = (h % num_partitions).astype(np.int64)
            if salted:
                hot = pc.fill_null(
                    pc.is_in(t.column(on[0]), value_set=hot_arr),
                    False).to_numpy(zero_copy_only=False)
                sub = np.zeros(t.num_rows, np.int64)
                if side == 0:
                    sub[hot] = np.arange(int(hot.sum())) % salt
                bucket = bucket * salt + sub
                if side == 1 and hot.any():
                    # replicate hot right rows into sub-buckets 1..salt-1
                    hot_t = t.filter(pa.array(hot))
                    hot_b = bucket[hot]
                    t = pa.concat_tables([t] + [hot_t] * (salt - 1))
                    bucket = np.concatenate(
                        [bucket] + [hot_b + s for s in range(1, salt)])
            arrays = []
            for field in unified:
                if field.name == "__bucket":
                    arrays.append(pa.array(
                        bucket.astype(np.int32), pa.int32()))
                elif field.name == "__side":
                    arrays.append(pa.array(
                        np.full(len(bucket), side, np.int8), pa.int8()))
                elif field.name in t.column_names:
                    arrays.append(t.column(field.name).cast(field.type))
                else:
                    arrays.append(pa.nulls(len(bucket), field.type))
            return pa.Table.from_arrays(arrays, schema=unified)
        return f

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")

    l_target = pa.schema([unified.field(c) for c in l_cols])
    r_target = pa.schema([unified.field(c) for c in r_select])
    if join_type in ("left semi", "left anti"):
        result_schema = l_target
    else:
        result_schema = pa.schema(
            [unified.field(c) for c in l_cols]
            + [unified.field(c) for c in r_select if c not in on])

    def merge_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or "__side" not in t.column_names:
            # degenerate empty group block (can arrive schema-less)
            return result_schema.empty_table()
        side = t.column("__side")
        # cast to the unified types: an all-empty side can drift to
        # Arrow `null` through empty-block concatenation, which the
        # Arrow join rejects for non-key fields
        lt_ = t.filter(pc.equal(side, 0)).select(l_cols).cast(l_target)
        rt_ = t.filter(pc.equal(side, 1)).select(r_select).cast(r_target)
        if join_type in ("left semi", "left anti") and len(on) == 1:
            # membership mask instead of the acero join: semi/anti only
            # needs the key SET, and acero rejects list/binary non-key
            # payload fields ("not supported in join non-key field") —
            # this path carries any left payload. SQL null semantics
            # preserved: null keys never match (semi drops, anti keeps).
            vals = rt_.column(on[0]).combine_chunks().drop_null()
            m = pc.is_in(lt_.column(on[0]), value_set=vals)
            if join_type == "left anti":
                m = pc.fill_null(pc.invert(m), True)
            else:
                m = pc.fill_null(m, False)
            out = lt_.filter(m)
        else:
            out = lt_.join(rt_, keys=on, join_type=join_type)
        # pin column order to the declared result schema (outer joins
        # can emit a different order than the empty-block schema)
        return out.select(result_schema.names).cast(result_schema)

    return _co_group(lt, rt, num_partitions * (salt if salted else 1),
                     merge_bucket, result_schema)


def asof_join(left: rd.Dataset, right: rd.Dataset, key: str, ts: str,
              num_partitions: int = 16,
              direction: str = "backward",
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None) -> rd.Dataset:
    """Distributed AS-OF join: for each left row, attach the latest
    right row with ``right.ts <= left.ts`` for the same ``key``
    (direction="forward" flips to earliest-at-or-after). Ray Data has no
    such operator; this composes it as hash-partition both sides on the
    key -> co-group -> per-bucket ``pd.merge_asof`` over ts-sorted
    frames.

    Partitioning assumption (documented per SURVEY §7): a key's rows
    must fit one task's memory — size ``num_partitions`` so the largest
    bucket does; hot keys should be pre-aggregated or range-split by the
    caller (an as-of match never crosses keys, so bucketing by key hash
    is lossless)."""
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = left_schema or left.schema().base_schema
    r_schema = right_schema or right.schema().base_schema
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {key, ts}
    if overlap:
        raise ValueError(f"asof_join: non-key column collision {overlap}; "
                         "rename before joining")
    unified = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_cols if c not in (key, ts)]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def tag(side: int, cols: list[str]):
        def f(t: pa.Table) -> pa.Table:
            h = _key_hash(t, [key])
            arrays = []
            for field in unified:
                if field.name == "__bucket":
                    arrays.append(pa.array(
                        (h % num_partitions).astype(np.int32), pa.int32()))
                elif field.name == "__side":
                    arrays.append(pa.array(
                        np.full(t.num_rows, side, np.int8), pa.int8()))
                elif field.name in t.column_names:
                    arrays.append(t.column(field.name).cast(field.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, field.type))
            return pa.Table.from_arrays(arrays, schema=unified)
        return f

    lt = left.map_batches(tag(0, l_cols), batch_format="pyarrow")
    rt = right.map_batches(tag(1, r_cols), batch_format="pyarrow")
    out_schema = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_cols if c not in (key, ts)])
    r_val_cols = [c for c in r_cols if c not in (key, ts)]

    def merge_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or "__side" not in t.column_names:
            return out_schema.empty_table()
        side = t.column("__side")
        ldf = t.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
        rdf = t.filter(pc.equal(side, 1)).select(
            [key, ts] + r_val_cols).to_pandas()
        if len(ldf) == 0:
            return out_schema.empty_table()
        ldf = ldf.sort_values([ts, key], kind="mergesort")
        rdf = rdf.sort_values([ts, key], kind="mergesort")
        if len(rdf) == 0:
            for c in r_val_cols:
                ldf[c] = None
            merged = ldf
        else:
            merged = pd.merge_asof(ldf, rdf, on=ts, by=key,
                                   direction=direction)
        return pa.Table.from_pandas(
            merged, preserve_index=False).select(
            out_schema.names).cast(out_schema)

    return _co_group(lt, rt, num_partitions, merge_bucket, out_schema)


def range_join(left: rd.Dataset, right: rd.Dataset, key: str,
               left_val: str, right_lo: str, right_hi: str,
               num_partitions: int = 16,
               left_schema: pa.Schema | None = None,
               right_schema: pa.Schema | None = None) -> rd.Dataset:
    """Distributed RANGE join: attach every right row whose
    ``[right_lo, right_hi]`` interval contains the left row's
    ``left_val``, per ``key`` (inner semantics: unmatched left rows
    drop). Composed as key-hash co-group -> per-bucket interval probe
    (np.searchsorted over the bucket's interval starts + containment
    filter).

    Partitioning assumption: one key's rows and intervals must fit a
    task's memory (size ``num_partitions`` accordingly); intervals of
    DIFFERENT keys never match, so key-hash bucketing is lossless."""
    left = left.map_batches(lambda t: t, batch_format="pyarrow")
    right = right.map_batches(lambda t: t, batch_format="pyarrow")
    l_schema = left_schema or left.schema().base_schema
    r_schema = right_schema or right.schema().base_schema
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    overlap = (set(l_cols) & set(r_cols)) - {key}
    if overlap:
        raise ValueError(f"range_join: non-key column collision {overlap}; "
                         "rename before joining")
    unified = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_cols if c != key]
        + [pa.field("__bucket", pa.int32()), pa.field("__side", pa.int8())]
    )

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            h = _key_hash(t, [key])
            arrays = []
            for field in unified:
                if field.name == "__bucket":
                    arrays.append(pa.array(
                        (h % num_partitions).astype(np.int32), pa.int32()))
                elif field.name == "__side":
                    arrays.append(pa.array(
                        np.full(t.num_rows, side, np.int8), pa.int8()))
                elif field.name in t.column_names:
                    arrays.append(t.column(field.name).cast(field.type))
                else:
                    arrays.append(pa.nulls(t.num_rows, field.type))
            return pa.Table.from_arrays(arrays, schema=unified)
        return f

    lt = left.map_batches(tag(0), batch_format="pyarrow")
    rt = right.map_batches(tag(1), batch_format="pyarrow")
    r_val_cols = [c for c in r_cols if c != key]
    out_schema = pa.schema(
        [l_schema.field(c) for c in l_cols]
        + [r_schema.field(c) for c in r_val_cols])

    def merge_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or "__side" not in t.column_names:
            return out_schema.empty_table()
        side = t.column("__side")
        ldf = t.filter(pc.equal(side, 0)).select(l_cols).to_pandas()
        rdf = t.filter(pc.equal(side, 1)).select(
            [key] + r_val_cols).to_pandas()
        if len(ldf) == 0 or len(rdf) == 0:
            return out_schema.empty_table()
        # per key: probe each left value into the key's sorted interval
        # starts, then brute-filter the candidate window by containment
        out_parts = []
        rgroups = dict(tuple(rdf.groupby(key, sort=False).__iter__()))
        for k, lg in ldf.groupby(key, sort=False):
            rg = rgroups.get(k)
            if rg is None:
                continue
            rg = rg.sort_values(right_lo, kind="mergesort")
            lo = rg[right_lo].to_numpy()
            hi = rg[right_hi].to_numpy()
            vals = lg[left_val].to_numpy()
            # candidate: every interval with lo <= val; prune by hi >= val
            hi_idx = np.searchsorted(lo, vals, side="right")
            li_list, ri_list = [], []
            for i, (v, n_cand) in enumerate(zip(vals, hi_idx)):
                cand = np.nonzero(hi[:n_cand] >= v)[0]
                li_list.extend([i] * len(cand))
                ri_list.extend(cand.tolist())
            if not li_list:
                continue
            merged = pd.concat(
                [lg.iloc[np.asarray(li_list)].reset_index(drop=True),
                 rg.iloc[np.asarray(ri_list)][r_val_cols]
                 .reset_index(drop=True)], axis=1)
            out_parts.append(merged)
        if not out_parts:
            return out_schema.empty_table()
        merged = pd.concat(out_parts, ignore_index=True)
        return pa.Table.from_pandas(
            merged, preserve_index=False).select(
            out_schema.names).cast(out_schema)

    return _co_group(lt, rt, num_partitions, merge_bucket, out_schema)
