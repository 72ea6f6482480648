"""Task-graph control plane for the frontier crawl (round 5).

The round-4 scaling record pinned the residual 4/16-cpu inefficiency on
per-round FIXED latency: the Dataset-based round loop (`frontier._run_round`)
pays ~8-10 streaming-executor launches per round (selection exchange, seq
sort, extract pipeline, metrics pass, pages write, admit exchange, union
materialize, repartition, checkpoint write), each costing a fixed 0.2-1 s
regardless of data size, times 7 sequential BFS rounds. The same diagnosis
on connected components was fixed in round 4 by a statically co-partitioned
task graph (stages/components.py — 72x); this module applies that pattern
to the crawl control plane.

Shape:

- The pending frontier lives ACROSS rounds as ``P = cfg.host_buckets``
  host-hash-partitioned Arrow tables in the object store (pieces). ``host``
  is the politeness-selection key, so selection is a purely LOCAL per-bucket
  task — and a bucket's deferred rows are returned as a ref that feeds the
  next round without ever moving.
- One round is raw-task layers only (NO Dataset execution anywhere):
    1. select: P tasks (per-host top-budget, vectorized cumcount) ->
       (selected, deferred, meta{counts + sort-key samples});
       hub-host buckets switch to a salted two-stage (partial top-b per
       salt group, then final per host — result provably equal, and
       detection is EXACT here because a host's rows are co-located).
    2. crawl order: a raw-task sample sort by (-priority, hash_hex) —
       driver merges the bounded key samples into R-1 range splitters,
       R range-merge tasks sort exactly, per-range offsets stamp the
       global seq and write the order log (reuses frontier._block_add_seq).
    3. fetch: per-bucket co-partitioned join against the disk-bucketed
       pages index (reuses frontier._fetch_bucket_local / row-group
       pruning), split into ~1024-row slices for extract parallelism.
    4. extract: one task per slice — fetch/extract/score under the retry
       policy, WRITES its pages-parquet part, computes its per-bucket
       fetch-metrics partial, explodes+canonicalizes links, pre-dedups,
       and splits candidates by seen-shard (num_returns = 1 + n_shards).
    5. admit+route (fused, one task per shard): the same global dedup
       winner rule, robots gate, and ONE sorted check_and_insert call
       per shard per round (the determinism contract of state/seen),
       then the admitted rows split by hash(host) in the same task.
    6. finalize: per-bucket
       finalize task concats deferred + new, writes the frontier_next
       checkpoint part, and returns (piece, count) for the next round.

Only bounded control data reaches the driver: per-bucket counts, ≤33 key
samples per bucket, per-range counts, per-slice metric partials — never
rows. Determinism is inherited: the selection winner set, the global
(-priority, hash_hex) order, the admission winner rule, and the per-shard
sorted seen calls are all byte-identical to the Dataset path and the
single-threaded oracle (asserted by tests/test_frontier.py and the
hypothesis layout test).

Scale note (the partitioning assumption this stage relies on): a bucket's
pending frontier is ONE Arrow object between rounds, so ``host_buckets``
must be sized so n_pending_max / P rows fit one object comfortably
(~150 bytes/row -> P=64 carries ~400M pending rows at 1 GiB/object; a
256-node 10^10-URL crawl sets host_buckets to a few thousand). Selection
skew from a hub host is bounded separately by the salted two-stage path.

Reference analog: the round loop IS the reference's E->T->L workflow loop
(workflows/krx_etl_workflow.yaml) re-expressed; per-stage task-log rows and
per-partition fetch metrics keep its CrawlerTaskLog envelope
(api/src/models/task_log.py:11-46).
"""

from __future__ import annotations

import glob as _glob
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..state.seen import SeenShards, shard_of_many
from .frontier import (
    _EMPTY_FRONTIER,
    _FETCH_COLS,
    _FRONTIER_COLS,
    CrawlConfig,
    ExtractWithRetry,
    _block_add_seq,
    _canonicalize_stage,
    _explode_links,
    _fetch_bucket_local,
    _finish_round,
    _pages_from_extracted,
    _prepare_round_dir,
    _split_block_by_bucket,
    bucket_of_many,
)

_EXTRACT_SLICE_ROWS = 1024          # extract-task granularity (matches the
                                    # Dataset path's batch_size=1024)
_MAX_SLICES_PER_BUCKET = 64
_SAMPLES_PER_BUCKET = 33            # sort-key samples per selection task
_ROWS_PER_RANGE = 4096              # target rows per order-sort range task


def _host_bucket_of(hosts: np.ndarray, n: int) -> np.ndarray:
    """Deterministic host -> pending-bucket id. MUST stay identical to the
    Dataset path's ``add_hb`` (pd.util.hash_array over object dtype) so the
    two control planes co-locate identically."""
    return (pd.util.hash_array(np.asarray(hosts, dtype=object)) % n) \
        .astype(np.int64)


def _budget(max_per_host: int, window_ms: int, delay_ms: int) -> int:
    # CrawlConfig.host_budget, inlined so tasks carry two ints, not cfg
    return min(max_per_host, max(1, window_ms // max(1, delay_ms)))


def _concat_pieces(pieces) -> pa.Table:
    live = [p for p in pieces if p is not None and p.num_rows]
    if not live:
        return _EMPTY_FRONTIER
    return pa.concat_tables(live, promote_options="default") \
        .select(list(_FRONTIER_COLS)).cast(_EMPTY_FRONTIER.schema)


def _rank_keys(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (pk, h64) uint64 keys whose ASCENDING lexicographic order
    equals the crawl order sort (-priority, hash_hex). pk is the standard
    IEEE-754 total-order trick, complemented for descending priority; h64
    is the first 8 digest bytes big-endian (hex order == byte order), a
    PREFIX of the full key — ranges split on it, the exact within-range
    sort uses the full (priority, hash_hex)."""
    n = tbl.num_rows
    if n == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    prio = tbl.column("priority").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    bits = prio.view(np.uint64)
    mono = np.where(bits >> np.uint64(63) > 0, ~bits,
                    bits | np.uint64(1 << 63))
    pk = ~mono
    raw = np.frombuffer(b"".join(tbl.column("url_hash").to_pylist()),
                        dtype=np.uint8).reshape(-1, 20)
    h = np.zeros(n, np.uint64)
    for i in range(8):
        h = (h << np.uint64(8)) | raw[:, i].astype(np.uint64)
    return pk, h


def _sort_frontier_df(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["priority", "hash_hex"],
                          ascending=[False, True], kind="mergesort")


def _to_frontier_table(df: pd.DataFrame) -> pa.Table:
    if not len(df):
        return _EMPTY_FRONTIER
    return pa.Table.from_pandas(df[list(_FRONTIER_COLS)],
                                preserve_index=False) \
        .cast(_EMPTY_FRONTIER.schema)


# --------------------------------------------------------------------------
# Selection
# --------------------------------------------------------------------------

def _politeness_split(t: pa.Table, robots_idx, max_per_host: int,
                      window_ms: int) -> tuple[pa.Table, np.ndarray]:
    """Core politeness selection, Arrow/numpy-native (no pandas, no
    per-row string objects — at 10^9-row buckets the old to_pandas
    materialized every url/host/hex): sort rows by (-priority, full
    20-byte digest — exact hash_hex order), dictionary-encode hosts,
    rank each row within its host via one stable argsort over codes,
    and mark rank < budget(host). Returns (sorted table, selected mask
    over it); equal to the pandas mergesort + groupby-cumcount rule by
    construction (ties preserve the (priority, hash) order because the
    code argsort is stable)."""
    prio = t.column("priority").to_numpy(zero_copy_only=False) \
        .astype(np.float64)
    bits = prio.view(np.uint64)
    mono = np.where(bits >> np.uint64(63) > 0, ~bits,
                    bits | np.uint64(1 << 63))
    pk = ~mono                                   # asc pk == desc priority
    h20 = _digest_matrix(t.column("url_hash")).view("S20").ravel()
    order = np.lexsort((h20, pk))
    t = t.take(pa.array(order))

    host = t.column("host")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    enc = host.dictionary_encode()
    codes = enc.indices.to_numpy(zero_copy_only=False)
    delay = robots_idx.delay_ms
    budgets = np.fromiter(
        (_budget(max_per_host, window_ms, delay.get(hst, 1000))
         for hst in enc.dictionary.to_pylist()),
        dtype=np.int64, count=len(enc.dictionary))
    o2 = np.argsort(codes, kind="stable")        # group rows per host
    grp = codes[o2]
    new = np.ones(len(grp), bool)
    if len(grp) > 1:
        new[1:] = grp[1:] != grp[:-1]
    gstart = np.nonzero(new)[0]
    glen = np.diff(np.append(gstart, len(grp)))
    rank = np.empty(len(grp), np.int64)
    rank[o2] = np.arange(len(grp)) - np.repeat(gstart, glen)
    return t, rank < budgets[codes]


@ray.remote(num_returns=3)
def _tg_select(robots_idx, max_per_host: int, window_ms: int,
               *pieces: pa.Table):
    """Per-host politeness top-budget over one host-bucket's pieces ->
    (selected, deferred, meta). selected stays (-priority, hash_hex)-sorted;
    meta carries counts + evenly spaced sort-key samples for the order
    sample sort."""
    t = _concat_pieces(pieces)
    if t.num_rows == 0:
        return _EMPTY_FRONTIER, _EMPTY_FRONTIER, {
            "n_sel": 0, "n_def": 0,
            "s_pk": np.empty(0, np.uint64), "s_h": np.empty(0, np.uint64)}
    ts, sel = _politeness_split(t, robots_idx, max_per_host, window_ms)
    sel_t = ts.filter(pa.array(sel))
    def_t = ts.filter(pa.array(~sel))
    pk, h = _rank_keys(sel_t)
    step = max(1, len(pk) // (_SAMPLES_PER_BUCKET - 1))
    meta = {"n_sel": sel_t.num_rows, "n_def": def_t.num_rows,
            "s_pk": pk[::step][:_SAMPLES_PER_BUCKET],
            "s_h": h[::step][:_SAMPLES_PER_BUCKET]}
    return sel_t, def_t, meta


@ray.remote(num_returns=2)
def _tg_partial_top(robots_idx, max_per_host: int, window_ms: int,
                    salt_idx: int, salt_n: int, *pieces: pa.Table):
    """Stage 1 of salted selection: this task's salt group only, per-host
    top-budget -> (candidates, losers). Any row in a host's true top-b is
    in its salt group's top-b, so the final stage over candidates equals
    unsalted selection; losers defer directly."""
    t = _concat_pieces(pieces)
    if t.num_rows and salt_n > 1:
        raw = _digest_matrix(t.column("url_hash"))
        saltv = (raw[:, 18].astype(np.int64)
                 | (raw[:, 19].astype(np.int64) << 8)) % salt_n
        t = t.filter(pa.array(saltv == salt_idx))
    if t.num_rows == 0:
        return _EMPTY_FRONTIER, _EMPTY_FRONTIER
    ts, cand = _politeness_split(t, robots_idx, max_per_host, window_ms)
    return ts.filter(pa.array(cand)), ts.filter(pa.array(~cand))


@ray.remote
def _tg_host_counts(floor: int, *pieces: pa.Table) -> pa.Table:
    """Hub detection partial: hosts with >= floor pending rows in this
    bucket. EXACT here (a host's rows are all co-located in its bucket),
    unlike the Dataset path's per-block approximation."""
    t = _concat_pieces(pieces)
    if t.num_rows == 0:
        return pa.table({"host": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})
    host = t.column("host")
    if isinstance(host, pa.ChunkedArray):
        host = host.combine_chunks()
    vc = host.value_counts()
    ns = vc.field("counts").to_numpy(zero_copy_only=False)
    keep = ns >= floor
    return pa.table({"host": vc.field("values").take(
                        pa.array(np.nonzero(keep)[0])).cast(pa.string()),
                     "n": pa.array(ns[keep].astype(np.int64), pa.int64())})


# --------------------------------------------------------------------------
# Crawl-order sample sort
# --------------------------------------------------------------------------

@ray.remote
def _tg_range_split(sel: pa.Table, b_pk: np.ndarray, b_h: np.ndarray):
    """Split one selected piece into R = len(b_pk)+1 order ranges. Row j
    belongs to range k = #{splitters <= key_j} under the (pk, h64)
    composite order; equal-prefix rows always share a range, so the exact
    within-range sort cannot violate cross-range order."""
    n_ranges = len(b_pk) + 1
    pk, h = _rank_keys(sel)
    ridx = np.zeros(len(pk), np.int64)
    for j in range(len(b_pk)):
        ridx += ((pk > b_pk[j]) | ((pk == b_pk[j]) & (h >= b_h[j]))) \
            .astype(np.int64)
    order = np.argsort(ridx, kind="stable")
    t2 = sel.take(pa.array(order))
    bounds = np.searchsorted(ridx[order], np.arange(n_ranges + 1))
    out = tuple(t2.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                for k in range(n_ranges))
    return out if n_ranges > 1 else out[0]


@ray.remote(num_returns=2)
def _tg_range_sortmerge(*slices: pa.Table):
    """Exact (-priority, hash_hex) sort of one order range -> (tbl, count)."""
    t = _concat_pieces(slices)
    if t.num_rows == 0:
        return _EMPTY_FRONTIER, 0
    return _to_frontier_table(_sort_frontier_df(t.to_pandas())), t.num_rows


# --------------------------------------------------------------------------
# Fetch + extract + candidate prep
# --------------------------------------------------------------------------

@ray.remote
def _tg_fetch_bucket(paths: list[str], sched_refs: list,
                     columns: list[str], n_out: int):
    """Per-bucket pruned fetch join (frontier._fetch_bucket_local), output
    split into n_out even slices so extract parallelism tracks schedule
    size instead of bucket count."""
    pieces = [s for s in ray.get(list(sched_refs)) if s is not None]
    t = _fetch_bucket_local(paths, pieces, columns)
    if n_out == 1:
        return t
    per = -(-max(t.num_rows, 1) // n_out)
    return tuple(t.slice(k * per, per) for k in range(n_out))


def _prep_candidates(canon: pa.Table, n_shards: int) -> tuple:
    """Pre-combine (within-task dedup, winner = max priority then min
    depth) + seen-shard split — the admit stage's per-batch combiner."""
    if canon.num_rows == 0:
        return tuple(_EMPTY_FRONTIER for _ in range(n_shards))
    df = canon.to_pandas().sort_values(
        ["hash_hex", "priority", "depth"],
        ascending=[True, False, True], kind="mergesort") \
        .drop_duplicates("hash_hex", keep="first")
    sh = shard_of_many(list(df["url_hash"]), n_shards)
    order = np.argsort(sh, kind="stable")
    t = _to_frontier_table(df.iloc[order])
    bounds = np.searchsorted(sh[order], np.arange(n_shards + 1))
    return tuple(t.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                 for k in range(n_shards))


@ray.remote
def _tg_cand_prep(cand: pa.Table, n_shards: int):
    """Raw candidates (url, base?, priority, depth) -> canonicalized,
    pre-deduped, shard-split frontier slices (seeds ingest)."""
    out = _prep_candidates(_canonicalize_stage(cand), n_shards)
    return out if n_shards > 1 else out[0]


@ray.remote
def _tg_extract(fetch_slice: pa.Table, score: bool, attempts: int,
                failure_rate: float, decay: float, n_shards: int,
                n_buckets: int, pages_path: str, r: int):
    """One extract slice: fetch/extract/score under the retry policy,
    write this slice's pages-parquet part, produce the per-bucket fetch
    metrics partial, and prep next-round candidates (explode links ->
    canonicalize -> pre-dedup -> shard split). num_returns = 1 + n_shards:
    (meta, *candidate slices)."""
    empty_meta = {"n": 0, "counts": np.zeros(n_buckets, np.int64),
                  "rets": np.zeros(n_buckets, np.int64), "errs": []}
    if fetch_slice.num_rows == 0:
        out = (empty_meta,) + tuple(_EMPTY_FRONTIER for _ in range(n_shards))
        return out if n_shards > 0 else out[0]
    fn = ExtractWithRetry(score, attempts, failure_rate)
    ex = pa.concat_tables(
        [fn(fetch_slice.slice(i, _EXTRACT_SLICE_ROWS))
         for i in range(0, fetch_slice.num_rows, _EXTRACT_SLICE_ROWS)],
        promote_options="default")
    pq.write_table(_pages_from_extracted(ex, r), pages_path)
    b = bucket_of_many(ex.column("url_hash").to_pylist(), n_buckets)
    att = ex.column("fetch_attempts").to_numpy(zero_copy_only=False)
    errs = ex.column("fetch_error_sample").drop_null().to_pylist()[:3]
    meta = {"n": ex.num_rows,
            "counts": np.bincount(b, minlength=n_buckets).astype(np.int64),
            "rets": np.bincount(b, weights=att - 1,
                                minlength=n_buckets).astype(np.int64),
            "errs": errs}
    cand = _explode_links(ex.select(["url", "links", "priority", "depth"]),
                          decay)
    return (meta,) + _prep_candidates(_canonicalize_stage(cand), n_shards)


# --------------------------------------------------------------------------
# Route + finalize
# --------------------------------------------------------------------------

def _digest_matrix(col) -> np.ndarray:
    """url_hash binary column -> zero-copy (n, 20) uint8 view (via a
    fixed_size_binary cast — no per-row Python bytes objects)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    fsb = col.cast(pa.binary(20))
    raw = np.frombuffer(fsb.buffers()[1], np.uint8)
    start = fsb.offset * 20
    return raw[start:start + len(fsb) * 20].reshape(-1, 20)


@ray.remote
def _tg_admit_route(robots_idx, actor, n: int, *pieces: pa.Table):
    """Fused admit + host-route for the task-graph round: same admission
    semantics as frontier._shard_admit_task — global per-shard dedup
    (winner: max priority, min depth; S20 lexsort over the raw digests,
    equal to the pandas hash_hex sort since hex order == byte order),
    robots gate, ONE sorted-unique check_and_insert call carrying a
    single joined digest blob — then the admitted rows split by
    hash(host) in the same task. Arrow/numpy throughout: no pandas
    round-trip, no per-row digest objects (the admit hot path at
    10^10-URL scale). num_returns = n + 1; last return is the admitted
    row count. Pinned equal to the dataset plane + oracle by
    tests/test_frontier.py."""
    live = [p for p in pieces if p is not None and p.num_rows]
    if not live:
        return _split_host(_EMPTY_FRONTIER, n) + (0,)
    t = pa.concat_tables(live, promote_options="default")
    h = _digest_matrix(t.column("url_hash")).view("S20").ravel()
    prio = t.column("priority").to_numpy(zero_copy_only=False)
    depth = t.column("depth").to_numpy(zero_copy_only=False)
    order = np.lexsort((depth, -prio, h))        # stable, matches pandas
    hs = h[order]
    first = np.ones(len(hs), bool)
    if len(hs) > 1:
        first[1:] = hs[1:] != hs[:-1]            # winner per unique hash
    t = t.take(pa.array(order[first]))           # rows now hash-ascending
    mask = robots_idx.allowed_mask(
        t.column("host").to_numpy(zero_copy_only=False),
        t.column("url").to_numpy(zero_copy_only=False))
    if not mask.all():
        t = t.filter(pa.array(mask))
    if t.num_rows:
        blob = _digest_matrix(t.column("url_hash")).tobytes()
        new = ray.get(actor.check_and_insert.remote(blob))
        keep = np.asarray(new, dtype=bool)
        if not keep.all():
            t = t.filter(pa.array(keep))
    t = t.select(list(_FRONTIER_COLS)).cast(_EMPTY_FRONTIER.schema)
    return _split_host(t, n) + (t.num_rows,)


def _split_host(t: pa.Table, n: int) -> tuple:
    """Split one frontier table into n host-bucket slices."""
    if t.num_rows == 0:
        return tuple(_EMPTY_FRONTIER for _ in range(n))
    hb = _host_bucket_of(t.column("host").to_numpy(zero_copy_only=False), n)
    order = np.argsort(hb, kind="stable")
    t2 = t.take(pa.array(order))
    bounds = np.searchsorted(hb[order], np.arange(n + 1))
    return tuple(t2.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                 for k in range(n))


@ray.remote(num_returns=2)
def _tg_finalize_bucket(write_path: str | None, *pieces: pa.Table):
    """Next round's pending piece for one bucket: concat deferred + newly
    admitted, write the frontier_next checkpoint part -> (piece, count)."""
    t = _concat_pieces(pieces)
    if write_path is not None and t.num_rows:
        pq.write_table(t, write_path)
    return t, t.num_rows


@ray.remote
def _tg_load_split(path: str, n: int):
    """Resume: read one frontier_next part and split it by host bucket."""
    t = pq.read_table(path).select(list(_FRONTIER_COLS)) \
        .cast(_EMPTY_FRONTIER.schema)
    return _split_host(t, n)


@ray.remote
def _tg_split_block(t: pa.Table, n: int):
    """Cross-control-plane upgrade: split one in-memory pending block by
    host bucket (Dataset-path pending -> taskgraph parts)."""
    if not isinstance(t, pa.Table):
        t = pa.Table.from_pandas(t, preserve_index=False)
    if t.num_rows == 0:
        return tuple(_EMPTY_FRONTIER for _ in range(n))
    t = t.select(list(_FRONTIER_COLS)).cast(_EMPTY_FRONTIER.schema)
    return _split_host(t, n)


# --------------------------------------------------------------------------
# Pending-state conversions (driver-side, bounded or task-backed)
# --------------------------------------------------------------------------

class TGParts:
    """Pending frontier as P host-bucket piece-ref lists + row count."""

    __slots__ = ("parts", "n")

    def __init__(self, parts: list[list], n: int):
        self.parts = parts
        self.n = n


def parts_from_table(tbl: pa.Table, n: int) -> list[list]:
    """Driver-side split of a BOUNDED table (small->distributed upgrade)."""
    tbl = tbl.select(list(_FRONTIER_COLS)).cast(_EMPTY_FRONTIER.schema)
    if tbl.num_rows == 0:
        return [[] for _ in range(n)]
    return [[ray.put(piece)] if piece.num_rows else []
            for piece in _split_host(tbl, n)]


def parts_from_dataset(ds, n: int) -> list[list]:
    """Dataset-path pending -> taskgraph parts (one split task per block;
    only used when switching control planes mid-crawl)."""
    refs = ds.materialize().to_arrow_refs()
    loads = [_tg_split_block.options(num_returns=n).remote(ref, n)
             for ref in refs]
    if n == 1:
        loads = [[ld] for ld in loads]
    return [[ld[b] for ld in loads] for b in range(n)]


def parts_from_files(files: list[str], n: int) -> list[list]:
    """Resume: one load+split task per checkpoint part file."""
    loads = [_tg_load_split.options(num_returns=n).remote(f, n)
             for f in files]
    if n == 1:
        loads = [[ld] for ld in loads]
    return [[ld[b] for ld in loads] for b in range(n)]


def parts_to_table(parts: list[list]) -> pa.Table:
    """Distributed->driver downgrade: gather a BOUNDED pending frontier
    (caller guarantees n_pend <= driver_small_round_rows)."""
    refs = [p for pieces in parts for p in pieces]
    if not refs:
        return _EMPTY_FRONTIER
    return _concat_pieces(ray.get(refs))


def tg_ingest_table(cand: pa.Table, robots_ref, shards: SeenShards,
                    host_buckets: int) -> TGParts:
    """Seeds ingest on raw tasks: chunk -> canonicalize/pre-dedup/shard
    split -> per-shard admit (robots + ONE sorted seen call) -> route by
    host bucket. Mirrors frontier._ingest without a Dataset execution."""
    n_shards = shards.n_shards
    chunks = [cand.slice(i, 8192) for i in range(0, max(cand.num_rows, 1),
                                                 8192)]
    preps = [_tg_cand_prep.options(num_returns=n_shards).remote(c, n_shards)
             for c in chunks]
    if n_shards == 1:
        preps = [[p] for p in preps]
    routed = [
        _tg_admit_route.options(num_returns=host_buckets + 1).remote(
            robots_ref, shards.actors[k], host_buckets,
            *[pp[k] for pp in preps])
        for k in range(n_shards)
    ]
    n_pend = sum(ray.get([rt[host_buckets] for rt in routed]))
    parts = [[rt[b] for rt in routed] for b in range(host_buckets)]
    return TGParts(parts, n_pend)


# --------------------------------------------------------------------------
# The round
# --------------------------------------------------------------------------

def run_round_tg(r: int, state: TGParts, idx_dir: str, out_dir: str,
                 cfg: CrawlConfig, robots_ref,
                 shards: SeenShards) -> TGParts | None:
    """One crawl round as a static task graph (see module docstring).
    Returns the next pending state, or None when the frontier is empty.
    Synchronization points (all bounded): selection metas, range counts,
    per-bucket schedule counts, extract metric partials, finalize counts —
    gathering the finalize counts transitively guarantees every write
    (pages, order, frontier_next) and every seen-shard insert of the round
    completed before the _SUCCESS rename."""
    t0 = time.perf_counter()
    rdir, tmp = _prepare_round_dir(out_dir, r)
    P = len(state.parts)
    n_pend = state.n
    robots_idx = ray.get(robots_ref)
    stage_t: dict = {"mode": "taskgraph"}
    mph, win = cfg.max_per_host_per_round, cfg.politeness_window_ms

    # ---- hub detection + salt decision (bounded: per-bucket host counts
    # above the floor; exact, since a host's rows are co-located)
    _t = time.perf_counter()
    salt_buckets: set[int] = set()
    salt_n = 0
    if cfg.politeness_salt > 1:
        salt_n = cfg.politeness_salt
        salt_buckets = set(range(P))
    elif cfg.auto_salt_pending_rows > 0 and n_pend > cfg.auto_salt_pending_rows:
        floor = max(1, cfg.auto_salt_pending_rows // 256)
        cnt_tabs = ray.get([_tg_host_counts.remote(floor, *pieces)
                            for pieces in state.parts if pieces])
        hubs: list[str] = []
        for t in cnt_tabs:
            ns = t.column("n").to_numpy(zero_copy_only=False)
            hs = t.column("host").to_pylist()
            hubs.extend(h for h, c in zip(hs, ns)
                        if c > cfg.auto_salt_pending_rows)
        if hubs:
            salt_n = max(2, cfg.auto_salt_n)
            salt_buckets = set(
                _host_bucket_of(np.asarray(sorted(set(hubs)), dtype=object),
                                P).tolist())
            stage_t["mode_salted_hosts"] = len(set(hubs)) / 1000.0

    # ---- selection: P local tasks (salted buckets: two-stage)
    sel_refs: list = []
    sel_meta_refs: list = []
    def_pieces: list[list] = [[] for _ in range(P)]
    for b in range(P):
        pieces = state.parts[b]
        if not pieces:
            sel_refs.append(None)
            sel_meta_refs.append(None)
            continue
        if b in salt_buckets and salt_n > 1:
            partials = [
                _tg_partial_top.remote(robots_ref, mph, win, i, salt_n,
                                       *pieces)
                for i in range(salt_n)
            ]
            def_pieces[b].extend(p[1] for p in partials)
            out = _tg_select.remote(robots_ref, mph, win,
                                    *[p[0] for p in partials])
        else:
            out = _tg_select.remote(robots_ref, mph, win, *pieces)
        sel_refs.append(out[0])
        def_pieces[b].append(out[1])
        sel_meta_refs.append(out[2])
    metas = ray.get([m for m in sel_meta_refs if m is not None])
    n_selected = int(sum(m["n_sel"] for m in metas))
    live_sel = [s for s, m in zip([x for x in sel_refs if x is not None],
                                  metas) if m["n_sel"]]
    stage_t["select_shuffle"] = round(time.perf_counter() - _t, 3)

    # ---- crawl order: raw-task sample sort + per-range seq stamping
    _t = time.perf_counter()
    seq_refs: list = []
    if n_selected:
        order_dir = os.path.join(tmp, "order")
        os.makedirs(order_dir, exist_ok=True)
        n_ranges = min(32, -(-n_selected // _ROWS_PER_RANGE))
        if n_ranges > 1 and len(live_sel) > 1:
            s_pk = np.concatenate([m["s_pk"] for m in metas if m["n_sel"]])
            s_h = np.concatenate([m["s_h"] for m in metas if m["n_sel"]])
            w = np.concatenate([
                np.full(len(m["s_pk"]), m["n_sel"] / len(m["s_pk"]))
                for m in metas if m["n_sel"]])
            o = np.lexsort((s_h, s_pk))
            cum = np.cumsum(w[o])
            marks = cum[-1] * np.arange(1, n_ranges) / n_ranges
            at = np.searchsorted(cum, marks)
            b_pk, b_h = s_pk[o][at], s_h[o][at]
            splits = [_tg_range_split.options(num_returns=n_ranges)
                      .remote(s, b_pk, b_h) for s in live_sel]
        else:
            n_ranges = 1
            splits = [[s] for s in live_sel]
        ranges = [_tg_range_sortmerge.remote(*[sp[k] for sp in splits])
                  for k in range(n_ranges)]
        rcounts = ray.get([rg[1] for rg in ranges])
        off = 0
        for k, c in enumerate(rcounts):
            if not c:
                continue
            seq_refs.append(_block_add_seq.remote(
                ranges[k][0], off, r,
                os.path.join(order_dir, f"part-{k:05d}.parquet")))
            off += c
    stage_t["sched_seq"] = round(time.perf_counter() - _t, 3)

    # ---- fetch (per-bucket pruned join) + extract slices
    _t = time.perf_counter()
    ext_returns: list = []
    if seq_refs:
        split_returns = [
            _split_block_by_bucket.options(num_returns=cfg.n_buckets + 1)
            .remote(x, cfg.n_buckets) for x in seq_refs
        ]
        per_block = ray.get([rets[-1] for rets in split_returns])
        total_per_bucket = np.sum(per_block, axis=0)
        pages_dir = os.path.join(tmp, "pages")
        os.makedirs(pages_dir, exist_ok=True)
        # extract-slice size adapts to the cluster: a fixed 1024 starves
        # mid-size rounds (10k pages -> 10 tasks < 16 cpus); target ~3
        # task waves per core, floored so tiny slices don't drown in
        # per-task overhead
        ncpus = int(ray.cluster_resources().get("CPU", 8))
        chunk = max(256, min(_EXTRACT_SLICE_ROWS,
                             n_selected // (3 * ncpus) + 1))
        ei = 0
        for b in np.nonzero(total_per_bucket)[0]:
            paths = sorted(_glob.glob(
                os.path.join(idx_dir, f"bucket={int(b)}", "*.parquet")))
            if not paths:
                continue
            n_out = min(_MAX_SLICES_PER_BUCKET,
                        -(-int(total_per_bucket[b]) // chunk))
            fslices = _tg_fetch_bucket.options(num_returns=n_out).remote(
                paths, [rets[int(b)] for rets in split_returns],
                _FETCH_COLS, n_out)
            if n_out == 1:
                fslices = [fslices]
            for s in fslices:
                ext_returns.append(
                    _tg_extract.options(num_returns=1 + cfg.n_shards).remote(
                        s, cfg.score_pages, cfg.fetch_retry_attempts,
                        cfg.fetch_failure_rate, cfg.link_priority_decay,
                        cfg.n_shards, cfg.n_buckets,
                        os.path.join(pages_dir, f"part-e{ei:05d}.parquet"),
                        r))
                ei += 1
    ext_metas = ray.get([er[0] for er in ext_returns]) if ext_returns else []
    n_fetched = int(sum(m["n"] for m in ext_metas))
    counts = np.zeros(cfg.n_buckets, np.int64)
    rets_v = np.zeros(cfg.n_buckets, np.int64)
    err_samples: list[str] = []
    for m in ext_metas:
        counts += m["counts"]
        rets_v += m["rets"]
        if len(err_samples) < 10:
            err_samples.extend(m["errs"])
    bucket_rows = [{"bucket": int(b), "rows_out": int(counts[b]),
                    "retries": int(rets_v[b])}
                   for b in np.nonzero(counts)[0]]
    retries = int(rets_v.sum())
    stage_t["fetch_extract"] = round(time.perf_counter() - _t, 3)

    # ---- fused admit+route (per-shard, one sorted seen call) + finalize
    _t = time.perf_counter()
    trace = bool(os.environ.get("HYPERION_TG_TRACE"))
    routed: list = []
    if n_fetched:
        routed = [
            _tg_admit_route.options(num_returns=P + 1).remote(
                robots_ref, shards.actors[k], P,
                *[er[1 + k] for er in ext_returns])
            for k in range(cfg.n_shards)
        ]
        if trace:  # staged sync: attribute admit+route vs finalize
            ray.wait([rt[P] for rt in routed], num_returns=len(routed))
            stage_t["admit_route_only"] = round(time.perf_counter() - _t, 3)
    if trace:
        _t3 = time.perf_counter()
    fdir = os.path.join(tmp, "frontier_next")
    os.makedirs(fdir, exist_ok=True)
    fin: list = []
    for b in range(P):
        pieces = def_pieces[b] + [rt[b] for rt in routed]
        if not pieces:
            fin.append(None)
            continue
        fin.append(_tg_finalize_bucket.remote(
            os.path.join(fdir, f"part-{b:05d}.parquet"), *pieces))
    next_counts = ray.get([f[1] for f in fin if f is not None])
    it = iter(next_counts)
    parts_next: list[list] = []
    n_next = 0
    for f in fin:
        if f is None:
            parts_next.append([])
            continue
        c = next(it)
        n_next += c
        parts_next.append([f[0]] if c else [])
    if trace:
        stage_t["finalize_only"] = round(time.perf_counter() - _t3, 3)
    stage_t["admit_union"] = round(time.perf_counter() - _t, 3)

    _finish_round(tmp, rdir, r, t0, n_pend, n_selected, n_fetched, n_next,
                  None, shards, stage_t, retries=retries, cfg=cfg,
                  bucket_rows=bucket_rows,
                  error_samples=err_samples[:10])
    return TGParts(parts_next, n_next) if n_next > 0 else None
