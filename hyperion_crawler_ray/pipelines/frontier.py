"""Ray-Data-native URL-frontier + fetch scheduler (the flagship pipeline).

Round 5: distributed rounds default to the STATIC TASK-GRAPH control
plane (pipelines/frontier_tg.py — the pending frontier lives across
rounds as host-hash-partitioned Arrow objects and a round is raw task
layers with zero Dataset executions; see that module's docstring).
``CrawlConfig.control_plane="dataset"`` selects this module's original
Ray Data round loop — kept as the A/B twin, result-identical (pinned by
tests/test_frontier.py). The driver fast path, fetch index, extract
stage, lineage/checkpoint format, and all leaf semantics below are
shared by both planes.

Re-expresses the reference's E->T->L loop (SURVEY.md §3, §7) as a
round-based crawl over a Parquet pages corpus:

    seeds -> canonicalize -> robots gate -> seen-filter (sharded cuckoo
    actors) -> per-host politeness selection (groupby(host)) -> fetch
    (bucketed semi-join against the pages index) -> extract text+links
    (actor-pool map_batches) -> canonicalize links -> within-round dedup
    (groupby(url_hash)) -> robots -> seen-filter -> next frontier

Scale design (10^10-URL frontier, per north_rule):
- The pages corpus is indexed ONCE into a hash-bucketed Parquet layout
  (``bucket = url_hash mod B`` partition dirs): each round's fetch reads
  only the buckets containing scheduled URLs instead of rescanning the
  corpus. B is explicit (`CrawlConfig.n_buckets`).
- Wide steps (within-round dedup, per-host selection) are Ray Data
  ``groupby`` shuffles; per-host selection keys on ``host`` — hub-domain
  skew is bounded because the politeness budget caps what any one host
  contributes per round, and candidate dedup pre-aggregates per batch
  before the shuffle.
- Only **bounded** control data reaches the driver: block refs,
  per-block row counts and per-bucket schedule counts (≤ n_buckets
  ints per block). The selected schedule itself stays distributed —
  seq is assigned by a distributed sort + per-block offsets, the crawl
  order is written by a Dataset sink, and the fetch is a per-bucket
  co-partitioned join against the disk-bucketed index (round 1
  gathered the schedule into a driver dict, unbounded at 10^10-URL
  scale). Rounds below ``driver_small_round_rows`` use a bounded
  driver fast-path with pytest-asserted equality.
- Determinism at any parallelism: seen-shard calls are one-per-shard-
  per-round with sorted input (state/seen.py), dedup keeps a total-order
  winner (max priority, min depth, then url), and crawl order is the sort
  by (-priority, url_hash) of the bounded schedule. The single-threaded
  oracle (pipelines/oracle.py) reproduces all of it.
- Checkpoint/resume: each round writes pages/order/frontier_next/lineage
  plus cuckoo-shard snapshots into ``rounds/round=NNNN/`` and an atomic
  ``_SUCCESS`` marker; resume loads the last complete round exactly
  (reference analog: idempotent re-runs via keyed upsert,
  api/src/etl/krx/loader.py:123-137).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..functions.extract import extract_links, extract_text
from ..functions.urlnorm import canonicalize_batch
from ..state.robots import RobotsIndex
from ..state.seen import SeenShards, shard_of_many


@dataclass
class CrawlConfig:
    max_rounds: int = 16
    max_per_host_per_round: int = 8
    politeness_window_ms: int = 2000
    n_shards: int = 8
    seen_capacity_per_shard: int = 1 << 20
    n_buckets: int = 32
    link_priority_decay: float = 0.5
    extract_concurrency: int = 4
    extract_batch_size: int = 512
    score_pages: bool = True  # per-page enrichment at fetch time
    # Rounds whose pending frontier is at most this many rows run their
    # control plane (politeness selection, admission dedup/robots/seen)
    # on the driver over in-memory Arrow instead of paying ~6 Ray Data
    # executions of fixed latency for trivially small data. Fetch+extract
    # stays distributed either way. Semantics are identical (same leaf
    # functions, same sorted per-shard seen calls); 0 disables.
    driver_small_round_rows: int = 8192
    # >1 enables two-stage salted politeness selection: per-(host, salt)
    # partial top-budget, then per-host final top-budget over the
    # survivors. Same result as unsalted; bounds the rows any one
    # selection task holds for a hub host at 10^10-frontier scale.
    politeness_salt: int = 0
    # Auto-salt (round 4): when any single host's PENDING rows exceed
    # this threshold, the round's selection switches to the salted
    # two-stage path automatically (with ``auto_salt_n`` salt groups) —
    # a hub host with millions of pending urls would otherwise
    # concentrate in one selection task. Detection is an approximate
    # per-block partial count (hosts below a per-block floor never reach
    # the driver) gated on total pending > threshold, so small rounds
    # pay nothing; a false negative only delays the switch, never
    # changes results (salted == unsalted selection, pytest-equal).
    # 0 disables.
    auto_salt_pending_rows: int = 100_000
    auto_salt_n: int = 8
    # Control plane for distributed rounds (round 5):
    #   "task"    — static co-partitioned task graph (frontier_tg.py): the
    #               pending frontier lives across rounds as `host_buckets`
    #               host-hash-partitioned Arrow objects; a round is raw
    #               task layers with ZERO Dataset executions (the fix for
    #               the per-round fixed-latency scaling residual, the same
    #               pattern as stages/components.py).
    #   "dataset" — the round-1..4 Ray Data round loop (kept for A/B and
    #               equivalence tests; results are identical).
    control_plane: str = "task"
    # Pending-frontier partition count for the task-graph control plane.
    # Sizing rule: a bucket's pending rows live as ONE Arrow object between
    # rounds (~150 B/row), so choose host_buckets >= peak_pending_rows x
    # 150 B / 1 GiB; 64 covers ~400M pending rows, a 256-node 10^10-URL
    # crawl sets a few thousand. Selection skew from hub hosts is bounded
    # separately (salted two-stage selection).
    host_buckets: int = 64
    # Application-level retry budget for the fetch/extract stage
    # (reference workflows/krx_etl_workflow.yaml:41-47: 3 attempts with
    # exponential backoff on transient errors). fetch_failure_rate > 0
    # deterministically injects one transient failure per affected
    # batch — used by the retry/lineage tests; 0 in production.
    fetch_retry_attempts: int = 3
    fetch_failure_rate: float = 0.0

    def host_budget(self, crawl_delay_ms: int) -> int:
        """Fetches allowed for a host this round: its crawl delay divides
        the round's politeness window, capped by the hard per-host max."""
        by_delay = max(1, self.politeness_window_ms // max(1, crawl_delay_ms))
        return min(self.max_per_host_per_round, by_delay)


def bucket_of_many(digests: list[bytes], n_buckets: int) -> np.ndarray:
    """Fetch-index bucket of each digest (bytes 16:18 — disjoint from the
    cuckoo fingerprint/bucket bytes and the seen-shard bytes)."""
    if not digests:
        return np.empty(0, np.int64)
    joined = b"".join(digests)
    if len(joined) != 20 * len(digests):
        # a non-SHA-1 digest would silently misalign the reshape and
        # scramble every row after it — fail loud (ADVICE round 3)
        raise ValueError(
            f"bucket_of_many: digests must be 20-byte SHA-1; got total "
            f"{len(joined)} bytes for {len(digests)} digests")
    raw = np.frombuffer(joined, dtype=np.uint8).reshape(-1, 20)
    v = raw[:, 16].astype(np.int64) | (raw[:, 17].astype(np.int64) << 8)
    return v % n_buckets


# --------------------------------------------------------------------------
# Fetch index: one-time hash-bucketed layout of the pages corpus.
# --------------------------------------------------------------------------

def build_fetch_index(pages_path: str, idx_dir: str, n_buckets: int) -> None:
    """Index the corpus once: canonicalize ``url``, add ``url_hash`` and
    ``bucket``, write Hive-partitioned by bucket. Idempotent via marker.

    Round 3: the index is globally sorted by ``url_hash`` before the
    partitioned write, so each file a bucket holds covers a narrow
    contiguous hash range (one file per sorted block per bucket) —
    per-round fetch reads can then skip whole files/row groups via
    parquet min/max statistics when a round touches few URLs in that
    bucket (the ``isin`` filter in ``_fetch_bucket_task``)."""
    marker = os.path.join(idx_dir, "_IDX_SUCCESS")
    if os.path.exists(marker):
        return

    def add_keys(batch: pa.Table) -> pa.Table:
        urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
        canon, hosts, hashes = canonicalize_batch(urls)
        keep = np.array([c is not None for c in canon])
        if not keep.all():
            batch = batch.filter(pa.array(keep))
            canon, hosts, hashes = canon[keep], hosts[keep], hashes[keep]
        hl = list(hashes)
        buckets = bucket_of_many(hl, n_buckets)
        return (
            batch.set_column(batch.schema.get_field_index("url"), "url",
                             pa.array(list(canon), pa.string()))
            .append_column("url_hash", pa.array(hl, pa.binary()))
            .append_column("host", pa.array(list(hosts), pa.string()))
            .append_column("bucket", pa.array(buckets, pa.int32()))
        )

    (
        rd.read_parquet(pages_path)
        .map_batches(add_keys, batch_format="pyarrow", batch_size=4096)
        .sort("url_hash")
        .write_parquet(idx_dir, partition_cols=["bucket"])
    )
    with open(marker, "w") as f:
        json.dump({"n_buckets": n_buckets}, f)


# --------------------------------------------------------------------------
# Stages
# --------------------------------------------------------------------------

_FRONTIER_COLS = ("url", "url_hash", "hash_hex", "host", "priority", "depth")


def _as_arrow(ds: rd.Dataset) -> rd.Dataset:
    """Normalize block type to Arrow after pandas-producing map_groups
    stages (mixed block types break downstream shuffle sampling)."""
    return ds.map_batches(lambda t: t, batch_format="pyarrow")


def _canonicalize_stage(batch: pa.Table) -> pa.Table:
    """raw candidate (url, base?, priority, depth) -> frontier columns;
    invalid URLs dropped (counted upstream via row deltas)."""
    urls = np.asarray(batch.column("url").to_pylist(), dtype=object)
    bases = (
        np.asarray(batch.column("base").to_pylist(), dtype=object)
        if "base" in batch.column_names else None
    )
    canon, hosts, hashes = canonicalize_batch(urls, bases)
    keep = np.array([c is not None for c in canon], dtype=bool)
    prio = batch.column("priority").to_numpy(zero_copy_only=False)[keep]
    depth = batch.column("depth").to_numpy(zero_copy_only=False)[keep]
    hl = list(hashes[keep])
    return pa.table(
        {
            "url": pa.array(list(canon[keep]), pa.string()),
            "url_hash": pa.array(hl, pa.binary()),
            "hash_hex": pa.array([h.hex() for h in hl], pa.string()),
            "host": pa.array(list(hosts[keep]), pa.string()),
            "priority": pa.array(prio, pa.float64()),
            "depth": pa.array(depth.astype(np.int32), pa.int32()),
        }
    )


@ray.remote
def _shard_split_task(tbl: pa.Table, n_shards: int):
    """One hash-exchange map task: partition a candidate block by its
    precomputed ``shard`` column into ``n_shards`` zero-copy slices
    (argsort + searchsorted — no per-shard scan). Returned as
    ``num_returns=n_shards`` objects so each reducer fetches ONLY its
    shard's bytes."""
    sh = tbl.column("shard").to_numpy(zero_copy_only=False)
    if len(sh) and (sh.min() < 0 or sh.max() >= n_shards):
        # out-of-range shard ids would silently vanish in the
        # searchsorted bounds — fail loud instead of dropping rows
        raise ValueError(
            f"shard column out of range: [{sh.min()}, {sh.max()}] "
            f"not within [0, {n_shards})")
    order = np.argsort(sh, kind="stable")
    t2 = tbl.take(pa.array(order))
    bounds = np.searchsorted(sh[order], np.arange(n_shards + 1))
    out = tuple(t2.slice(int(bounds[k]), int(bounds[k + 1] - bounds[k]))
                for k in range(n_shards))
    return out if n_shards > 1 else out[0]


@ray.remote
def _shard_admit_task(robots_idx: "RobotsIndex", actor,
                      *pieces: pa.Table) -> pa.Table:
    """One hash-exchange reduce task = one seen-shard's admission:
    global dedup (per-shard == global for this key), robots gate, and
    the shard actor's single sorted-unique ``check_and_insert`` call."""
    live = [p for p in pieces if p is not None and p.num_rows]
    if not live:
        return _EMPTY_FRONTIER
    df = pa.concat_tables(live, promote_options="default").to_pandas()
    df = df.sort_values(["hash_hex", "priority", "depth"],
                        ascending=[True, False, True], kind="mergesort")
    df = df.drop_duplicates("hash_hex", keep="first")
    mask = robots_idx.allowed_mask(df["host"].to_numpy(dtype=object),
                                   df["url"].to_numpy(dtype=object))
    df = df[mask]
    if len(df):
        # seen check+mark: sorted unique digests, one actor call per
        # shard per round — the determinism contract of state/seen.py
        new = ray.get(actor.check_and_insert.remote(list(df["url_hash"])))
        df = df[np.asarray(new, dtype=bool)]
    if not len(df):
        return _EMPTY_FRONTIER
    return pa.Table.from_pandas(df[list(_FRONTIER_COLS)],
                                preserve_index=False) \
        .cast(_EMPTY_FRONTIER.schema)


def _admit_stage(ds: rd.Dataset, robots_ref, shards: SeenShards) -> rd.Dataset:
    """Candidate admission: within-round exact dedup on ``url_hash``
    (winner: max priority, min depth — deterministic, SURVEY §2.7 D-1),
    robots gate (broadcast semi-join, J-2), and the seen-filter
    check-and-mark, co-located per seen-shard.

    Correct because ``url_hash`` fully determines the shard — every
    duplicate of a URL lands in the same reducer, so per-shard dedup is
    global dedup. A per-batch combiner pre-dedups before the exchange so
    hub-page link explosions shrink before moving.

    Shape (round 3): the shard co-location is a DIRECT hash exchange on
    raw Ray tasks — split each block into ``n_shards`` slices
    (``num_returns``), one reduce task per shard concatenates only its
    slices — replacing ``groupby(shard)``, whose sort-based shuffle
    (sample + range-sort + reduce) cost 6-12 s per heavy round at 8
    cpus and was the dominant non-scaling stage. An all-to-all exchange
    is inherent to admission; paying a full sort to hash-partition into
    16 fixed shards is not. Intermediate object count is
    blocks x n_shards, same as any shuffle; per-shard admission logic
    (sort -> dedup -> robots -> ONE sorted-unique actor call) is
    byte-identical to the groupby version, so the cuckoo-state oracle
    equality is unchanged."""
    n_shards = shards.n_shards
    actors = shards.actors

    def pre_combine(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hash_hex", "priority", "depth"],
                            ascending=[True, False, True], kind="mergesort")
        df = df.drop_duplicates("hash_hex", keep="first")
        df["shard"] = shard_of_many(list(df["url_hash"]), n_shards)
        return df

    pre = _as_arrow(ds.map_batches(pre_combine, batch_format="pandas")) \
        .materialize()
    block_refs = pre.to_arrow_refs()
    if not block_refs:
        return rd.from_arrow(_EMPTY_FRONTIER)
    splits = [_shard_split_task.options(num_returns=n_shards)
              .remote(ref, n_shards) for ref in block_refs]
    if n_shards == 1:
        splits = [[s] for s in splits]
    admitted = [
        _shard_admit_task.remote(robots_ref, actors[k],
                                 *[sp[k] for sp in splits])
        for k in range(n_shards)
    ]
    return rd.from_arrow_refs(admitted)


def extract_batch(batch: pa.Table, score: bool = False) -> pa.Table:
    """html -> (text_extracted, links[, scores]) per page. Stateless task
    (the extractor's regexes are compiled once per worker process at
    module import, which persists across rounds — cheaper than
    re-spawning an actor pool every round). The emitted text is the
    engine's own extraction; the byte-identical-per-url invariant is
    asserted against the corpus golden column in tests.

    ``score=True`` additionally runs the per-page enrichment bundle
    (token counts, quality ratios, simhash fingerprint, language-ID —
    functions/textstats.py), which is what a production crawl pipeline
    computes at fetch time; it does not affect crawl semantics."""
    htmls = batch.column("html").to_pylist()
    urls = batch.column("url").to_pylist()
    texts = [extract_text(h) for h in htmls]
    links = [extract_links(h, u) for h, u in zip(htmls, urls)]
    out = batch.drop_columns(["html"])
    out = out.append_column("text_extracted", pa.array(texts, pa.string())) \
             .append_column("links", pa.array(links, pa.list_(pa.string())))
    if score:
        from ..functions.textstats import score_texts

        scores = score_texts(texts)
        mh = scores["minhash"]                    # (n, num_perm) uint64
        mh_col = pa.ListArray.from_arrays(
            pa.array(np.arange(len(mh) + 1, dtype=np.int32) * mh.shape[1]),
            pa.array(mh.reshape(-1)))             # flat buffer, no pylists
        out = (
            out.append_column("n_tokens", pa.array(scores["n_tokens"], pa.int64()))
            .append_column("n_bpe_tokens", pa.array(scores["n_bpe_tokens"], pa.int64()))
            .append_column("stopword_ratio", pa.array(scores["stopword_ratio"], pa.float64()))
            .append_column("mean_word_len", pa.array(scores["mean_word_len"], pa.float64()))
            .append_column("simhash", pa.array(scores["simhash"], pa.uint64()))
            .append_column("minhash", mh_col)
            .append_column("lang_pred", pa.array(list(scores["lang_pred"]), pa.string()))
        )
    return out


class ExtractWithRetry:
    """Fetch/extract stage body under the application retry policy
    (functions/retry.py): a transient batch failure is retried in place
    with backoff — order-preserving, budgeted — and every output row
    records how many attempts its batch needed (``fetch_attempts``), so
    lineage can aggregate retry counters per round (the reference
    CrawlerTaskLog's items_failed/retry accounting,
    api/src/models/task_log.py:11-46).

    ``failure_rate`` > 0 injects ONE deterministic transient failure
    for a batch whose first url_hash falls under the rate — the retry
    then succeeds, so the crawl result is provably identical to the
    no-failure run (asserted in tests/test_frontier.py)."""

    def __init__(self, score: bool, attempts: int, failure_rate: float):
        from ..functions.retry import RetryPolicy
        self.score = score
        self.failure_rate = failure_rate
        self.policy = RetryPolicy(max_attempts=attempts,
                                  backoff_base_s=0.01)
        self._failed_once: set[bytes] = set()

    def _base(self, batch: pa.Table) -> pa.Table:
        from ..functions.retry import TransientError
        if self.failure_rate > 0 and batch.num_rows:
            key = batch.column("url_hash")[0].as_py()
            if key not in self._failed_once:
                u = int.from_bytes(key[:4], "little") / 2**32
                if u < self.failure_rate:
                    self._failed_once.add(key)
                    raise TransientError("injected transient fetch failure")
        return extract_batch(batch, score=self.score)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.retry import run_with_retry
        out, attempts, err = run_with_retry(self._base, batch, self.policy)
        out = out.append_column(
            "fetch_attempts",
            pa.array(np.full(out.num_rows, attempts, np.int32), pa.int32()))
        # sample the retried fault's message on the batch's first row
        # (nullable elsewhere) — lineage truncates to the first 10, the
        # reference's LoadResult error-list semantics
        sample = ([err] + [None] * (out.num_rows - 1)) if err and \
            out.num_rows else [None] * out.num_rows
        return out.append_column("fetch_error_sample",
                                 pa.array(sample, pa.string()))


def _explode_links(batch: pa.Table, decay: float) -> pa.Table:
    """(url, links, priority, depth) -> one candidate row per link."""
    links = batch.column("links").to_pylist()
    urls = batch.column("url").to_pylist()
    prio = batch.column("priority").to_numpy(zero_copy_only=False)
    depth = batch.column("depth").to_numpy(zero_copy_only=False)
    out_url, out_base, out_prio, out_depth = [], [], [], []
    for i, ls in enumerate(links):
        for link in ls:
            out_url.append(link)
            out_base.append(urls[i])
            out_prio.append(prio[i] * decay)
            out_depth.append(depth[i] + 1)
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "base": pa.array(out_base, pa.string()),
            "priority": pa.array(out_prio, pa.float64()),
            "depth": pa.array(np.asarray(out_depth, np.int32), pa.int32()),
        }
    )


# --------------------------------------------------------------------------
# Crawl driver loop
# --------------------------------------------------------------------------

def _round_dir(out_dir: str, r: int) -> str:
    return os.path.join(out_dir, "rounds", f"round={r:04d}")


def _ingest(ds_candidates: rd.Dataset, robots_ref, shards: SeenShards) -> rd.Dataset:
    """candidates -> canonical, deduped, robots-gated, never-seen frontier
    rows (and marks them seen). One map + one shuffle."""
    ds = ds_candidates.map_batches(_canonicalize_stage, batch_format="pyarrow")
    return _admit_stage(ds, robots_ref, shards)


def crawl(pages_path: str, out_dir: str, cfg: CrawlConfig,
          seeds: pa.Table, robots: pa.Table, *,
          resume: bool = False) -> dict:
    """Run (or resume) the crawl. Returns a summary dict with totals."""
    os.makedirs(out_dir, exist_ok=True)
    idx_dir = os.path.join(out_dir, "pages_idx")
    build_fetch_index(pages_path, idx_dir, cfg.n_buckets)

    robots_idx = RobotsIndex(robots)
    robots_ref = ray.put(robots_idx)

    start_round = 0
    # pending is dispatched per round on its row count + control plane:
    # a TGParts (task-graph rounds), rd.Dataset (dataset-path rounds),
    # pa.Table (driver fast-path rounds), or a checkpoint file list
    # (resume — converted lazily by whichever path runs next)
    pending = None
    n_pend = 0
    shards: SeenShards
    if resume:
        last = -1
        import re as _re
        rounds_root = os.path.join(out_dir, "rounds")
        if os.path.isdir(rounds_root):
            for name in sorted(os.listdir(rounds_root)):
                # a mid-round kill leaves 'round=NNNN.tmp' dirs here; only
                # complete 'round=NNNN' names are candidates
                if not _re.fullmatch(r"round=\d{4}", name):
                    continue
                r = int(name.split("=")[1])
                if os.path.exists(os.path.join(rounds_root, name, "_SUCCESS")):
                    last = max(last, r)
        if last >= 0:
            rdir = _round_dir(out_dir, last)
            shards = SeenShards(cfg.n_shards, cfg.seen_capacity_per_shard,
                                restore_dir=os.path.join(rdir, "seen"))
            fdir = os.path.join(rdir, "frontier_next")
            meta = json.load(open(os.path.join(rdir, "meta.json")))
            n_pend = meta["pending"]
            if n_pend > 0:
                import glob as _glob
                pending = sorted(_glob.glob(os.path.join(fdir,
                                                         "*.parquet")))
            start_round = last + 1
            if n_pend == 0:
                shards.kill()  # nothing to resume — don't leak shard actors
                return _summarize(out_dir, start_round)
        else:
            resume = False
    if not resume:
        shards = SeenShards(cfg.n_shards, cfg.seen_capacity_per_shard)
        seeds_tbl = pa.table({
            "url": seeds.column("url"),
            "priority": seeds.column("priority"),
            "depth": pa.array(np.zeros(seeds.num_rows, np.int32), pa.int32()),
        })
        if cfg.driver_small_round_rows and \
                seeds.num_rows <= cfg.driver_small_round_rows:
            new_df = _admit_driver(seeds_tbl, robots_idx, shards)
            pending = pa.Table.from_pandas(
                new_df[list(_FRONTIER_COLS)], preserve_index=False) \
                .cast(_EMPTY_FRONTIER.schema) if len(new_df) else None
            n_pend = len(new_df)
        elif cfg.control_plane == "task":
            from .frontier_tg import tg_ingest_table
            state = tg_ingest_table(seeds_tbl, robots_ref, shards,
                                    cfg.host_buckets)
            n_pend = state.n
            pending = state if n_pend else None
        else:
            ds = _ingest(rd.from_arrow(seeds_tbl), robots_ref,
                         shards).materialize()
            n_pend = ds.count()
            pending = ds if n_pend else None
        if n_pend == 0:
            pending = None

    try:
        from .frontier_tg import (
            TGParts,
            parts_from_dataset,
            parts_from_files,
            parts_from_table,
            parts_to_table,
            run_round_tg,
        )
        for r in range(start_round, cfg.max_rounds):
            if pending is None:
                break
            small = (cfg.driver_small_round_rows
                     and n_pend <= cfg.driver_small_round_rows)
            try:
                if small:
                    if isinstance(pending, rd.Dataset):
                        batches = list(pending.iter_batches(
                            batch_format="pyarrow", batch_size=65536))
                        pending = (pa.concat_tables(batches,
                                                    promote_options="default")
                                   if batches else _EMPTY_FRONTIER)
                    elif isinstance(pending, TGParts):
                        pending = parts_to_table(pending.parts)
                    elif isinstance(pending, list):
                        pending = pa.concat_tables(
                            [pq.read_table(f) for f in pending],
                            promote_options="default") \
                            if pending else _EMPTY_FRONTIER
                    pending = _run_round_small(r, pending, idx_dir, out_dir,
                                               cfg, robots_idx, shards)
                    n_pend = pending.num_rows if pending is not None else 0
                elif cfg.control_plane == "task":
                    if isinstance(pending, pa.Table):
                        pending = TGParts(
                            parts_from_table(pending, cfg.host_buckets),
                            n_pend)
                    elif isinstance(pending, list):
                        pending = TGParts(
                            parts_from_files(pending, cfg.host_buckets),
                            n_pend)
                    elif isinstance(pending, rd.Dataset):
                        pending = TGParts(
                            parts_from_dataset(pending, cfg.host_buckets),
                            n_pend)
                    pending = run_round_tg(r, pending, idx_dir, out_dir,
                                           cfg, robots_ref, shards)
                    n_pend = pending.n if pending is not None else 0
                else:
                    if isinstance(pending, pa.Table):
                        pending = rd.from_arrow(pending)
                    elif isinstance(pending, list):
                        pending = rd.read_parquet(pending)
                    elif isinstance(pending, TGParts):
                        pending = rd.from_arrow_refs(
                            [p for pieces in pending.parts for p in pieces])
                    pending = _run_round(r, pending, idx_dir, out_dir, cfg,
                                         robots_ref, shards)
                    n_pend = pending.count() if pending is not None else 0
            except Exception as err:
                # persist a status=failed task-log record, then re-raise
                # (the round dir stays .tmp, so resume replays it)
                _write_failure_record(out_dir, r, err)
                raise
    finally:
        shards.kill()
    return _summarize(out_dir, cfg.max_rounds)


def _prepare_round_dir(out_dir: str, r: int) -> tuple[str, str]:
    rdir = _round_dir(out_dir, r)
    tmp = rdir + ".tmp"
    if os.path.isdir(tmp):
        import shutil
        shutil.rmtree(tmp)
    os.makedirs(tmp, exist_ok=True)
    return rdir, tmp


def _bucket_metrics(extracted, n_buckets: int):
    """Per-PARTITION fetch metrics (north_rule: per-partition lineage):
    pages fetched + retry count per index bucket this round, plus up to
    10 sampled retry-error messages (the reference LoadResult's
    first-10-errors list, api/src/etl/base/loader.py:58). Computed as
    fixed-size per-batch count vectors summed on the driver — traffic is
    O(blocks x n_buckets), never O(pages). Returns (rows, samples)."""

    def partial(t: pa.Table) -> pa.Table:
        b = bucket_of_many(t.column("url_hash").to_pylist(), n_buckets)
        att = t.column("fetch_attempts").to_numpy(zero_copy_only=False)
        counts = np.bincount(b, minlength=n_buckets).astype(np.int64)
        rets = np.bincount(b, weights=att - 1,
                           minlength=n_buckets).astype(np.int64)
        errs: list[str] = []
        if "fetch_error_sample" in t.column_names:
            col = t.column("fetch_error_sample")
            errs = col.drop_null().to_pylist()[:3]
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary()),
                         "rets": pa.array([rets.tobytes()], pa.binary()),
                         "errs": pa.array([errs],
                                          pa.list_(pa.string()))})

    counts = np.zeros(n_buckets, np.int64)
    rets = np.zeros(n_buckets, np.int64)
    samples: list[str] = []
    if isinstance(extracted, pa.Table):
        parts = [partial(extracted)] if extracted.num_rows else []
    else:
        parts = extracted.map_batches(
            partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow")
    for batch in parts:
        for raw_c, raw_r, errs in zip(batch.column("counts").to_pylist(),
                                      batch.column("rets").to_pylist(),
                                      batch.column("errs").to_pylist()):
            counts += np.frombuffer(raw_c, dtype=np.int64)
            rets += np.frombuffer(raw_r, dtype=np.int64)
            if len(samples) < 10:
                samples.extend(errs)
    rows = [{"bucket": int(b), "rows_out": int(counts[b]),
             "retries": int(rets[b])} for b in np.nonzero(counts)[0]]
    return rows, samples[:10]


def _finish_round(tmp: str, rdir: str, r: int, t0: float, n_pending: int,
                  n_selected: int, n_fetched: int, n_next: int,
                  order_tbl: pa.Table | None, shards: SeenShards,
                  stage_t: dict, retries: int = 0,
                  cfg: CrawlConfig | None = None,
                  bucket_rows: list[dict] | None = None,
                  error_samples: list[str] | None = None) -> None:
    from ..monitor import evaluate_alerts
    from ..schema import LINEAGE_SCHEMA

    if order_tbl is not None:  # driver path; distributed rounds write order/
        pq.write_table(order_tbl, os.path.join(tmp, "order.parquet"))
    shards.save(os.path.join(tmp, "seen"))
    wall_ms = (time.perf_counter() - t0) * 1000
    # task-log lifecycle rows (reference CrawlerTaskLog envelope,
    # api/src/models/task_log.py:11-46): one per stage + round summary
    lineage = []
    for stage, secs in stage_t.items():
        if not isinstance(secs, (int, float)):
            continue  # e.g. the 'mode' marker
        lineage.append({
            "round": r, "task_id": f"r{r:04d}:{stage}", "stage": stage,
            "status": "success", "rows_in": -1, "rows_out": -1,
            "rows_rejected": -1, "retries": 0,
            "wall_ms": round(float(secs) * 1000, 3),
            "parameters": "{}", "result_summary": "{}"})
    for row in (bucket_rows or []):
        lineage.append({
            "round": r, "task_id": f"r{r:04d}:fetch:bucket={row['bucket']}",
            "stage": "fetch_partition", "status": "success",
            "rows_in": -1, "rows_out": row["rows_out"],
            "rows_rejected": -1, "retries": row["retries"],
            "wall_ms": -1.0,
            "parameters": json.dumps({"bucket": row["bucket"]}),
            "result_summary": "{}"})
    params = {}
    if cfg is not None:
        params = {"max_per_host_per_round": cfg.max_per_host_per_round,
                  "politeness_window_ms": cfg.politeness_window_ms,
                  "fetch_retry_attempts": cfg.fetch_retry_attempts}
    # seen-filter saturation telemetry (round 5): one warning row per
    # shard past 0.8 load — re-shard long before the exact overflow set
    # starts absorbing keys (state/seen.py sizing note)
    for st in shards.stats():
        if st["load"] > 0.8 or st["overflow"]:
            lineage.append({
                "round": r, "task_id": f"r{r:04d}:seen:shard={st['shard']}",
                "stage": "seen_saturation", "status": "warning",
                "rows_in": -1, "rows_out": st["count"], "rows_rejected": -1,
                "retries": 0, "wall_ms": -1.0,
                "parameters": json.dumps({"shard": st["shard"]}),
                "result_summary": json.dumps(
                    {"load": round(st["load"], 4),
                     "overflow": st["overflow"]})})
    lineage.append({
        "round": r, "task_id": f"r{r:04d}:round", "stage": "round",
        "status": "success", "rows_in": n_pending, "rows_out": n_fetched,
        "rows_rejected": n_selected - n_fetched, "retries": int(retries),
        "wall_ms": wall_ms, "parameters": json.dumps(params),
        "result_summary": json.dumps({"selected": n_selected,
                                      "fetched": n_fetched,
                                      "pending_next": n_next,
                                      # reference LoadResult keeps the
                                      # first 10 error strings
                                      # (api/src/etl/base/loader.py:58)
                                      "sample_errors":
                                      (error_samples or [])[:10]})})
    lineage_tbl = pa.Table.from_pylist(lineage, schema=LINEAGE_SCHEMA)
    pq.write_table(lineage_tbl, os.path.join(tmp, "lineage.parquet"))
    # event-emission analog of the reference workflow's per-task Pub/Sub
    # publish (workflows/krx_etl_workflow.yaml:240-252, 274-328): every
    # round appends its threshold-evaluation result as an alerts file —
    # usually empty, one row per violation
    pq.write_table(evaluate_alerts(lineage_tbl),
                   os.path.join(tmp, "alerts.parquet"))
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({"round": r, "pending": n_next, "selected": n_selected,
                   "fetched": n_fetched, "retries": int(retries),
                   "wall_ms": wall_ms, "stages": stage_t}, f)
    os.rename(tmp, rdir)
    with open(os.path.join(rdir, "_SUCCESS"), "w") as f:
        f.write("ok")


def _write_failure_record(out_dir: str, r: int, err: BaseException) -> None:
    """Persist a status=failed task-log row for a round that raised —
    the reference records failed tasks with their error message
    (api/src/models/task_log.py 'failed' status + error field)."""
    from ..schema import LINEAGE_SCHEMA

    fdir = os.path.join(out_dir, "failures")
    os.makedirs(fdir, exist_ok=True)
    row = [{"round": r, "task_id": f"r{r:04d}:round", "stage": "round",
            "status": "failed", "rows_in": -1, "rows_out": -1,
            "rows_rejected": -1, "retries": 0, "wall_ms": -1.0,
            "parameters": "{}",
            "result_summary": json.dumps(
                {"error": f"{type(err).__name__}: {err}"[:500]})}]
    tbl = pa.Table.from_pylist(row, schema=LINEAGE_SCHEMA)
    pq.write_table(tbl, os.path.join(fdir, f"round={r:04d}.parquet"))
    # emit the task_failed alert alongside (Pub/Sub failure-event analog)
    from ..monitor import evaluate_alerts
    pq.write_table(evaluate_alerts(tbl),
                   os.path.join(fdir, f"alerts-round={r:04d}.parquet"))


# --------------------------------------------------------------------------
# Distributed schedule (large rounds): the selected frontier NEVER
# reaches the driver. seq is assigned by a distributed sort + per-block
# offsets; the fetch is a per-bucket co-partitioned join against the
# disk-bucketed pages index. Only block REFS and per-bucket row counts
# (bounded by n_buckets) touch the driver. Raw Ray tasks are used here
# because the Dataset API cannot express a co-partitioned join against
# a Hive-partitioned layout without shuffling the (html-bearing) big
# side; everything downstream returns to Dataset via from_arrow_refs.
# --------------------------------------------------------------------------

_FETCH_COLS = ["url", "url_hash", "host", "lang", "html"]


@ray.remote
def _block_nrows(t) -> int:
    return len(t) if hasattr(t, "__len__") else t.num_rows


@ray.remote
def _block_add_seq(t: pa.Table, offset: int, r: int,
                   order_path: str | None) -> pa.Table:
    """Stamp the global seq onto one sorted block; when ``order_path``
    is given, also write this block's slice of the crawl-order log —
    fusing the order sink into the seq pass saves a whole Dataset
    execution per round."""
    t = t.append_column(
        "seq", pa.array(np.arange(offset, offset + t.num_rows,
                                  dtype=np.int64), pa.int64()))
    if order_path is not None:
        pq.write_table(pa.table({
            "round": pa.array(np.full(t.num_rows, r, np.int32), pa.int32()),
            "seq": t.column("seq"),
            "url": t.column("url"),
        }), order_path)
    return t


@ray.remote
def _split_block_by_bucket(t: pa.Table, n_buckets: int):
    """num_returns=n_buckets+1: per-bucket sub-schedules (None when that
    bucket is untouched by this block) + the per-bucket count vector.
    Only the join columns ship to the fetch tasks."""
    sub = t.select(["url_hash", "seq", "priority", "depth"])
    b = bucket_of_many(sub.column("url_hash").to_pylist(), n_buckets)
    out: list = []
    counts = np.zeros(n_buckets, np.int64)
    for k in range(n_buckets):
        mask = b == k
        n = int(mask.sum())
        counts[k] = n
        out.append(sub.filter(pa.array(mask)) if n else None)
    out.append(counts)
    return tuple(out)


def _fetch_bucket_local(paths: list[str], pieces: list[pa.Table],
                        columns: list[str]) -> pa.Table:
    """Read ONE index bucket (column-pruned) and inner-join it against
    that bucket's schedule pieces on the binary url_hash.

    Round 3 memory diet: instead of concatenating the FULL bucket and
    joining, row groups are pruned MANUALLY against the scheduled hash
    set via parquet min/max statistics (the index is written
    url_hash-sorted, so each file/row-group covers a narrow contiguous
    hash range), the surviving groups are read single-threaded
    (``use_threads=False`` — 16 of these tasks run concurrently; a
    per-task Arrow scanner pool oversubscribes the box, measured -35%
    at 8 cpus with ``pyarrow.dataset.to_table(filter=...)``), and only
    ``is_in``-matching rows ever materialize. The join then runs on
    |schedule|-sized input, not |bucket|-sized. Plain function so the
    driver fast path can call it inline (round 4); the distributed
    rounds run it inside ``_fetch_bucket_task``."""
    import bisect

    sched = pa.concat_tables(pieces)
    want = sched.column("url_hash").combine_chunks()
    wanted_sorted = sorted(want.to_pylist())
    tabs = []
    schema = None
    for p in paths:
        f = pq.ParquetFile(p)
        if schema is None:
            schema = f.schema_arrow
        try:
            ci = f.schema_arrow.names.index("url_hash")
        except ValueError:
            ci = -1
        keep = []
        for i in range(f.metadata.num_row_groups):
            if ci >= 0:
                st = f.metadata.row_group(i).column(ci).statistics
                if st is not None and st.has_min_max:
                    j = bisect.bisect_left(wanted_sorted, st.min)
                    if j >= len(wanted_sorted) or wanted_sorted[j] > st.max:
                        continue  # no scheduled hash in this group's range
            keep.append(i)
        if keep:
            t = f.read_row_groups(keep, columns=columns, use_threads=False)
            t = t.filter(pc.is_in(t.column("url_hash"), value_set=want))
            if t.num_rows:
                tabs.append(t)
    if not tabs:
        idx = schema.empty_table().select(columns)
    else:
        idx = pa.concat_tables(tabs)
    return idx.join(sched, keys="url_hash", join_type="inner")


@ray.remote
def _fetch_bucket_task(paths: list[str], sched_refs: list,
                       columns: list[str]) -> pa.Table:
    pieces = [s for s in ray.get(list(sched_refs)) if s is not None]
    return _fetch_bucket_local(paths, pieces, columns)


def _assign_seq(selected: rd.Dataset, r: int, order_dir: str | None):
    """Distributed total crawl order: sort by (-priority, hash_hex),
    then stamp a global seq from per-block offsets (block row counts
    come from the sorted blocks' METADATA — no extra task round-trip)
    and write the order log from the same tasks. Returns the ordered
    block refs (frontier cols + seq) and their row counts."""
    sorted_ds = selected.sort(["priority", "hash_hex"],
                              descending=[True, False]).materialize()
    # public-API block counts: one tiny task per block returning an int;
    # Ray's locality-aware scheduling runs each where its block lives,
    # so nothing ships (replaces the private iter_internal_ref_bundles
    # metadata walk, per round-2 review)
    all_refs = sorted_ds.to_arrow_refs()
    meta_counts = ray.get([_block_nrows.remote(x) for x in all_refs])
    # drop empty blocks: upstream pandas map_groups can emit ZERO-COLUMN
    # empty blocks that Ray passes through map stages untouched — no
    # rows but also no schema, and they poison the per-bucket split
    # (observed: KeyError url_hash on a fresh 240k-page run)
    refs = [x for x, c in zip(all_refs, meta_counts) if c]
    counts = [c for c in meta_counts if c]
    offs = np.zeros(len(counts), np.int64)
    if len(counts) > 1:
        np.cumsum(counts[:-1], out=offs[1:])
    if order_dir is not None:
        os.makedirs(order_dir, exist_ok=True)
    seq_refs = [
        _block_add_seq.remote(
            ref, int(o), r,
            os.path.join(order_dir, f"part-{i:05d}.parquet")
            if order_dir is not None else None)
        for i, (ref, o) in enumerate(zip(refs, offs))
    ]
    return seq_refs, counts


def _fetch_extract_distributed(seq_refs: list, idx_dir: str,
                               cfg: CrawlConfig):
    """Per-bucket co-partitioned fetch join + extract. Returns a
    materialized Dataset of extracted pages, or None."""
    import glob as _glob

    split_returns = [
        _split_block_by_bucket.options(
            num_returns=cfg.n_buckets + 1).remote(r, cfg.n_buckets)
        for r in seq_refs
    ]
    per_block_counts = ray.get([rets[-1] for rets in split_returns])
    if not per_block_counts:
        return None
    total_per_bucket = np.sum(per_block_counts, axis=0)
    fetch_refs = []
    for b in np.nonzero(total_per_bucket)[0]:
        paths = sorted(_glob.glob(
            os.path.join(idx_dir, f"bucket={int(b)}", "*.parquet")))
        if not paths:
            continue
        fetch_refs.append(_fetch_bucket_task.remote(
            paths, [rets[int(b)] for rets in split_returns], _FETCH_COLS))
    if not fetch_refs:
        return None
    extract_fn = ExtractWithRetry(cfg.score_pages, cfg.fetch_retry_attempts,
                                  cfg.fetch_failure_rate)
    return (
        rd.from_arrow_refs(fetch_refs)
        .map_batches(extract_fn, batch_format="pyarrow", batch_size=1024)
        .materialize()
    )


def _build_schedule(sched: pd.DataFrame, r: int):
    """Total crawl order over the bounded schedule -> (sorted frame with
    seq, order table, url_hash -> (seq, priority, depth) map)."""
    sched = sched.sort_values(["priority", "hash_hex"],
                              ascending=[False, True], kind="mergesort")
    sched = sched.assign(seq=np.arange(len(sched), dtype=np.int64))
    order_tbl = pa.table({
        "round": pa.array(np.full(len(sched), r, np.int32), pa.int32()),
        "seq": pa.array(sched["seq"].to_numpy(), pa.int64()),
        "url": pa.array(sched["url"].tolist(), pa.string()),
    })
    sched_map = {
        h: (int(s), float(p), int(d))
        for h, s, p, d in zip(sched["url_hash"], sched["seq"],
                              sched["priority"], sched["depth"])
    }
    return sched, order_tbl, sched_map


def _fetch_extract_driver(sched: pd.DataFrame, idx_dir: str,
                          cfg: CrawlConfig) -> pa.Table | None:
    """Inline fetch+extract for TINY schedules (round 4): a Ray Dataset
    pipeline costs 1-3 s of fixed launch latency regardless of size —
    the BFS warm-up rounds of a sparse-seed crawl paid that for 16-900
    pages each. Same leaf machinery as the distributed path: per-bucket
    pruned row-group reads (``_fetch_bucket_local``) + ``ExtractWithRetry``
    over 1024-row slices (the pipeline's batch size, so the injected-
    failure semantics stay comparable)."""
    import glob as _glob

    hl = list(sched["url_hash"])
    if not hl:
        return None
    buckets = bucket_of_many(hl, cfg.n_buckets)
    sub_tbl = pa.table({
        "url_hash": pa.array(hl, pa.binary()),
        "seq": pa.array(sched["seq"].to_numpy(), pa.int64()),
        "priority": pa.array(sched["priority"].to_numpy(), pa.float64()),
        "depth": pa.array(sched["depth"].to_numpy().astype(np.int32),
                          pa.int32()),
    })
    tabs = []
    for b in sorted(set(buckets.tolist())):
        paths = sorted(_glob.glob(
            os.path.join(idx_dir, f"bucket={b}", "*.parquet")))
        if not paths:
            continue
        sub = sub_tbl.filter(pa.array(buckets == b))
        t = _fetch_bucket_local(paths, [sub], _FETCH_COLS)
        if t.num_rows:
            tabs.append(t)
    if not tabs:
        return None
    t = pa.concat_tables(tabs, promote_options="default")
    extract_fn = ExtractWithRetry(cfg.score_pages, cfg.fetch_retry_attempts,
                                  cfg.fetch_failure_rate)
    outs = [extract_fn(t.slice(i, 1024)) for i in range(0, t.num_rows, 1024)]
    return pa.concat_tables(outs, promote_options="default")


def _fetch_extract(sched: pd.DataFrame, sched_map: dict, idx_dir: str,
                   cfg: CrawlConfig):
    """Distributed fetch (bucketed semi-join against the pages index) +
    extract/score. Returns a materialized Dataset or None."""
    buckets = sorted(set(bucket_of_many(list(sched["url_hash"]),
                                        cfg.n_buckets).tolist()))
    if not buckets:
        return None
    import glob as _glob
    paths = []
    for b in buckets:
        paths.extend(sorted(_glob.glob(
            os.path.join(idx_dir, f"bucket={b}", "*.parquet"))))
    if not paths:
        return None
    sched_ref = ray.put(sched_map)

    def fetch_filter(batch: pa.Table) -> pa.Table:
        smap = ray.get(sched_ref)
        hashes = batch.column("url_hash").to_pylist()
        keep, seqs, prios, depths = [], [], [], []
        for h in hashes:
            hit = smap.get(h)
            keep.append(hit is not None)
            if hit is not None:
                seqs.append(hit[0]); prios.append(hit[1]); depths.append(hit[2])
        batch = batch.filter(pa.array(keep))
        return (
            batch.append_column("seq", pa.array(seqs, pa.int64()))
            .append_column("priority", pa.array(prios, pa.float64()))
            .append_column("depth", pa.array(depths, pa.int32()))
        )

    extract_fn = ExtractWithRetry(cfg.score_pages, cfg.fetch_retry_attempts,
                                  cfg.fetch_failure_rate)
    # NOTE: the corpus' golden ``text`` column is NOT read — the engine
    # re-extracts from html (that's the work); reading it would double
    # the scan bytes for nothing (tests compare against the golden
    # column by re-reading the corpus directly).
    # batch_size balances two measured failure modes: 2048 bundled the
    # small index-file blocks into too-few fat tasks (28 tasks on 32
    # cpus), while per-block tasks (batch_size=None over ~300-row files)
    # drowned in per-task overhead at bench scale. 1024 keeps ≥2 tasks
    # per core per round on every corpus size used here.
    return (
        rd.read_parquet(paths, columns=["url", "url_hash", "host", "lang",
                                        "html"])
        .map_batches(fetch_filter, batch_format="pyarrow", batch_size=1024)
        .map_batches(extract_fn, batch_format="pyarrow", batch_size=1024)
        .materialize()
    )


def _pages_from_extracted(t: pa.Table, r: int) -> pa.Table:
    drop = ["links"]
    if "fetch_error_sample" in t.column_names:
        drop.append("fetch_error_sample")  # lineage-only, not page data
    t = t.drop_columns(drop)
    idx = t.schema.get_field_index("text_extracted")
    return t.rename_columns(
        ["text" if i == idx else n for i, n in enumerate(t.column_names)]
    ).append_column("round", pa.array(np.full(t.num_rows, r, np.int32),
                                      pa.int32()))


_EMPTY_FRONTIER = pa.table(
    {c: pa.array([], t) for c, t in zip(
        _FRONTIER_COLS,
        [pa.string(), pa.binary(), pa.string(), pa.string(),
         pa.float64(), pa.int32()])})


def _admit_driver(cand_tbl: pa.Table, robots_idx: RobotsIndex,
                  shards: SeenShards) -> pd.DataFrame:
    """Driver-side admission over a BOUNDED candidate table — same
    semantics as _admit_stage: canonicalize, dedup (max priority, min
    depth), robots gate, one sorted check_and_insert per shard."""
    canon = _canonicalize_stage(cand_tbl).to_pandas()
    canon = canon.sort_values(["hash_hex", "priority", "depth"],
                              ascending=[True, False, True],
                              kind="mergesort")
    canon = canon.drop_duplicates("hash_hex", keep="first")
    if len(canon):
        mask = robots_idx.allowed_mask(canon["host"].to_numpy(dtype=object),
                                       canon["url"].to_numpy(dtype=object))
        canon = canon[mask]
    if not len(canon):
        return _EMPTY_FRONTIER.to_pandas()
    shard_ids = shard_of_many(list(canon["url_hash"]), shards.n_shards)
    canon = canon.assign(__shard=shard_ids)
    keep_parts = []
    for s, g in canon.groupby("__shard", sort=True):
        g = g.sort_values("hash_hex", kind="mergesort")
        new = ray.get(shards.actors[int(s)]
                      .check_and_insert.remote(list(g["url_hash"])))
        part = g[np.asarray(new, dtype=bool)]
        if len(part):
            keep_parts.append(part)
    if not keep_parts:
        return _EMPTY_FRONTIER.to_pandas()
    return pd.concat(keep_parts).drop(columns="__shard")


def _run_round_small(r: int, pending_tbl: pa.Table, idx_dir: str,
                     out_dir: str, cfg: CrawlConfig, robots_idx: RobotsIndex,
                     shards: SeenShards):
    """Driver fast-path for a small round: identical semantics to the
    distributed path (same leaf functions, same total orders, same
    one-sorted-call-per-shard seen contract) over in-memory Arrow —
    only fetch+extract runs as a Ray pipeline. The control data here is
    bounded by ``driver_small_round_rows``."""
    t0 = time.perf_counter()
    rdir, tmp = _prepare_round_dir(out_dir, r)
    stage_t: dict[str, float] = {"mode": "driver"}

    df = pending_tbl.to_pandas()
    # politeness selection: per-host top-budget, same sort keys
    df = df.sort_values(["priority", "hash_hex"],
                        ascending=[False, True], kind="mergesort")
    budgets = df["host"].map(
        lambda h: cfg.host_budget(robots_idx.delay_ms.get(h, 1000)))
    rank = df.groupby("host", sort=False).cumcount()
    sel_mask = (rank < budgets).to_numpy()
    sched = df[sel_mask]
    deferred = df[~sel_mask]
    n_pending, n_selected = len(df), len(sched)

    sched, order_tbl, sched_map = _build_schedule(sched, r)

    _t = time.perf_counter()
    if n_selected <= 1024:
        # inline fetch: a Ray pipeline costs seconds of fixed launch
        # latency — pure overhead for a <=1-batch schedule
        ex_tbl = _fetch_extract_driver(sched, idx_dir, cfg)
    else:
        extracted = _fetch_extract(sched, sched_map, idx_dir, cfg)
        ex_tbl = pa.concat_tables(
            list(extracted.iter_batches(batch_format="pyarrow",
                                        batch_size=65536)),
            promote_options="default") \
            if extracted is not None and extracted.count() else None
    stage_t["fetch_extract"] = round(time.perf_counter() - _t, 3)

    _t = time.perf_counter()
    n_fetched = 0
    retries = 0
    bucket_rows: list[dict] = []
    err_samples: list[str] = []
    new_rows = _EMPTY_FRONTIER.to_pandas()
    if ex_tbl is not None and ex_tbl.num_rows:
        n_fetched = ex_tbl.num_rows
        retries = int(pc.sum(ex_tbl.column("fetch_attempts")).as_py()
                      or 0) - n_fetched
        bucket_rows, err_samples = _bucket_metrics(ex_tbl, cfg.n_buckets)
        pq_dir = os.path.join(tmp, "pages")
        os.makedirs(pq_dir, exist_ok=True)
        pq.write_table(_pages_from_extracted(ex_tbl, r),
                       os.path.join(pq_dir, "part-0.parquet"))
        # expand links -> candidates -> admit (driver, same semantics)
        cand = _explode_links(
            ex_tbl.select(["url", "links", "priority", "depth"]),
            cfg.link_priority_decay)
        new_rows = _admit_driver(cand, robots_idx, shards)
    stage_t["admit"] = round(time.perf_counter() - _t, 3)

    next_df = pd.concat([deferred, new_rows], ignore_index=True) \
        if len(new_rows) else deferred.reset_index(drop=True)
    n_next = len(next_df)
    next_tbl = pa.Table.from_pandas(
        next_df[list(_FRONTIER_COLS)], preserve_index=False) \
        .cast(_EMPTY_FRONTIER.schema) if n_next else _EMPTY_FRONTIER
    fdir = os.path.join(tmp, "frontier_next")
    os.makedirs(fdir, exist_ok=True)
    if n_next:
        pq.write_table(next_tbl, os.path.join(fdir, "part-0.parquet"))

    _finish_round(tmp, rdir, r, t0, n_pending, n_selected, n_fetched,
                  n_next, order_tbl, shards, stage_t, retries=retries,
                  cfg=cfg, bucket_rows=bucket_rows,
                  error_samples=err_samples)
    return next_tbl if n_next else None


def _detect_hub_hosts(pending: rd.Dataset, threshold: int,
                      block_floor: int | None = None) -> list[str]:
    """Hosts whose pending rows exceed ``threshold`` (the auto-salt
    trigger). One column-pruned streaming pass: per-block partial host
    counts, only hosts with >= ``block_floor`` rows in a block reach the
    driver — traffic is bounded at rows/floor per block. Approximate by
    design: a hub spread so thin that no block holds ``floor`` of its
    rows is missed (bounded miss: floor x blocks rows), which only
    delays the salt switch — selection results are salt-invariant."""
    floor = block_floor or max(1, threshold // 256)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["host"].value_counts()
        vc = vc[vc >= floor]
        return pd.DataFrame({"host": vc.index.astype(str),
                             "n": vc.to_numpy(np.int64)})

    parts = pending.select_columns(["host"]) \
        .map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        return []
    tot = parts.groupby("host")["n"].sum()
    return sorted(tot.index[tot > threshold])


def _run_round(r: int, pending: rd.Dataset, idx_dir: str, out_dir: str,
               cfg: CrawlConfig, robots_ref, shards: SeenShards):
    t0 = time.perf_counter()
    rdir, tmp = _prepare_round_dir(out_dir, r)
    robots_idx: RobotsIndex = ray.get(robots_ref)

    # ---- politeness selection: per-host top-budget, groupby(host) shuffle
    delay_ms = robots_idx.delay_ms
    budget_fn = cfg.host_budget

    def select(df: pd.DataFrame) -> pd.DataFrame:
        b = budget_fn(delay_ms.get(df["host"].iloc[0], 1000))
        df = df.sort_values(["priority", "hash_hex"],
                            ascending=[False, True], kind="mergesort")
        df["selected"] = np.arange(len(df)) < b
        return df

    stage_t: dict[str, float] = {}
    _t = time.perf_counter()
    salt_n = cfg.politeness_salt
    if salt_n <= 1 and cfg.auto_salt_pending_rows > 0 \
            and pending.count() > cfg.auto_salt_pending_rows:
        # auto-salt: engage the two-stage path only when some host's
        # pending rows actually exceed the hub threshold (count() is
        # metadata-only — pending is materialized by the round loop)
        hubs = _detect_hub_hosts(pending, cfg.auto_salt_pending_rows)
        if hubs:
            salt_n = max(2, cfg.auto_salt_n)
            # lineage marker row: stage=mode_salted_hosts, wall_ms=#hubs
            stage_t["mode_salted_hosts"] = len(hubs) / 1000.0
    if salt_n > 1:
        # Hub-host skew containment (north_rule "salted-key splitting"):
        # stage 1 takes the per-(host, salt) top-budget — a hub host's
        # pending rows split across `salt` groups so no single task
        # holds them all; stage 2 re-ranks the ≤ salt×budget survivors
        # per host. Equal to unsalted selection because any row in a
        # host's true top-b is also in its salt-group's top-b.

        def add_salt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__salt"] = shard_of_many(list(df["url_hash"]), salt_n)
            return df

        def partial_top(df: pd.DataFrame) -> pd.DataFrame:
            b = budget_fn(delay_ms.get(df["host"].iloc[0], 1000))
            df = df.sort_values(["priority", "hash_hex"],
                                ascending=[False, True], kind="mergesort")
            df["cand"] = np.arange(len(df)) < b
            return df

        staged = _as_arrow(
            pending.map_batches(add_salt, batch_format="pandas")
            .groupby(["host", "__salt"])
            .map_groups(partial_top, batch_format="pandas")
        ).materialize()

        def final_select(df: pd.DataFrame) -> pd.DataFrame:
            return select(df.drop(columns=["__salt", "cand"]))

        finalists = staged.map_batches(
            lambda t: t.filter(pc.equal(t.column("cand"), True)),
            batch_format="pyarrow")
        marked_cand = _as_arrow(
            finalists.groupby("host")
            .map_groups(final_select, batch_format="pandas"))
        def keep_losers(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("cand"), False)) \
                 .drop_columns(["__salt", "cand"])
            return t.append_column(
                "selected", pa.array([False] * t.num_rows, pa.bool_()))

        losers = staged.map_batches(keep_losers, batch_format="pyarrow")
        marked = marked_cand.union(losers).materialize()
    else:
        # Coarse-bucket vectorized selection: grouping by raw host pays
        # map_groups' per-group Python overhead for EVERY host (~2.4k
        # hosts here, unbounded at scale); hashing hosts into 64 buckets
        # and ranking per host with a vectorized cumcount inside each
        # bucket is semantically identical (a host's rows always share a
        # bucket) at a fraction of the fixed cost. Hub-host skew inside
        # a bucket is what the salted path addresses.
        # Round 4: co-location runs on the direct hash exchange instead
        # of groupby(__hb) — the sort-based shuffle paid ~1-2 s of fixed
        # cost per ROUND for what a dense-int partition does in two task
        # layers (the same swap round 3 made in the admit stage; the
        # per-round fixed costs are what cap the in-box scaling ratio).
        def add_hb(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__hb"] = (pd.util.hash_array(
                df["host"].to_numpy(dtype=object)) % 64).astype(np.int32)
            return df

        def select_bucket(t: pa.Table | None) -> pa.Table:
            if t is None:                      # whole dataset empty
                df = _EMPTY_FRONTIER.to_pandas()
            else:                              # incl. typed empty slices
                df = t.to_pandas().drop(columns="__hb")
            df = df.sort_values(["priority", "hash_hex"],
                                ascending=[False, True], kind="mergesort")
            bmap = {h: budget_fn(delay_ms.get(h, 1000))
                    for h in df["host"].unique()}
            budgets = df["host"].map(bmap)
            rank = df.groupby("host", sort=False).cumcount()
            df["selected"] = (rank < budgets).to_numpy()
            return pa.Table.from_pandas(df, preserve_index=False) \
                .replace_schema_metadata(None)

        from ..stages.exchange import exchange_map
        marked = exchange_map(
            pending.map_batches(add_hb, batch_format="pandas"),
            "__hb", 64, select_bucket).materialize()
    stage_t["select_shuffle"] = round(time.perf_counter() - _t, 3)
    _t = time.perf_counter()
    def _only(flag: bool):
        return lambda t: t.filter(pc.equal(t.column("selected"), flag)) \
                          .select(list(_FRONTIER_COLS))

    selected_ds = marked.map_batches(_only(True), batch_format="pyarrow")
    deferred = marked.map_batches(_only(False), batch_format="pyarrow")
    n_pending = marked.count()

    # distributed schedule: seq via sort + block offsets; the selected
    # frontier never reaches the driver (round 1 gathered it into a
    # pandas frame + broadcast dict — unbounded at 10^10-URL scale).
    # The order log is written by the same seq tasks (no extra pass).
    seq_refs, counts = _assign_seq(selected_ds, r,
                                   os.path.join(tmp, "order"))
    n_selected = int(np.sum(counts)) if counts else 0
    stage_t["sched_seq"] = round(time.perf_counter() - _t, 3)
    _t = time.perf_counter()

    extracted = _fetch_extract_distributed(seq_refs, idx_dir, cfg) \
        if n_selected else None
    n_fetched = 0
    retries = 0
    bucket_rows: list[dict] = []
    err_samples: list[str] = []
    next_pending = deferred
    if extracted is not None:
        n_fetched = extracted.count()  # metadata-only on materialized
        if n_fetched:
            # ONE aggregation pass yields the per-partition lineage AND
            # the round totals (was: a separate sum() pass + a metrics
            # pass — a fixed serial cost per round that taxes the
            # high-parallelism leg of the scaling pair)
            bucket_rows, err_samples = _bucket_metrics(extracted, cfg.n_buckets)
            retries = sum(r["retries"] for r in bucket_rows)
        stage_t["fetch_extract"] = round(time.perf_counter() - _t, 3)
        _t = time.perf_counter()

        extracted.map_batches(lambda t: _pages_from_extracted(t, r),
                              batch_format="pyarrow") \
            .write_parquet(os.path.join(tmp, "pages"))
        stage_t["pages_write"] = round(time.perf_counter() - _t, 3)
        _t = time.perf_counter()

        decay = cfg.link_priority_decay
        candidates = extracted.select_columns(
            ["url", "links", "priority", "depth"]
        ).map_batches(lambda b: _explode_links(b, decay),
                      batch_format="pyarrow")
        new_rows = _ingest(candidates, robots_ref, shards)
        next_pending = deferred.union(new_rows)

    if extracted is None:
        # the admit timer otherwise starts at the pages_write reset
        # (the _ingest exchange runs eagerly inside that window)
        _t = time.perf_counter()
    next_pending = next_pending.materialize()
    n_next = next_pending.count()
    # coalesce the pending frontier when union accumulation has left it
    # in absurdly many tiny blocks — every later shuffle pays per-block
    # overhead (select_shuffle grew 4x across rounds before this)
    if n_next:
        nb = next_pending.num_blocks()
        target = max(8, min(64, n_next // 4096 + 1))
        if nb > 2 * target:
            next_pending = next_pending.repartition(target).materialize()
    stage_t["admit_union"] = round(time.perf_counter() - _t, 3)
    if os.environ.get("HYPERION_STATS") and extracted is not None:
        print(f"=== round {r} extract stats ===\n{extracted.stats()}\n"
              f"=== round {r} admit stats ===\n{next_pending.stats()}",
              flush=True)
    _t = time.perf_counter()

    if n_next > 0:
        next_pending.write_parquet(os.path.join(tmp, "frontier_next"))
    else:
        os.makedirs(os.path.join(tmp, "frontier_next"), exist_ok=True)
    stage_t["checkpoint"] = round(time.perf_counter() - _t, 3)
    _finish_round(tmp, rdir, r, t0, n_pending, n_selected, n_fetched,
                  n_next, None, shards, stage_t, retries=retries, cfg=cfg,
                  bucket_rows=bucket_rows, error_samples=err_samples)
    return next_pending if n_next > 0 else None


def _summarize(out_dir: str, max_rounds: int) -> dict:
    rounds_root = os.path.join(out_dir, "rounds")
    total_fetched = 0
    rounds = 0
    if os.path.isdir(rounds_root):
        for name in sorted(os.listdir(rounds_root)):
            rdir = os.path.join(rounds_root, name)
            if not os.path.exists(os.path.join(rdir, "_SUCCESS")):
                continue
            meta = json.load(open(os.path.join(rdir, "meta.json")))
            total_fetched += meta["fetched"]
            rounds += 1
    return {"rounds": rounds, "fetched": total_fetched, "out_dir": out_dir}


def read_crawl_pages(out_dir: str) -> rd.Dataset:
    """All crawled pages across completed rounds."""
    import glob as _glob

    paths = []
    rounds_root = os.path.join(out_dir, "rounds")
    for name in sorted(os.listdir(rounds_root)):
        rdir = os.path.join(rounds_root, name)
        pdir = os.path.join(rdir, "pages")
        if os.path.exists(os.path.join(rdir, "_SUCCESS")) and os.path.isdir(pdir):
            paths.extend(sorted(_glob.glob(os.path.join(pdir, "*.parquet"))))
    return rd.read_parquet(paths)


def read_crawl_order(out_dir: str) -> pa.Table:
    import glob as _glob

    tabs = []
    rounds_root = os.path.join(out_dir, "rounds")
    for name in sorted(os.listdir(rounds_root)):
        rdir = os.path.join(rounds_root, name)
        if not os.path.exists(os.path.join(rdir, "_SUCCESS")):
            continue
        f = os.path.join(rdir, "order.parquet")   # driver-path rounds
        if os.path.exists(f):
            tabs.append(pq.read_table(f))
        else:                                      # distributed rounds
            for p in sorted(_glob.glob(os.path.join(rdir, "order",
                                                    "*.parquet"))):
                tabs.append(pq.read_table(p))
    return (pa.concat_tables(tabs, promote_options="default")
            if tabs else None)
