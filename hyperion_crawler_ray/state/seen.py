"""Sharded URL-seen service: one cuckoo-filter shard per actor.

Reference analogs: the exact first-wins dedup set (D-1,
api/src/etl/base/loader.py:188-209) and the lookup-or-create uuid cache
(T-12/ST-1, api/src/etl/krx/transformer.py:151-195), scaled out as the
north_rule's sharded seen filter.

Determinism contract (what makes crawl order / seen set reproducible at
ANY parallelism): shard ownership is a pure function of the digest
(``shard_of``), and each shard receives **exactly one call per crawl
round** carrying that shard's candidate digests **sorted ascending** (the
frontier stage groups by shard and sorts before calling). Cuckoo insertion
is itself deterministic (state/cuckoo.py), so filter state after round k
is identical between an 8-CPU run, a 32-CPU run, and the single-threaded
oracle.

Capacity sizing (10^10-URL design point): each shard's cuckoo table holds
``seen_capacity_per_shard`` keys at the 0.90 design load in
``2 bytes x capacity/0.9`` of memory (a 2-byte fingerprint per key; the
1<<20 default is ~2.3 MiB/shard). Size the shard count so
``total_urls / n_shards <= seen_capacity_per_shard``: 10^10 URLs at the
default capacity means ~10,000 shards (~23 GiB of filter state spread
across the cluster at 0.05 CPU apiece), or fewer shards with capacity
raised to 1<<27 (~300 MiB/shard, 75 shards). Past ~0.95 load insertion
falls back to the exact-but-unbounded overflow set (no false negatives,
but per-key memory jumps 10x) — the crawl emits a ``seen_saturation``
lineage row + alert when any shard crosses 0.8 load so operators re-shard
long before that; snapshots make re-sharding an offline split of the
checkpointed key space.
"""

from __future__ import annotations

import os

import numpy as np
import ray

from .cuckoo import CuckooFilter


def shard_of(digest: bytes, n_shards: int) -> int:
    """Owning shard of a 20-byte digest — uses tail bytes, disjoint from
    the bytes the cuckoo filter consumes for fingerprint/bucket."""
    return int.from_bytes(digest[18:20], "little") % n_shards


def shard_of_many(digests: list[bytes], n_shards: int) -> np.ndarray:
    if not digests:
        return np.empty(0, np.int64)
    joined = b"".join(digests)
    if len(joined) != 20 * len(digests):
        # a non-SHA-1 digest would silently misalign the reshape and
        # scramble every row after it — fail loud (ADVICE round 3)
        raise ValueError(
            f"shard_of_many: digests must be 20-byte SHA-1; got total "
            f"{len(joined)} bytes for {len(digests)} digests")
    raw = np.frombuffer(joined, dtype=np.uint8).reshape(-1, 20)
    v = raw[:, 18].astype(np.int64) | (raw[:, 19].astype(np.int64) << 8)
    return v % n_shards


@ray.remote(num_cpus=0.05)
class SeenShard:
    """One shard of the URL-seen filter. Near-zero CPU reservation: a
    shard works for milliseconds once per round, and reserving real
    cores deadlocks small clusters (16 shards x 0.25 cpu consumed ALL of
    a 4-cpu cluster, so no data task could ever schedule — observed).
    On a real cluster shards spread across nodes automatically."""

    def __init__(self, capacity: int, shard_id: int,
                 restore_path: str | None = None):
        self.shard_id = shard_id
        if restore_path:
            self.cf = CuckooFilter.load(restore_path)
        else:
            self.cf = CuckooFilter(capacity)

    def check_and_insert(self, digests) -> np.ndarray:
        """Return a bool mask of digests NOT previously seen; marks every
        new digest as seen. ``digests`` must be sorted, unique, and owned
        by this shard (enforced by the caller). Accepts a list of 20-byte
        digests or ONE joined blob — the blob form ships a single bytes
        object per shard per round instead of tens of thousands (round-5
        admit hot path)."""
        new = ~self.cf.contains_many(digests)
        if isinstance(digests, (bytes, bytearray, memoryview)):
            raw = np.frombuffer(bytes(digests), np.uint8).reshape(-1, 20)
            self.cf.insert_many(raw[new].tobytes())
        else:
            self.cf.insert_many(
                [digests[int(k)] for k in np.nonzero(new)[0]])
        return new

    def contains_many(self, digests: list[bytes]) -> np.ndarray:
        return self.cf.contains_many(digests)

    def count(self) -> int:
        return self.cf.count

    def stats(self) -> dict:
        """Saturation telemetry: the crawl emits a ``seen_saturation``
        lineage row (and alert) when ``load`` crosses 0.8 — past ~0.95
        the table's eviction chains fail and keys land in the exact (but
        unbounded) overflow set."""
        return {"shard": self.shard_id, "count": self.cf.count,
                "load": self.cf.load_factor, "overflow": len(self.cf.overflow)}

    def save(self, path: str) -> str:
        self.cf.save(path)
        return path


class SeenShards:
    """Driver-side handle bundle for the seen-shard actor pool."""

    def __init__(self, n_shards: int, capacity: int,
                 restore_dir: str | None = None):
        self.n_shards = n_shards
        self.actors = [
            SeenShard.remote(
                capacity, s,
                os.path.join(restore_dir, f"shard-{s}.npz") if restore_dir else None,
            )
            for s in range(n_shards)
        ]

    def total_count(self) -> int:
        return sum(ray.get([a.count.remote() for a in self.actors]))

    def stats(self) -> list[dict]:
        return ray.get([a.stats.remote() for a in self.actors])

    def save(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        ray.get([
            a.save.remote(os.path.join(out_dir, f"shard-{s}.npz"))
            for s, a in enumerate(self.actors)
        ])

    def kill(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
