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

    def check_and_insert(self, digests: list[bytes]) -> np.ndarray:
        """Return a bool mask of digests NOT previously seen; marks every
        new digest as seen. ``digests`` must be sorted, unique, and owned
        by this shard (enforced by the caller)."""
        new = ~self.cf.contains_many(digests)
        for k in np.nonzero(new)[0]:
            self.cf.insert(digests[int(k)])
        return new

    def contains_many(self, digests: list[bytes]) -> np.ndarray:
        return self.cf.contains_many(digests)

    def count(self) -> int:
        return self.cf.count

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
