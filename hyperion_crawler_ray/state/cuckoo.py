"""Deterministic partial-key cuckoo filter over 20-byte SHA-1 digests.

The URL-seen membership sketch of the north_rule ("bloom/cuckoo URL-seen").
Design points:

- Keys are the ``url_hash`` SHA-1 digests themselves (already uniform), so
  no re-hashing: fingerprint = bytes[0:2] (made nonzero), primary bucket =
  bytes[2:10] mod m, alternate bucket = i1 XOR (fp * 0x5bd1e995) — the
  standard partial-key cuckoo scheme (Fan et al., "Cuckoo Filter:
  Practically Better Than Bloom", CoNEXT'14).
- **Fully deterministic**: eviction victim slot cycles ``kicks % 4`` (no
  RNG), so inserting the same key sequence always yields the same table.
  Crawl determinism then only needs a deterministic per-shard insertion
  order (sorted within each round — see state/seen.py).
- **No false negatives**: keys that fail MAX_KICKS land in an exact
  overflow set.
- Vectorized membership: ``contains_many`` is numpy over the whole batch.
- Checkpointable: ``save``/``load`` round-trip the exact state (npz).

False-positive rate ~ 2*4/2^16 ≈ 1.2e-4; a false positive makes the
crawler skip a URL, which is reproducible because the oracle
(pipelines/oracle.py) runs this same class with the same insertion order.
"""

from __future__ import annotations

import numpy as np

_BUCKET = 4
_MAXKICKS = 500
_ALT_MULT = np.uint64(0x5BD1E995)


def _joined(digests) -> bytes:
    """Accept a list of 20-byte digests OR one pre-joined blob (len
    divisible by 20) — the blob form lets the crawl's admit path ship ONE
    bytes object per shard call instead of tens of thousands."""
    if isinstance(digests, (bytes, bytearray, memoryview)):
        b = bytes(digests)
        if len(b) % 20:
            raise ValueError(f"digest blob length {len(b)} not a "
                             "multiple of 20")
        return b
    return b"".join(digests)


def _nth(digests, k: int) -> bytes:
    """k-th digest under either representation (rare paths only)."""
    if isinstance(digests, (bytes, bytearray, memoryview)):
        return bytes(digests[20 * k:20 * (k + 1)])
    return digests[k]


def _parse(digests) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprints uint16, primary-bucket uint64) for a list of 20-byte
    digests or a joined blob."""
    joined = _joined(digests)
    if not joined:
        return (np.empty(0, np.uint16), np.empty(0, np.uint64))
    raw = np.frombuffer(joined, dtype=np.uint8).reshape(-1, 20)
    fp = raw[:, 0].astype(np.uint16) | (raw[:, 1].astype(np.uint16) << 8)
    fp[fp == 0] = 1  # 0 marks an empty slot
    i1 = np.zeros(len(raw), np.uint64)
    for b in range(2, 10):
        i1 = (i1 << np.uint64(8)) | raw[:, b].astype(np.uint64)
    return fp, i1


class CuckooFilter:
    def __init__(self, capacity: int):
        m = 1
        while m * _BUCKET < capacity / 0.90:
            m <<= 1
        self.nbuckets = m
        self._mask = np.uint64(m - 1)
        self.table = np.zeros((m, _BUCKET), dtype=np.uint16)
        self.overflow: set[bytes] = set()
        self.count = 0
        # per-bucket occupancy. Invariant: zeros in a row are a SUFFIX —
        # inserts fill the first empty slot and the eviction chain only
        # writes into full rows — so _fill[i] IS the next free slot.
        # Derived state: rebuilt on load, not checkpointed.
        self._fill = np.zeros(m, dtype=np.int8)

    @property
    def load_factor(self) -> float:
        """Occupied fraction of the table (design load factor is 0.90;
        past ~0.95 eviction chains fail and keys land in the exact
        ``overflow`` set — correct but unbounded, so callers should alarm
        on high load; see SeenShard.stats / the crawl's seen_saturation
        lineage rows)."""
        return self.count / float(self.nbuckets * _BUCKET)

    # -- index math -------------------------------------------------------
    def _i1(self, i1raw: np.ndarray) -> np.ndarray:
        return (i1raw & self._mask).astype(np.int64)

    def _alt(self, idx: np.ndarray | int, fp: np.ndarray | int):
        return (np.uint64(idx) ^ (np.uint64(fp) * _ALT_MULT)) & self._mask

    # -- queries ----------------------------------------------------------
    def contains_many(self, digests) -> np.ndarray:
        """Membership for a list of digests or a joined 20N-byte blob."""
        fp, i1raw = _parse(digests)
        if len(fp) == 0:
            return np.zeros(0, bool)
        i1 = self._i1(i1raw)
        i2 = self._alt(i1, fp).astype(np.int64)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            for k in np.nonzero(~hit)[0]:
                if _nth(digests, int(k)) in self.overflow:
                    hit[k] = True
        return hit

    def contains(self, digest: bytes) -> bool:
        return bool(self.contains_many([digest])[0])

    # -- mutation ---------------------------------------------------------
    def _evict_insert(self, i1: int, fpv: int, digest: bytes) -> None:
        """Deterministic eviction chain for a key whose both buckets are
        full. Rare (only near saturation). On MAXKICKS exhaustion the
        chain is UNDONE before the new key goes to the exact overflow set
        — the pre-round-5 code overflowed the new digest while leaving
        the last kicked-out victim homeless, a FALSE NEGATIVE for an
        earlier key (latent: only reachable past ~100% fill; found by the
        round-5 saturation test)."""
        tab, fill = self.table, self._fill
        idx, cur = i1, fpv
        path: list[tuple[int, int]] = []
        for kicks in range(_MAXKICKS):
            slot = kicks % _BUCKET
            victim = int(tab[idx, slot])
            tab[idx, slot] = cur          # full row: fill unchanged
            path.append((idx, slot))
            cur = victim
            idx = int(self._alt(idx, cur))
            f = fill[idx]
            if f < _BUCKET:
                tab[idx, f] = cur
                fill[idx] = f + 1
                return
        # saturated: put every displaced fingerprint back (exact reverse
        # replay), then keep the NEW key in the exact overflow set — no
        # key, old or new, loses membership
        homeless = cur
        for idx2, slot2 in reversed(path):
            displaced = int(tab[idx2, slot2])
            tab[idx2, slot2] = homeless
            homeless = displaced
        assert homeless == fpv
        self.overflow.add(digest)

    def insert(self, digest: bytes) -> None:
        """Insert one key (assumed not present; caller dedups)."""
        self.insert_many([digest])

    def insert_many(self, digests) -> None:
        """Vectorized batch insert (list of digests or joined blob):
        fingerprints and both bucket indices are precomputed for the
        whole batch (one numpy pass), the occupancy array makes the
        common placement three scalar ops, and only the rare
        both-buckets-full case walks the eviction chain. State after the
        call is byte-identical to inserting the keys one at a time in
        order (pinned by tests/test_cuckoo.py)."""
        if not digests:
            return
        fp, i1raw = _parse(digests)
        i1 = self._i1(i1raw)
        i2 = self._alt(i1, fp).astype(np.int64)
        tab, fill = self.table, self._fill
        self.count += len(fp)
        for k in range(len(fp)):
            a = i1[k]
            f = fill[a]
            if f < _BUCKET:
                tab[a, f] = fp[k]
                fill[a] = f + 1
                continue
            b = i2[k]
            f = fill[b]
            if f < _BUCKET:
                tab[b, f] = fp[k]
                fill[b] = f + 1
                continue
            self._evict_insert(int(a), int(fp[k]), _nth(digests, k))

    # -- checkpoint -------------------------------------------------------
    def save(self, path: str) -> None:
        ov = np.frombuffer(b"".join(sorted(self.overflow)), dtype=np.uint8)
        np.savez_compressed(path, table=self.table, overflow=ov,
                            count=np.int64(self.count))

    @classmethod
    def load(cls, path: str) -> "CuckooFilter":
        z = np.load(path)
        obj = cls.__new__(cls)
        obj.table = z["table"]
        obj.nbuckets = obj.table.shape[0]
        obj._mask = np.uint64(obj.nbuckets - 1)
        ovraw = z["overflow"].tobytes()
        obj.overflow = {ovraw[k : k + 20] for k in range(0, len(ovraw), 20)}
        obj.count = int(z["count"])
        occ = obj.table != 0
        obj._fill = occ.sum(axis=1).astype(np.int8)
        # the fast insert path relies on zeros being a row SUFFIX; every
        # writer maintains it, so a violation means checkpoint corruption
        if not (occ == (np.arange(_BUCKET) < obj._fill[:, None])).all():
            raise ValueError(f"corrupt cuckoo checkpoint {path}: "
                             "non-suffix empty slots")
        return obj
