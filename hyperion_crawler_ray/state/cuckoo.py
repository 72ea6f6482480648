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


def _parse(digests: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprints uint16, primary-bucket uint64) for a list of 20-byte
    digests."""
    if not digests:
        return (np.empty(0, np.uint16), np.empty(0, np.uint64))
    raw = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(-1, 20)
    fp = raw[:, 0].astype(np.uint16) | (raw[:, 1].astype(np.uint16) << 8)
    fp[fp == 0] = 1  # 0 marks an empty slot
    i1 = np.zeros(len(digests), np.uint64)
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

    # -- index math -------------------------------------------------------
    def _i1(self, i1raw: np.ndarray) -> np.ndarray:
        return (i1raw & self._mask).astype(np.int64)

    def _alt(self, idx: np.ndarray | int, fp: np.ndarray | int):
        return (np.uint64(idx) ^ (np.uint64(fp) * _ALT_MULT)) & self._mask

    # -- queries ----------------------------------------------------------
    def contains_many(self, digests: list[bytes]) -> np.ndarray:
        fp, i1raw = _parse(digests)
        if len(fp) == 0:
            return np.zeros(0, bool)
        i1 = self._i1(i1raw)
        i2 = self._alt(i1, fp).astype(np.int64)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if self.overflow:
            for k, d in enumerate(digests):
                if not hit[k] and d in self.overflow:
                    hit[k] = True
        return hit

    def contains(self, digest: bytes) -> bool:
        return bool(self.contains_many([digest])[0])

    # -- mutation ---------------------------------------------------------
    def insert(self, digest: bytes) -> None:
        """Insert one key (assumed not present; caller dedups)."""
        fp, i1raw = _parse([digest])
        fpv = int(fp[0])
        i1 = int(self._i1(i1raw)[0])
        i2 = int(self._alt(i1, fpv))
        self.count += 1
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fpv
                return
        # deterministic eviction chain
        idx, cur = i1, fpv
        for kicks in range(_MAXKICKS):
            slot = kicks % _BUCKET
            victim = int(self.table[idx, slot])
            self.table[idx, slot] = cur
            cur = victim
            idx = int(self._alt(idx, cur))
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return
        # table saturated for this chain: exact overflow (no false negatives)
        self.overflow.add(digest)

    def insert_many(self, digests: list[bytes]) -> None:
        for d in digests:
            self.insert(d)

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
        return obj
