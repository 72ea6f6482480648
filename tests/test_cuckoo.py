"""Cuckoo filter (state/cuckoo.py): membership, determinism, persistence."""

import hashlib
import os

import numpy as np

from hyperion_crawler_ray.state.cuckoo import CuckooFilter


def _digests(n, salt=""):
    return [hashlib.sha1(f"{salt}k{i}".encode()).digest() for i in range(n)]


def test_no_false_negatives():
    cf = CuckooFilter(10_000)
    keys = _digests(8000)
    cf.insert_many(keys)
    assert cf.contains_many(keys).all()


def test_false_positive_rate_small():
    cf = CuckooFilter(50_000)
    cf.insert_many(_digests(40_000))
    probe = _digests(20_000, salt="other")
    fp = cf.contains_many(probe).sum()
    assert fp / 20_000 < 5e-3  # 16-bit fingerprints → ~1e-4 expected


def test_deterministic_state():
    keys = _digests(5000)
    a, b = CuckooFilter(4000), CuckooFilter(4000)  # overfull → forces kicks
    a.insert_many(keys)
    b.insert_many(keys)
    assert np.array_equal(a.table, b.table)
    assert a.overflow == b.overflow


def test_save_load_roundtrip(tmp_path):
    cf = CuckooFilter(2000)
    keys = _digests(3000)  # overfull → populates overflow set too
    cf.insert_many(keys)
    p = os.path.join(tmp_path, "cf.npz")
    cf.save(p)
    cf2 = CuckooFilter.load(p)
    assert np.array_equal(cf.table, cf2.table)
    assert cf.overflow == cf2.overflow
    assert cf.count == cf2.count
    assert cf2.contains_many(keys).all()


def _scalar_reference_insert(cf: CuckooFilter, digest: bytes) -> None:
    """Independent per-key insert (np.nonzero slot scan instead of the
    fill array) — the equivalence oracle for the vectorized insert_many.
    Matches the FIXED exhaustion semantics: the eviction chain is undone
    before overflowing (the pre-round-5 code left the last victim
    homeless — a false negative)."""
    from hyperion_crawler_ray.state.cuckoo import _BUCKET, _MAXKICKS, _parse

    fp, i1raw = _parse([digest])
    fpv = int(fp[0])
    i1 = int(cf._i1(i1raw)[0])
    i2 = int(cf._alt(i1, fpv))
    cf.count += 1
    for idx in (i1, i2):
        row = cf.table[idx]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = fpv
            return
    idx, cur = i1, fpv
    path = []
    for kicks in range(_MAXKICKS):
        slot = kicks % _BUCKET
        victim = int(cf.table[idx, slot])
        cf.table[idx, slot] = cur
        path.append((idx, slot))
        cur = victim
        idx = int(cf._alt(idx, cur))
        row = cf.table[idx]
        empty = np.nonzero(row == 0)[0]
        if len(empty):
            row[empty[0]] = cur
            return
    for idx2, slot2 in reversed(path):
        displaced = int(cf.table[idx2, slot2])
        cf.table[idx2, slot2] = cur
        cur = displaced
    assert cur == fpv
    cf.overflow.add(digest)


def test_vectorized_insert_many_equals_scalar_reference():
    """Round-5 fast path: batch insert_many must leave BYTE-IDENTICAL
    state (table, overflow, count) to the original one-key-at-a-time
    loop, including under heavy eviction and overflow saturation."""
    for cap, n in [(4000, 2000), (4000, 3500), (2000, 3000), (512, 2000)]:
        keys = _digests(n, salt=f"eq{cap}")
        fast = CuckooFilter(cap)
        fast.insert_many(keys)
        ref = CuckooFilter(cap)
        for d in keys:
            _scalar_reference_insert(ref, d)
        assert np.array_equal(fast.table, ref.table), (cap, n)
        assert fast.overflow == ref.overflow, (cap, n)
        assert fast.count == ref.count, (cap, n)
        # incremental batches must equal one big batch (and the scalar)
        inc = CuckooFilter(cap)
        for k in range(0, n, 257):
            inc.insert_many(keys[k:k + 257])
        assert np.array_equal(inc.table, ref.table), (cap, n)
        assert inc.overflow == ref.overflow, (cap, n)


def test_load_rebuilds_fill_and_saturation_visible(tmp_path):
    """The derived occupancy array survives save/load (inserts after a
    restore behave identically), and load/overflow telemetry reports
    saturation."""
    cf = CuckooFilter(1000)
    first, second = _digests(1300, "a"), _digests(1300, "b")
    cf.insert_many(first)
    p = os.path.join(tmp_path, "cf.npz")
    cf.save(p)
    cf2 = CuckooFilter.load(p)
    cf.insert_many(second)
    cf2.insert_many(second)
    assert np.array_equal(cf.table, cf2.table)
    assert cf.overflow == cf2.overflow
    assert cf2.load_factor > 0.8  # 2600 keys vs 2048 table slots
    assert len(cf2.overflow) > 0  # saturated chains landed in overflow
    assert cf2.contains_many(first + second).all()  # still no false negs
