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
