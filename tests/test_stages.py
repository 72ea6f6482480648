"""Direct unit tests for stages not fully covered by the SQL oracles:
near-dup detection quality, merge modes, multimodal determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.sources.merge import update_only, upsert
from hyperion_crawler_ray.stages.dedup import (
    embedding_near_dup,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_column,
)
from hyperion_crawler_ray.stages.multimodal import decode_media, synth_media_table


def _docs_with_near_dups():
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "into the deep green forest near the river bank today").split()
    rows = []
    for i in range(20):
        words = [f"w{i}_{k}" for k in range(30)]
        rows.append({"doc_id": i, "text": " ".join(words)})
    # 100 & 101: near-identical (one word changed)
    rows.append({"doc_id": 100, "text": " ".join(base)})
    mut = list(base)
    mut[5] = "leaps"
    rows.append({"doc_id": 101, "text": " ".join(mut)})
    return pd.DataFrame(rows)


def test_minhash_lsh_finds_planted_near_dup():
    docs = _docs_with_near_dups()
    ds = rd.from_pandas(docs)
    sigs = minhash_signatures(ds, "text", "doc_id", num_perm=64)
    pairs = lsh_candidate_pairs(sigs, "doc_id", bands=16).to_pandas()
    assert {(100, 101)} <= set(zip(pairs["id_a"], pairs["id_b"]))


def test_simhash_close_for_near_dups():
    docs = _docs_with_near_dups()
    out = simhash_column(rd.from_pandas(docs), "text").to_pandas()
    sig = dict(zip(out["doc_id"], out["simhash"]))
    ham = bin(int(sig[100]) ^ int(sig[101])).count("1")
    assert ham <= 8
    ham_rand = bin(int(sig[0]) ^ int(sig[100])).count("1")
    assert ham_rand > 16


def test_embedding_near_dup_finds_planted_pair():
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((50, 16))
    vecs[41] = vecs[40] + 0.001 * rng.standard_normal(16)  # planted dup
    df = pd.DataFrame({"vec_id": np.arange(50),
                       "embedding": [v.tolist() for v in vecs]})
    out = embedding_near_dup(rd.from_pandas(df), "embedding", "vec_id",
                             threshold=0.99).to_pandas()
    assert (40, 41) in set(zip(out["id_a"], out["id_b"]))


def test_embedding_near_dup_recall_at_scaled_buckets():
    """Scale path (round-2): bucket count derived from n (>= 64 here)
    with multi-probe — every planted near-dup pair is still recalled."""
    rng = np.random.RandomState(7)
    n, dim = 20000, 16
    vecs = rng.standard_normal((n, dim))
    planted = [(i, i + 1) for i in range(0, 40, 2)]
    for a, b in planted:
        vecs[b] = vecs[a] + 1e-4 * rng.standard_normal(dim)
    df = pd.DataFrame({"vec_id": np.arange(n),
                       "embedding": [v.tolist() for v in vecs]})
    out = embedding_near_dup(rd.from_pandas(df), "embedding", "vec_id",
                             threshold=0.999).to_pandas()
    # derived bucket count: n/target_bucket_rows -> >= 64 buckets
    found = set(zip(out["id_a"], out["id_b"]))
    missed = [p for p in planted if p not in found]
    assert not missed, f"missed planted pairs: {missed}"
    # pair list is deduplicated despite multi-probe overlap
    assert len(out) == len(out.drop_duplicates(["id_a", "id_b"]))


def test_upsert_new_wins_old_kept():
    old = rd.from_items([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    new = rd.from_items([{"k": 2, "v": "B"}, {"k": 3, "v": "C"}])
    out = upsert(old, new, ["k"]).to_pandas().sort_values("k")
    assert list(out["k"]) == [1, 2, 3]
    assert list(out["v"]) == ["a", "B", "C"]


def test_update_only_drops_new_keys():
    old = rd.from_items([{"k": 1, "v": "a"}, {"k": 2, "v": "b"}])
    new = rd.from_items([{"k": 2, "v": "B"}, {"k": 3, "v": "C"}])
    out = update_only(old, new, ["k"]).to_pandas().sort_values("k")
    assert list(out["k"]) == [1, 2]
    assert list(out["v"]) == ["a", "B"]


def test_multimodal_decode_deterministic():
    t = synth_media_table(64)
    a = decode_media(rd.from_arrow(t), concurrency=2, batch_size=16) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    b = decode_media(rd.from_arrow(t), concurrency=2, batch_size=16) \
        .to_pandas().sort_values("media_id").reset_index(drop=True)
    assert a.equals(b)
    assert (a["payload_bytes"] > 0).all()


def test_lsh_mega_cluster_capped_star_pairing():
    """Round-3 mega-cluster guard: a 1000-copy identical-content cluster
    must emit O(c) star pairs per band group (not c^2/2), stay connected
    through the representative, and finish in bounded time."""
    import time
    n_dup = 1000
    rows = [{"doc_id": i,
             "text": "exact duplicate boilerplate page content repeated "
                     "across the whole mirror set of hosts"}
            for i in range(n_dup)]
    rows += [{"doc_id": 10_000 + i,
              "text": " ".join(f"u{i}_{k}" for k in range(30))}
             for i in range(20)]
    ds = rd.from_pandas(pd.DataFrame(rows), override_num_blocks=4)
    sigs = minhash_signatures(ds, "text", "doc_id", num_perm=64)
    t0 = time.time()
    pairs = lsh_candidate_pairs(sigs, "doc_id", bands=16,
                                cluster_cap=64).to_pandas()
    took = time.time() - t0
    # star pairing: ~(c-1) pairs per band group, all dedup'd to c-1
    assert len(pairs) < 5 * n_dup, len(pairs)
    # the cluster is fully connected via the representative (min id 0)
    in_cluster = pairs[(pairs.id_a < n_dup) & (pairs.id_b < n_dup)]
    assert set(in_cluster.id_a) == {0}
    assert set(in_cluster.id_b) == set(range(1, n_dup))
    assert took < 60, took


def test_rolling_fingerprint_equals_scalar_reference():
    """Round-4 vectorized Karp-Rabin (position-loop across docs, exact
    Mersenne-61 modmul) must be byte-identical to the per-character
    scalar definition, including docs shorter than the window, empty
    docs, and multi-byte UTF-8."""
    import numpy as np

    from hyperion_crawler_ray.stages.text import rolling_fingerprint

    def scalar(s, window=16, base=257, mod=(1 << 61) - 1):
        b = s.encode("utf-8")
        if len(b) < window:
            h = 0
            for ch in b:
                h = (h * base + ch) % mod
            return h
        h, best = 0, None
        pw = pow(base, window - 1, mod)
        for i, ch in enumerate(b):
            if i >= window:
                h = (h - b[i - window] * pw) % mod
            h = (h * base + ch) % mod
            if i >= window - 1:
                best = h if best is None else min(best, h)
        return best

    rng = np.random.RandomState(3)
    texts = ["", "a", "short", "x" * 15, "x" * 16, "x" * 17,
             "ünïcödé tëxt with multi-byte characters ™",
             "the quick brown fox jumps over the lazy dog " * 20]
    texts += ["".join(rng.choice(list("abcdef ghij.!"), rng.randint(0, 300)))
              for _ in range(150)]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = rolling_fingerprint(rd.from_pandas(df), "text").to_pandas()
    got = dict(zip(got["doc_id"], got["rhash"]))
    for i, s in enumerate(texts):
        assert int(got[i]) == scalar(s), (i, s[:40])
