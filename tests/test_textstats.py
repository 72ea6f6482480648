"""Per-page scoring kernels (functions/textstats.py): determinism and
known-value checks."""

import numpy as np

from hyperion_crawler_ray.functions.textstats import (
    langid,
    minhash_sig,
    score_texts,
    simhash64,
)


def test_score_texts_known_values():
    out = score_texts(["the cat and the dog", ""])
    assert out["n_tokens"].tolist() == [5, 0]
    assert out["stopword_ratio"][0] == round(3 / 5, 6)  # 'the' x2 + 'and'
    assert out["stopword_ratio"][1] == 0.0
    assert out["mean_word_len"][0] == round((3 + 3 + 3 + 3 + 3) / 5, 6)


def test_stopword_ratio_counts_all_stopwords():
    out = score_texts(["the and of a to in data xyz"])
    assert out["stopword_ratio"][0] == round(7 / 8, 6)


def test_simhash_deterministic_and_sensitive():
    a = simhash64("alpha beta gamma delta".split())
    b = simhash64("alpha beta gamma delta".split())
    c = simhash64("totally different words here".split())
    assert a == b
    assert a != c


def test_minhash_similarity_tracks_jaccard():
    base = [f"w{i}" for i in range(60)]
    near = base[:55] + [f"x{i}" for i in range(5)]
    far = [f"z{i}" for i in range(60)]
    sa, sb, sc = minhash_sig(base), minhash_sig(near), minhash_sig(far)
    sim_near = float(np.mean(sa == sb))
    sim_far = float(np.mean(sa == sc))
    assert sim_near > 0.5
    assert sim_far < 0.2


def test_langid_deterministic():
    texts = ["the quick brown fox jumps over the lazy dog" * 3,
             "der schnelle braune fuchs springt" * 3]
    assert [langid(t) for t in texts] == [langid(t) for t in texts]
    assert langid("") == "und"
    assert langid("12345 !!!") == "und"


def test_langid_batch_equals_scalar():
    """The vectorized langid (one bincount over UTF-8 bytes) must match
    the scalar reference implementation byte for byte, including unicode
    and empty edge cases."""
    import pyarrow as pa

    from hyperion_crawler_ray.functions.textstats import langid, langid_batch

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "der schnelle braune fuchs springt", "",
        "éèàç ûï unicode only", "les enfants sont dans le jardin",
        "los ninos estan en el jardin", "12345 !!! ???",
        "ZzzZZ aAAaa", "日本語テキスト", "mixedCASE Text And MORE",
    ]
    got = list(langid_batch(pa.array(texts, pa.string())))
    want = [langid(s) for s in texts]
    assert got == want


def test_hash_tokens_properties():
    """Bytes-level token hash (round 4): deterministic, content-pure
    (position/layout independent), distinct across distinct tokens,
    consistent across slices / large_string / filtered views."""
    import pyarrow as pa

    from hyperion_crawler_ray.functions.hashing import hash_tokens

    toks = ["a", "ab", "abc", "word1", "word2", "x" * 31, "x" * 32,
            "x" * 33, "y" * 500, "", "a", "aa", "b"]
    arr = pa.array(toks, pa.string())
    h = hash_tokens(arr)
    assert (h == hash_tokens(arr)).all()
    assert h[0] == h[10]                          # same content, same hash
    assert len(set(h.tolist()[:10])) == 10        # distinct contents
    assert (hash_tokens(arr.slice(3, 6)) == h[3:9]).all()
    assert (hash_tokens(pa.array(toks, pa.large_string())) == h).all()
    f = arr.filter(pa.array([True, False] * 6 + [True]))
    assert (hash_tokens(f) == h[::2]).all()
    # position independence: token value alone determines the hash
    ht = hash_tokens(pa.array(["zzz", "word7", "word7"], pa.string()))
    assert ht[1] == ht[2] == hash_tokens(pa.array(["word7"]))[0]
    # low-byte diffusion (simhash majority-votes on raw bits)
    lows = {int(x) & 0xFF
            for x in hash_tokens(pa.array([f"word{i}" for i in range(100)]))}
    assert len(lows) > 50


def test_simhash_lane_packed_equals_per_bit():
    """The round-4 lane-packed simhash must equal the per-bit reference
    (including >255-token docs that exercise the segment split)."""
    import numpy as np
    import pyarrow as pa

    from hyperion_crawler_ray.functions import hashing as H

    rng = np.random.RandomState(0)
    vocab = [f"w{i}" for i in range(300)]
    docs = ["", "one", "two words",
            " ".join(rng.choice(vocab[:20], 700)),   # > 255 tokens, dups
            " ".join(rng.choice(vocab, 3000))]
    docs += [" ".join(rng.choice(vocab, rng.randint(0, 400)))
             for _ in range(100)]
    th, offs = H.tokenize_batch(pa.array(docs, pa.string()))

    def per_bit(tok_hashes, doc_offsets):
        n_docs = len(doc_offsets) - 1
        out = np.zeros(n_docs, dtype=np.uint64)
        nonempty = doc_offsets[:-1] < doc_offsets[1:]
        starts = doc_offsets[:-1][nonempty]
        counts = (doc_offsets[1:] - doc_offsets[:-1])[nonempty]
        sig = np.zeros(len(starts), dtype=np.uint64)
        for j in range(64):
            bj = ((tok_hashes >> np.uint64(j)) & np.uint64(1)).astype(np.int64)
            sums = np.add.reduceat(bj, starts)
            sig |= ((2 * sums > counts).astype(np.uint64) << np.uint64(j))
        out[nonempty] = sig
        return out

    assert (H.simhash_from_tokens(th, offs) == per_bit(th, offs)).all()


def test_minhash_flat_equals_per_doc():
    """The round-4 flat cache-blocked minhash must equal the per-doc
    unique-shingle path at every chunk size (incl. chunk boundaries
    splitting a doc)."""
    import numpy as np
    import pyarrow as pa

    from hyperion_crawler_ray.functions import hashing as H

    rng = np.random.RandomState(1)
    vocab = [f"w{i}" for i in range(200)]
    docs = ["", "one", "two words", "a b c d",
            " ".join(rng.choice(vocab[:10], 500))]   # duplicate-heavy
    docs += [" ".join(rng.choice(vocab, rng.randint(0, 120)))
             for _ in range(80)]
    th, offs = H.tokenize_batch(pa.array(docs, pa.string()))
    a, b = H.minhash_params(32)
    ref = np.stack([H.minhash_from_shingles(s, a, b)
                    for s in H.shingle_hashes_from_tokens(th, offs, 3)])
    for chunk in (7, 63, 1 << 10, 10 ** 9):
        got = H.minhash_batch(th, offs, a, b, k=3, chunk=chunk)
        assert got.shape == ref.shape and (got == ref).all(), chunk


def test_hash_tokens_matches_scalar_reference():
    """Pin the bytes-level token hash definition against a pure-Python
    scalar re-derivation (global-position polynomial x P^-start shift +
    length fold + fmix64)."""
    import pyarrow as pa

    from hyperion_crawler_ray.functions import hashing as H

    M64 = 1 << 64
    P = 1099511628211
    P_INV = pow(P, -1, M64)
    F1, F2 = 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53

    def scalar(tokens):
        out = []
        pos = 0
        for s in tokens:
            b = s.encode("utf-8")
            acc = 0
            for i, ch in enumerate(b):
                acc = (acc + ch * pow(P, pos + i, M64)) % M64
            acc = (acc * pow(P_INV, pos, M64)) % M64
            h = acc ^ ((len(b) * P) % M64)
            h ^= h >> 33
            h = (h * F1) % M64
            h ^= h >> 33
            h = (h * F2) % M64
            h ^= h >> 29
            out.append(h)
            pos += len(b)
        return out

    toks = ["alpha", "b", "", "word12", "ünïcödé", "x" * 100]
    got = H.hash_tokens(pa.array(toks, pa.string())).tolist()
    assert got == scalar(toks)


def test_pairwise_jaccard_equals_scalar_loop():
    """The batched (pair_id, value)-lexsort Jaccard must equal the
    per-pair np.intersect1d loop it replaced (round-5 vectorization of
    the last per-pair Python hot spot), including empty-doc sentinel
    sets, genuinely empty arrays, and identical/disjoint pairs."""
    import numpy as np
    import pyarrow as pa

    from hyperion_crawler_ray.functions import hashing as H

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(60)]
    docs_a = ["", "", "same same", "a b c", "x y z"]
    docs_b = ["", "one", "same", "a b c", "p q r"]
    docs_a += [" ".join(rng.choice(vocab, rng.randint(0, 40)))
               for _ in range(60)]
    docs_b += [" ".join(rng.choice(vocab, rng.randint(0, 40)))
               for _ in range(60)]
    for k in (1, 3):
        ha, oa = H.tokenize_batch(pa.array(docs_a, pa.string()))
        hb, ob = H.tokenize_batch(pa.array(docs_b, pa.string()))
        sa = H.shingle_hashes_from_tokens(ha, oa, k)
        sb = H.shingle_hashes_from_tokens(hb, ob, k)
        got = H.pairwise_jaccard(sa, sb)
        for i in range(len(docs_a)):
            inter = len(np.intersect1d(sa[i], sb[i], assume_unique=True))
            union = len(sa[i]) + len(sb[i]) - inter
            want = inter / union if union else 1.0
            assert got[i] == want, (k, i, got[i], want)
    # genuinely 0-element inputs (below the sentinel layer)
    e = np.empty(0, np.uint64)
    v = np.array([1, 2], np.uint64)
    out = H.pairwise_jaccard([e, e, v], [e, v, v])
    assert out.tolist() == [1.0, 0.0, 1.0]
    assert H.pairwise_jaccard([], []).size == 0
