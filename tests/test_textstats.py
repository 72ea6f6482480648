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
