"""Cross-doc repeated n-gram stats (stages/substring.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.stages.substring import cross_doc_ngram_stats


def _rand_doc(rng, n_tok):
    return " ".join(f"w{rng.randint(0, 1_000_000)}" for _ in range(n_tok))


def _stats(texts, n=13, **kw):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    out = cross_doc_ngram_stats(ds, "text", "doc_id", n=n, **kw).to_pandas()
    return out.set_index("doc_id").sort_index()


def _oracle(texts, n=13, min_docs=2):
    """Brute-force token-n-gram set comparison."""
    gram_sets = []
    for t in texts:
        toks = t.split()
        if len(toks) >= n:
            gram_sets.append({tuple(toks[i:i + n])
                              for i in range(len(toks) - n + 1)})
        elif toks:
            gram_sets.append({tuple(toks)})
        else:
            gram_sets.append({("",)})
    from collections import Counter
    freq = Counter(g for s in gram_sets for g in s)
    return [(len(s), sum(1 for g in s if freq[g] >= min_docs))
            for s in gram_sets]


def test_planted_shared_passage(ray_session):
    rng = np.random.RandomState(3)
    texts = [_rand_doc(rng, 40) for _ in range(30)]
    passage = " ".join(f"p{i}" for i in range(20))
    texts[3] = texts[3] + " " + passage
    texts[7] = passage + " " + texts[7]
    got = _stats(texts)
    # the 20-token passage yields 8 shared 13-grams in each carrier
    assert got.loc[3, "n_shared_ngrams"] >= 8
    assert got.loc[7, "n_shared_ngrams"] >= 8
    assert got.loc[3, "dup_ngram_frac"] > 0
    others = got.drop([3, 7])
    assert (others["n_shared_ngrams"] == 0).all()
    assert (others["dup_ngram_frac"] == 0).all()


def test_matches_bruteforce_oracle(ray_session):
    rng = np.random.RandomState(9)
    texts = [_rand_doc(rng, int(rng.randint(5, 50))) for _ in range(25)]
    # clone two docs outright and splice a shared chunk into two more
    texts[5] = texts[2]
    chunk = " ".join(f"c{i}" for i in range(15))
    texts[10] += " " + chunk
    texts[11] += " " + chunk
    got = _stats(texts)
    for doc_id, (n_grams, n_shared) in enumerate(_oracle(texts)):
        assert got.loc[doc_id, "n_grams"] == n_grams, doc_id
        assert got.loc[doc_id, "n_shared_ngrams"] == n_shared, doc_id


def test_short_and_empty_docs(ray_session):
    # docs shorter than n hash as whole docs; empty docs share the
    # sentinel — two empties count each other as duplicated
    got = _stats(["a b c", "a b c", "x y", "", ""])
    assert got.loc[0, "n_shared_ngrams"] == 1 == got.loc[1, "n_shared_ngrams"]
    assert got.loc[2, "n_shared_ngrams"] == 0
    assert got.loc[3, "n_shared_ngrams"] == 1 == got.loc[4, "n_shared_ngrams"]


def test_layout_independence(ray_session):
    rng = np.random.RandomState(4)
    texts = [_rand_doc(rng, 30) for _ in range(20)]
    texts[1] = texts[15]
    base = _stats(texts)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())})).repartition(7)
    got = cross_doc_ngram_stats(ds, "text", "doc_id").to_pandas() \
        .set_index("doc_id").sort_index()
    assert got.equals(base)
