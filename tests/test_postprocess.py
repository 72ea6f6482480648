"""Post-crawl fuzzy dedup (pipelines/postprocess.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.pipelines.postprocess import dedup_pages
from hyperion_crawler_ray.stages.dedup import minhash_signatures


def _pages(texts):
    """Crawl-output-shaped pages table: (round, seq, url, text, minhash),
    minhash computed by the same signature kernel the crawl uses."""
    base = rd.from_arrow(pa.table({
        "url": pa.array([f"http://h{i}.test/p" for i in range(len(texts))],
                        pa.string()),
        "round": pa.array([0] * len(texts), pa.int32()),
        "seq": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "doc_id": pa.array(range(len(texts)), pa.int64()),
    }))
    sigs = minhash_signatures(base, "text", "doc_id").to_pandas() \
        .set_index("doc_id").sort_index()

    def attach(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        mh = pa.array([list(sigs.loc[i, "sig"]) for i in ids],
                      pa.list_(pa.uint64()))
        return t.drop_columns(["doc_id"]).append_column("minhash", mh)

    return base.map_batches(attach, batch_format="pyarrow")


def _rand_doc(rng, n_tok=40):
    return " ".join(f"w{rng.randint(0, 1_000_000)}" for _ in range(n_tok))


def test_planted_duplicates_keep_earliest(ray_session):
    rng = np.random.RandomState(2)
    texts = [_rand_doc(rng) for _ in range(10)]
    texts[2] = texts[1]
    texts[5] = texts[1]
    texts[7] = texts[6]
    kept = dedup_pages(_pages(texts), threshold=0.5).to_pandas()
    kept_seq = sorted(kept["seq"])
    # keep-earliest: clusters {1,2,5} -> keep 1, {6,7} -> keep 6
    assert kept_seq == [0, 1, 3, 4, 6, 8, 9]
    assert "minhash" in kept.columns and "__page_id" not in kept.columns


def test_no_duplicates_keeps_all(ray_session):
    rng = np.random.RandomState(8)
    texts = [_rand_doc(rng) for _ in range(8)]
    kept = dedup_pages(_pages(texts), threshold=0.5).to_pandas()
    assert sorted(kept["seq"]) == list(range(8))


def test_layout_independence(ray_session):
    rng = np.random.RandomState(5)
    texts = [_rand_doc(rng) for _ in range(12)]
    texts[9] = texts[3]
    a = sorted(dedup_pages(_pages(texts), threshold=0.5)
               .to_pandas()["seq"])
    b = sorted(dedup_pages(_pages(texts).repartition(5), threshold=0.5)
               .to_pandas()["seq"])
    assert a == b and 9 not in a and 3 in a
