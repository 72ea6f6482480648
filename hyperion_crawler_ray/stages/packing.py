"""Sequence packing for LLM training-data prep: greedily pack documents
into fixed token-budget sequences (the standard "concat-and-split-free"
packing used when assembling pretraining batches).

Deterministic-by-construction at any parallelism: docs are
hash-partitioned into ``num_buckets`` independent packing domains
(bucket = doc_id % num_buckets), and within each bucket packed greedily
in doc_id order. A pack never crosses buckets, so the layout is a pure
function of (doc ids, token counts, budget, num_buckets) — NOT of Ray's
block boundaries. At 100 TB, num_buckets scales with corpus size and
each bucket is one task; the greedy scan is O(bucket rows) with no
cross-bucket state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def pack_greedy(doc_ids: np.ndarray, n_tokens: np.ndarray,
                budget: int) -> np.ndarray:
    """Reference kernel (also used by tests as the single-threaded
    oracle): sequential first-fit in the given order. Returns the pack
    index per doc. A doc longer than ``budget`` gets its own pack."""
    packs = np.empty(len(doc_ids), dtype=np.int64)
    pack, used = 0, 0
    for i, t in enumerate(n_tokens):
        if used > 0 and used + t > budget:
            pack += 1
            used = 0
        packs[i] = pack
        used += t
    return packs


def pack_sequences(ds: rd.Dataset, id_col: str, tokens_col: str,
                   budget: int, num_buckets: int = 16) -> rd.Dataset:
    """Pack (id, n_tokens) rows into sequences of total tokens <=
    ``budget``. Emits one row per pack: (bucket, pack_seq, n_docs,
    pack_tokens, doc_ids list<int64>)."""

    def bucketize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        ids = t.column(id_col)
        b = pc.cast(pc.bit_wise_and(ids, num_buckets - 1)
                    if (num_buckets & (num_buckets - 1)) == 0
                    else pc.subtract(ids, pc.multiply(
                        pc.divide(ids, num_buckets),
                        pa.scalar(num_buckets, ids.type))),
                    pa.int32())
        return pa.table({id_col: ids,
                         tokens_col: t.column(tokens_col),
                         "bucket": b})

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(id_col, kind="mergesort")
        ids = df[id_col].to_numpy(dtype=np.int64)
        toks = df[tokens_col].to_numpy(dtype=np.int64)
        packs = pack_greedy(ids, toks, budget)
        g = pd.DataFrame({"p": packs, "id": ids, "t": toks}).groupby(
            "p", sort=True)
        out = g.agg(n_docs=("id", "size"), pack_tokens=("t", "sum"))
        out["doc_ids"] = g["id"].agg(list)
        out["bucket"] = np.int32(df["bucket"].iloc[0])
        out = out.reset_index().rename(columns={"p": "pack_seq"})
        return out[["bucket", "pack_seq", "n_docs", "pack_tokens",
                    "doc_ids"]]

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
