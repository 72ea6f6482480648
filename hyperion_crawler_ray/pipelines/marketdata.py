"""Reference-shaped market-data E->T->L pipeline (the flagship transform
of the reference, re-expressed Ray-Data-first).

Mirrors the KRX daily-price flow end to end:
- nested raw docs ``{ticker, name_kr, market, trade_date, ohlcv:{...},
  market_cap, shares}`` (reference api/src/etl/krx/extractor.py:69-84)
- T-11 transform: nested->flat projection, dirty-numeric cleaning,
  unit normalization, rule-gated derived columns, constant provenance
  columns, row-quality filter with skip-bad-row policy
  (api/src/etl/krx/transformer.py:26-96)
- T-12 stateful lookup-or-create of the surrogate ``uuid`` against the
  AssetMaster dimension (api/src/etl/krx/transformer.py:151-195) — here a
  SHARDED ACTOR POOL keyed by hash(symbol), the same pattern as the
  URL-seen shards; minting is deterministic (uuid5) so re-runs are
  idempotent across any parallelism
- D-1 dedup on (uuid, trade_date) + T-17 holiday filter + S-5 upsert
  merge into the previous snapshot (api/src/etl/krx/loader.py:24-137)

All inputs are deterministic synthetic fixtures (FIXTURES.md §4-5).
"""

from __future__ import annotations

import uuid as uuidlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_NAMESPACE = uuidlib.UUID("6ba7b811-9dad-11d1-80b4-00c04fd430c8")

_MARKETS = ("KOSPI", "KOSPI", "KOSDAQ", "KOSDAQ", "KONEX", "UNKNOWN")
_KR_SYL = ("가", "나", "다", "라", "마", "바", "사", "자", "전", "한")


def asset_uuid(symbol: str, country: str = "KR") -> str:
    """Deterministic surrogate key (reference mints uuid4 + relies on a
    DB unique constraint; uuid5 gives the same idempotency without
    coordination)."""
    return str(uuidlib.uuid5(_NAMESPACE, f"{country}:{symbol}"))


def gen_raw_quotes(n_tickers: int, n_days: int, seed: int = 42) -> pa.Table:
    """FIXTURES.md §4 raw_quotes: nested ohlcv struct with NULLs and
    price-logic violations, dirty market_cap strings, Korean names."""
    rng = np.random.RandomState(seed)
    rows = []
    for t in range(n_tickers):
        ticker = f"{t:06d}"
        name = "".join(_KR_SYL[d] for d in map(int, f"{t % 1000:03d}")) + "전자"
        market = _MARKETS[t % len(_MARKETS)]
        base = 1000 + (t * 37) % 90000
        for d in range(n_days):
            close = float(base * (1 + 0.001 * ((t * 7 + d * 13) % 40 - 20)))
            high = close * 1.02
            low = close * 0.98
            r = rng.rand()
            if r < 0.03:   # broken price logic -> must be dropped
                high, low = low, high
            volume = 0 if r > 0.97 else int(1000 + (t * d) % 50000)
            ohlcv = {
                "open": round(close * 0.995, 2),
                "high": round(high, 2),
                "low": round(low, 2),
                "close": None if 0.03 <= r < 0.05 else round(close, 2),
                "volume": volume,
                "change_rate": round(((t + d) % 11 - 5) / 10.0, 2),
            }
            cap_raw = close * 1_000_000
            style = (t + d) % 3
            if style == 0:
                cap = f"{cap_raw:,.0f}"
            elif style == 1:
                cap = f"₩{cap_raw:,.0f}"
            else:
                cap = f"{cap_raw / 1e8:.1f}"  # 억원-unit (needs ×1e8)
            rows.append({
                "ticker": ticker, "name_kr": name, "market": market,
                "trade_date": pd.Timestamp("2024-01-01")
                + pd.Timedelta(days=d),
                "ohlcv": ohlcv, "market_cap": cap,
                "shares": int(1_000_000 + t * 1000),
            })
    # duplicate some rows (exercises D-1 dedup, first-wins)
    dup = [dict(rows[k]) for k in range(0, len(rows), 97)]
    return pa.Table.from_pylist(rows + dup)


@ray.remote(num_cpus=0.05)
class AssetShard:
    """One shard of the AssetMaster lookup-or-create service (ST-1/T-12).
    The natural key is ``(symbol, country_code)`` — the reference keys
    AssetMaster on both (api/src/etl/krx/transformer.py:158-190), so the
    cache is keyed by ``"country:symbol"`` and the same symbol in two
    markets mints two distinct uuids. Mints deterministically on miss
    and records the minted dimension row."""

    def __init__(self, preseed: dict[tuple[str, str], str]):
        self.cache = {f"{c}:{s}": u for (s, c), u in preseed.items()}
        self.minted: dict[str, str] = {}

    def get_or_create(self, keys: list[tuple[str, str]]) -> list[str]:
        out = []
        for sym, country in keys:
            k = f"{country}:{sym}"
            u = self.cache.get(k)
            if u is None:
                u = asset_uuid(sym, country)
                self.cache[k] = u
                self.minted[k] = u
            out.append(u)
        return out

    def minted_rows(self) -> dict[str, str]:
        return dict(self.minted)


def transform_quotes(ds: rd.Dataset, rules: dict | None = None) -> rd.Dataset:
    """T-11: one vectorized map_batches stage composing T-1..T-9 + the
    T-13 validation mask (invalid rows dropped, not errored)."""
    rules = {"calculate_change_amount": True,
             "calculate_trading_value": True, **(rules or {})}

    def f(t: pa.Table) -> pa.Table:
        o = t.column("ohlcv")
        close = pc.struct_field(o, "close")
        high = pc.struct_field(o, "high")
        low = pc.struct_field(o, "low")
        open_ = pc.struct_field(o, "open")
        volume = pc.struct_field(o, "volume")
        change_rate = pc.struct_field(o, "change_rate")

        # T-2 clean_numeric + T-9 normalize_market_cap (억원 unit fix)
        cap = pc.replace_substring_regex(t.column("market_cap"),
                                         "[^0-9.\\-]", "")
        cap = pc.cast(pc.if_else(pc.equal(cap, ""), None, cap), pa.float64(),
                      safe=False)
        cap = pc.if_else(pc.less(cap, 1e8), pc.multiply(cap, 1e8), cap)

        cols = {
            "symbol": pc.utf8_upper(t.column("ticker")),  # T-10
            "name_kr": t.column("name_kr"),
            "market": t.column("market"),
            "trade_date": t.column("trade_date"),
            "open": open_, "high": high, "low": low, "close": close,
            "volume": volume,
            "market_cap": cap,
            "shares": t.column("shares"),
        }
        if rules["calculate_change_amount"]:  # T-7
            cols["change_amount"] = pc.round(
                pc.divide(pc.multiply(close, change_rate), 100.0), ndigits=2,
                round_mode="half_towards_infinity")
        if rules["calculate_trading_value"]:  # T-8
            cols["trading_value"] = pc.round(
                pc.multiply(close, pc.cast(volume, pa.float64())), ndigits=2,
                round_mode="half_towards_infinity")
        out = pa.table(cols)

        # T-13 validation mask: close present, high >= open/close/low,
        # low <= open/close, volume >= 0 — invalid rows dropped
        valid = pc.is_valid(out.column("close"))
        valid = pc.and_kleene(valid, pc.greater_equal(out.column("high"),
                                                      out.column("low")))
        valid = pc.and_kleene(valid, pc.greater_equal(out.column("high"),
                                                      out.column("close")))
        valid = pc.and_kleene(valid, pc.less_equal(out.column("low"),
                                                   out.column("close")))
        valid = pc.and_kleene(valid, pc.greater_equal(
            pc.cast(out.column("volume"), pa.int64()), 0))
        return out.filter(pc.fill_null(valid, False))

    return ds.map_batches(f, batch_format="pyarrow")


def assign_asset_uuids(ds: rd.Dataset, asset_master: pd.DataFrame,
                       n_shards: int = 4,
                       country_col: str | None = None,
                       default_country: str = "KR") -> tuple[rd.Dataset, list]:
    """T-12 lookup-or-create via sharded actor pool; shard = pure
    function of the (symbol, country) natural key, so minting is
    conflict-free and deterministic. ``country_col`` names a per-row
    country column when the feed is multi-market; KRX rows default to
    KR (the reference's AssetMaster key is (symbol, country_code))."""
    import zlib

    def shard_fn(sym: str, country: str) -> int:
        return zlib.crc32(f"{country}:{sym}".encode()) % n_shards

    pre: list[dict[tuple[str, str], str]] = [{} for _ in range(n_shards)]
    for _, r in asset_master.iterrows():
        country = r.get("country_code", default_country) \
            if "country_code" in asset_master.columns else default_country
        pre[shard_fn(r["symbol"], country)][(r["symbol"], country)] = r["uuid"]
    actors = [AssetShard.remote(pre[s]) for s in range(n_shards)]

    def lookup(df: pd.DataFrame) -> pd.DataFrame:
        if country_col and country_col in df.columns:
            countries = df[country_col].to_numpy(dtype=object)
        else:
            countries = np.full(len(df), default_country, dtype=object)
        syms = df["symbol"].to_numpy(dtype=object)
        shards = np.fromiter(
            (shard_fn(s, c) for s, c in zip(syms, countries)),
            dtype=np.int64, count=len(df))
        uuids = np.empty(len(df), dtype=object)
        for s in np.unique(shards):
            mask = shards == s
            keys = list(zip(syms[mask].tolist(),
                            countries[mask].tolist()))
            uuids[mask] = ray.get(actors[int(s)].get_or_create.remote(keys))
        df = df.copy()
        df["uuid"] = uuids
        return df

    return ds.map_batches(lookup, batch_format="pandas"), actors


def run_pipeline(raw: pa.Table, asset_master: pd.DataFrame,
                 existing_snapshot: rd.Dataset | None = None,
                 n_shards: int = 4) -> rd.Dataset:
    """Full E->T->L: transform -> uuid assign -> holiday filter ->
    dedup(uuid, trade_date) first-wins -> upsert into snapshot."""
    from ..sources.merge import upsert
    from ..stages.dedup import exact_dedup
    from ..stages.transforms import add_metadata, filter_expr

    ds = rd.from_arrow(raw)
    ds = transform_quotes(ds)
    ds, actors = assign_asset_uuids(ds, asset_master, n_shards)
    ds = filter_expr(ds, lambda t: pc.greater(
        pc.cast(t.column("volume"), pa.int64()), 0))  # T-17 holiday filter
    ds = add_metadata(ds, {"currency": "KRW", "data_source": "KRX"})
    ds = exact_dedup(ds, ["uuid", "trade_date"],
                     ["trade_date", "symbol"], [True, True])
    if existing_snapshot is not None:
        ds = upsert(existing_snapshot, ds, ["uuid", "trade_date"])
    # materialize before killing the asset shards — the plan is lazy and
    # the actors must exist while it executes; without this the actors
    # would leak into the caller's session (driver runs many queries in
    # one session)
    ds = ds.materialize()
    for a in actors:
        ray.kill(a)
    return ds


def to_sink_schema(ds: rd.Dataset) -> rd.Dataset:
    """Cast the float pipeline columns to the exact DECIMAL sink schema
    (reference api/src/etl/krx/transformer.py:127-149 declares
    DECIMAL(20,4) prices / DECIMAL(30,2) cap+value). Floats stay in the
    compute path (vectorized kernels); exactness is enforced at the
    sink boundary."""
    from ..schema import MARKETDATA_SINK_SCHEMA as S

    def cast(t: pa.Table) -> pa.Table:
        arrays = []
        for field in S:
            col = t.column(field.name)
            if pa.types.is_decimal(field.type):
                # round half-away at the declared scale first so the
                # float->decimal cast is exact and deterministic
                col = pc.round(pc.cast(col, pa.float64()),
                               ndigits=field.type.scale,
                               round_mode="half_towards_infinity")
            arrays.append(pc.cast(col, field.type, safe=False))
        return pa.Table.from_arrays(arrays, schema=S)

    return ds.map_batches(cast, batch_format="pyarrow")


def write_oracle_fixtures(n_tickers: int = 60, n_days: int = 12,
                          out_dir: str = "/tmp/hyperion_md_oracle") -> str:
    """Export the deterministic synthetic inputs of the flagship pipeline
    as DuckDB-readable parquet (round 3, VERDICT item 7): ``raw.parquet``
    is gen_raw_quotes with the ohlcv struct flattened; ``uuids.parquet``
    is the (symbol, uuid) dimension the pipeline must converge to —
    preseeded rows keep their master uuid, the rest carry the
    deterministic uuid5 mint. The uuid VALUES are shared with the
    pipeline by construction (uuid5 is not SQL-expressible); everything
    else — transform arithmetic, validation mask, cap normalization,
    lookup ROUTING, dedup, holiday filter — is independently re-derived
    by SQL_MARKETDATA. Idempotent: rewrites the same bytes each call."""
    import os

    import pyarrow.parquet as _pq

    os.makedirs(out_dir, exist_ok=True)
    raw = gen_raw_quotes(n_tickers=n_tickers, n_days=n_days)
    o = raw.column("ohlcv")
    flat = pa.table({
        "ticker": raw.column("ticker"),
        "name_kr": raw.column("name_kr"),
        "market": raw.column("market"),
        "trade_date": raw.column("trade_date"),
        "open": pc.struct_field(o, "open"),
        "high": pc.struct_field(o, "high"),
        "low": pc.struct_field(o, "low"),
        "close": pc.struct_field(o, "close"),
        "volume": pc.struct_field(o, "volume"),
        "change_rate": pc.struct_field(o, "change_rate"),
        "market_cap": raw.column("market_cap"),
        "shares": raw.column("shares"),
    })
    _pq.write_table(flat, os.path.join(out_dir, "raw.parquet"))
    dim = pa.table({
        "symbol": pa.array([f"{t:06d}" for t in range(n_tickers)],
                           pa.string()),
        "uuid": pa.array([f"preseeded-{t}" if t % 2 == 0
                          else asset_uuid(f"{t:06d}")
                          for t in range(n_tickers)], pa.string()),
    })
    _pq.write_table(dim, os.path.join(out_dir, "uuids.parquet"))
    return out_dir


def write_snapshot(ds: rd.Dataset, path: str) -> None:
    """Sink the snapshot as decimal-typed parquet (S-6 chunked bulk
    insert analog: one file per block, resumable layout)."""
    to_sink_schema(ds).write_parquet(path)
