"""Market-data pipeline (pipelines/marketdata.py) vs an independent
pandas oracle implementing the reference transform semantics
(api/src/etl/krx/transformer.py:26-96 family)."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from hyperion_crawler_ray.pipelines.marketdata import (
    asset_uuid,
    gen_raw_quotes,
    run_pipeline,
)


def _half_up(x, nd):
    return np.floor(np.abs(x) * 10**nd + 0.5) / 10**nd * np.sign(x)


def pandas_oracle(raw, asset_master):
    df = raw.to_pandas()
    o = pd.DataFrame(list(df["ohlcv"]))
    out = pd.DataFrame({
        "symbol": df["ticker"].str.upper(),
        "trade_date": df["trade_date"],
        "open": o["open"], "high": o["high"], "low": o["low"],
        "close": o["close"], "volume": o["volume"],
    })
    cap = df["market_cap"].str.replace(r"[^0-9.\-]", "", regex=True)
    cap = pd.to_numeric(cap, errors="coerce")
    out["market_cap"] = np.where(cap < 1e8, cap * 1e8, cap)
    out["change_amount"] = _half_up(o["close"] * o["change_rate"] / 100, 2)
    out["trading_value"] = _half_up(o["close"] * o["volume"], 2)
    valid = (out["close"].notna() & (out["high"] >= out["low"])
             & (out["high"] >= out["close"]) & (out["low"] <= out["close"])
             & (out["volume"] >= 0))
    out = out[valid]
    out = out[out["volume"] > 0]  # holiday filter
    pre = dict(zip(asset_master["symbol"], asset_master["uuid"]))
    out["uuid"] = out["symbol"].map(lambda s: pre.get(s, asset_uuid(s)))
    out = out.sort_values(["trade_date", "symbol"], kind="mergesort")
    out = out.drop_duplicates(["uuid", "trade_date"], keep="first")
    return out.reset_index(drop=True)


@pytest.fixture(scope="module")
def fixture_data():
    raw = gen_raw_quotes(n_tickers=40, n_days=10)
    # pre-seed half the tickers (exercises both lookup paths of T-12)
    asset_master = pd.DataFrame({
        "symbol": [f"{t:06d}" for t in range(0, 40, 2)],
        "uuid": [f"preseeded-{t}" for t in range(0, 40, 2)],
    })
    return raw, asset_master


def test_pipeline_matches_pandas_oracle(fixture_data):
    raw, master = fixture_data
    got = run_pipeline(raw, master).to_pandas()
    want = pandas_oracle(raw, master)
    got = got.sort_values(["trade_date", "symbol"]).reset_index(drop=True)
    want = want.sort_values(["trade_date", "symbol"]).reset_index(drop=True)
    assert len(got) == len(want)
    for col in ["symbol", "uuid", "close", "volume", "market_cap",
                "change_amount", "trading_value"]:
        if got[col].dtype == object:
            assert (got[col].to_numpy() == want[col].to_numpy()).all(), col
        else:
            assert np.allclose(got[col].astype(float),
                               want[col].astype(float), equal_nan=True), col
    # provenance constants (T-18)
    assert (got["currency"] == "KRW").all()
    assert (got["data_source"] == "KRX").all()


def test_preseeded_and_minted_uuids(fixture_data):
    raw, master = fixture_data
    got = run_pipeline(raw, master).to_pandas()
    by_sym = got.drop_duplicates("symbol").set_index("symbol")["uuid"]
    assert by_sym["000002"] == "preseeded-2"       # lookup path
    assert by_sym["000003"] == asset_uuid("000003")  # minted path


def test_upsert_into_snapshot(fixture_data):
    raw, master = fixture_data
    first = run_pipeline(raw, master).materialize()
    n1 = first.count()
    # re-run same batch: upsert is idempotent (same keys, same rows)
    merged = run_pipeline(raw, master, existing_snapshot=first)
    assert merged.count() == n1


def test_decimal_sink_schema_and_exactness(fixture_data, tmp_path):
    """The sink casts money columns to the reference's declared DECIMAL
    types (DECIMAL(20,4) prices, DECIMAL(30,2) cap/value) and the
    decimal values equal the rounded float pipeline values exactly."""
    import decimal

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hyperion_crawler_ray.pipelines.marketdata import (
        run_pipeline,
        write_snapshot,
    )
    from hyperion_crawler_ray.schema import MARKETDATA_SINK_SCHEMA

    raw, master = fixture_data
    out = run_pipeline(raw, master)
    path = str(tmp_path / "snapshot")
    write_snapshot(out, path)
    import glob
    files = sorted(glob.glob(path + "/*.parquet"))
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    # exact declared schema at the sink
    assert tbl.schema.equals(MARKETDATA_SINK_SCHEMA), tbl.schema
    assert tbl.num_rows == out.count()
    # decimal values == half-away-rounded float values, exactly
    want = out.to_pandas().sort_values(["trade_date", "symbol"])
    got = tbl.to_pandas().sort_values(["trade_date", "symbol"])
    for col, nd in [("close", 4), ("market_cap", 2), ("trading_value", 2)]:
        w = [decimal.Decimal(str(v)).quantize(
                 decimal.Decimal(1).scaleb(-nd),
                 rounding=decimal.ROUND_HALF_UP)
             for v in want[col]]
        assert list(got[col]) == w, col


def test_country_code_in_natural_key():
    """Reference parity: AssetMaster is keyed on (symbol, country_code)
    — the same symbol in two markets mints two DIFFERENT uuids."""
    import pandas as pd
    import ray.data as rd

    from hyperion_crawler_ray.pipelines.marketdata import (
        assign_asset_uuids,
        asset_uuid,
    )
    import ray

    ds = rd.from_pandas(pd.DataFrame({
        "symbol": ["000001", "000001", "000002"],
        "country_code": ["KR", "US", "KR"],
    }))
    out, actors = assign_asset_uuids(ds, pd.DataFrame(
        {"symbol": [], "uuid": []}), country_col="country_code")
    got = out.to_pandas()
    for a in actors:
        ray.kill(a)
    by_key = dict(zip(zip(got["symbol"], got["country_code"]), got["uuid"]))
    assert by_key[("000001", "KR")] == asset_uuid("000001", "KR")
    assert by_key[("000001", "US")] == asset_uuid("000001", "US")
    assert by_key[("000001", "KR")] != by_key[("000001", "US")]
