"""Conformance against the reference's own golden fixture values.

The reference's test corpus (`mock_pykrx`, reference tests/conftest.py:
113-148) is a deterministic 2-ticker day: Samsung 005930 (open 71000,
high 72000, low 70000, close 71500, volume 15,000,000, change_rate 1.5)
and SK hynix 000660 (2500/2600/2400/2550, 5,000,000, -2.0). This test
feeds the SAME values through our transform and asserts the reference's
derived-measure math (T-7 change_amount = round(close*rate/100, 2),
T-8 trading_value = round(close*volume, 2), reference
api/src/etl/base/transformer.py:144-154)."""

import datetime

import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.pipelines.marketdata import transform_quotes


def _golden_raw() -> pa.Table:
    rows = []
    for ticker, name, o, h, l, c, v, rate, cap, shares in [
        ("005930", "삼성전자", 71000, 72000, 70000, 71500, 15_000_000, 1.5,
         450_000_000_000_000, 5_969_782_550),
        ("000660", "SK하이닉스", 2500, 2600, 2400, 2550, 5_000_000, -2.0,
         180_000_000_000_000, 70_592_343),
    ]:
        rows.append({
            "ticker": ticker, "name_kr": name, "market": "KOSPI",
            "trade_date": datetime.datetime(2024, 1, 15),
            "ohlcv": {"open": float(o), "high": float(h), "low": float(l),
                      "close": float(c), "volume": v,
                      "change_rate": rate},
            "market_cap": f"{cap:,}",
            "shares": shares,
        })
    return pa.Table.from_pylist(rows)


def test_reference_golden_day():
    out = transform_quotes(rd.from_arrow(_golden_raw())).to_pandas() \
        .set_index("symbol")

    sam = out.loc["005930"]
    assert sam["close"] == 71500.0
    assert sam["change_amount"] == round(71500 * 1.5 / 100, 2)  # 1072.5
    assert sam["trading_value"] == round(71500.0 * 15_000_000, 2)
    assert sam["market_cap"] == 450_000_000_000_000.0
    assert sam["name_kr"] == "삼성전자"

    hyx = out.loc["000660"]
    assert hyx["change_amount"] == round(2550 * -2.0 / 100, 2)  # -51.0
    assert hyx["trading_value"] == round(2550.0 * 5_000_000, 2)
    assert hyx["market_cap"] == 180_000_000_000_000.0


def test_negative_change_amount_rounding():
    # half-away-from-zero on a negative value (reference: Python round
    # is banker's, but the reference values never hit exact halves; our
    # convention is documented half-away)
    out = transform_quotes(rd.from_arrow(_golden_raw())).to_pandas()
    assert (out["change_amount"] == [1072.5, -51.0]).all()
