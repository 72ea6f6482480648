"""Arrow schemas for the crawl-domain tables.

Authoritative input shape from ``BASELINE.json.input_hint``:
pages ``(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.  The reference's declared-target-schema idiom
(``get_target_schema``, reference api/src/etl/krx/transformer.py:127-149)
becomes explicit ``pyarrow.Schema`` constants asserted in tests and passed
to ``write_parquet``.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input table (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Crawl seed list (FIXTURES.md §2).
SEEDS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("priority", pa.float64()),
    ]
)

# Per-host robots rules (FIXTURES.md §3).
ROBOTS_SCHEMA = pa.schema(
    [
        pa.field("host", pa.string()),
        pa.field("disallow_prefixes", pa.list_(pa.string())),
        pa.field("crawl_delay_ms", pa.int64()),
    ]
)

# Frontier rows flowing between crawl rounds.
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),          # canonical form
        pa.field("url_hash", pa.binary(20)),   # sha1(canonical url)
        pa.field("host", pa.string()),
        pa.field("priority", pa.float64()),
        pa.field("depth", pa.int32()),
    ]
)

# Crawl-order log: one row per fetched url, totally ordered by (round, seq).
ORDER_SCHEMA = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("seq", pa.int64()),
        pa.field("url", pa.string()),
    ]
)

# Market-data snapshot sink: the reference declares exact DECIMAL target
# types at the sink — DECIMAL(20,4) prices, DECIMAL(30,2) value/cap
# (api/src/etl/krx/transformer.py:127-149). Floats carry the pipeline
# (vectorized kernels); the SINK casts to decimal128 so what lands on
# disk is exact. Asserted in tests/test_marketdata.py.
MARKETDATA_SINK_SCHEMA = pa.schema(
    [
        pa.field("symbol", pa.string()),
        pa.field("name_kr", pa.string()),
        pa.field("market", pa.string()),
        pa.field("trade_date", pa.timestamp("ns")),
        pa.field("open", pa.decimal128(20, 4)),
        pa.field("high", pa.decimal128(20, 4)),
        pa.field("low", pa.decimal128(20, 4)),
        pa.field("close", pa.decimal128(20, 4)),
        pa.field("volume", pa.int64()),
        pa.field("market_cap", pa.decimal128(30, 2)),
        pa.field("shares", pa.int64()),
        pa.field("change_amount", pa.decimal128(20, 4)),
        pa.field("trading_value", pa.decimal128(30, 2)),
        pa.field("uuid", pa.string()),
        pa.field("currency", pa.string()),
        pa.field("data_source", pa.string()),
    ]
)

# Task-log lifecycle rows appended each round: one row per stage plus a
# round summary row, carrying the reference CrawlerTaskLog envelope —
# task_id, status (success|failed; pending/running are in-memory states
# of a batch engine and are not persisted), JSON parameters /
# result_summary, item counts, retry counters, execution time
# (reference api/src/models/task_log.py:11-46 and the Pub/Sub count
# summaries, workflows/krx_etl_workflow.yaml:240-252).
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("task_id", pa.string()),
        pa.field("stage", pa.string()),
        pa.field("status", pa.string()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("rows_rejected", pa.int64()),
        pa.field("retries", pa.int64()),
        pa.field("wall_ms", pa.float64()),
        pa.field("parameters", pa.string()),
        pa.field("result_summary", pa.string()),
    ]
)
