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

# Per-round, per-partition lineage/metrics appended each round
# (reference analog: CrawlerTaskLog api/src/models/task_log.py:11-46 and
# the Pub/Sub count summaries, workflows/krx_etl_workflow.yaml:240-252).
LINEAGE_SCHEMA = pa.schema(
    [
        pa.field("round", pa.int32()),
        pa.field("stage", pa.string()),
        pa.field("partition", pa.int32()),
        pa.field("rows_in", pa.int64()),
        pa.field("rows_out", pa.int64()),
        pa.field("rows_rejected", pa.int64()),
        pa.field("wall_ms", pa.float64()),
    ]
)
