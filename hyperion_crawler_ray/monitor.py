"""Monitoring threshold evaluation over the crawl's task-log lineage.

The reference declares alert thresholds in config — success rate >= 0.95
and stage latency <= 600 s (api/src/config/etl_config.yaml:38-43) — but
evaluation lived in its ops stack. Here the evaluator is part of the
engine: feed it the lineage rows (schema.LINEAGE_SCHEMA) and it emits
one alert row per violation, so a pipeline run can self-report.
"""

from __future__ import annotations

import json

import pyarrow as pa

DEFAULT_THRESHOLDS = {
    # fetched/selected per round (the crawl's success-rate analog)
    "min_success_rate": 0.95,
    # any single stage's wall time
    "max_stage_seconds": 600.0,
}

ALERT_SCHEMA = pa.schema([
    pa.field("round", pa.int32()),
    pa.field("task_id", pa.string()),
    pa.field("alert", pa.string()),      # success_rate | latency | task_failed
    pa.field("observed", pa.float64()),
    pa.field("threshold", pa.float64()),
    pa.field("detail", pa.string()),
])


def evaluate_alerts(lineage: pa.Table,
                    thresholds: dict | None = None) -> pa.Table:
    """One alert row per threshold violation in a lineage table:

    - ``success_rate``: round rows where rows_out / max(rows_in - kept
      deferred, 1) — here fetched/selected from result_summary — falls
      below ``min_success_rate``
    - ``latency``: any stage whose wall_ms exceeds
      ``max_stage_seconds``
    - ``task_failed``: any row with status == 'failed'
    """
    th = {**DEFAULT_THRESHOLDS, **(thresholds or {})}
    rows = []
    for rec in lineage.to_pylist():
        status = rec.get("status")
        if status == "failed":
            rows.append({
                "round": rec["round"], "task_id": rec["task_id"],
                "alert": "task_failed", "observed": 0.0, "threshold": 1.0,
                "detail": rec.get("result_summary", "")})
        wall_s = (rec.get("wall_ms") or 0.0) / 1000.0
        if wall_s > th["max_stage_seconds"]:
            rows.append({
                "round": rec["round"], "task_id": rec["task_id"],
                "alert": "latency", "observed": round(wall_s, 3),
                "threshold": float(th["max_stage_seconds"]),
                "detail": rec["stage"]})
        if rec.get("stage") == "seen_saturation":
            try:
                summ = json.loads(rec.get("result_summary") or "{}")
            except json.JSONDecodeError:
                summ = {}
            rows.append({
                "round": rec["round"], "task_id": rec["task_id"],
                "alert": "seen_saturation",
                "observed": float(summ.get("load", 0.0)),
                "threshold": 0.8,
                "detail": rec.get("result_summary", "")})
        if rec.get("stage") == "round" and status == "success":
            try:
                summ = json.loads(rec.get("result_summary") or "{}")
            except json.JSONDecodeError:
                summ = {}
            selected = summ.get("selected", 0)
            fetched = summ.get("fetched", 0)
            if selected:
                rate = fetched / selected
                if rate < th["min_success_rate"]:
                    rows.append({
                        "round": rec["round"], "task_id": rec["task_id"],
                        "alert": "success_rate",
                        "observed": round(rate, 6),
                        "threshold": float(th["min_success_rate"]),
                        "detail": f"fetched {fetched}/{selected}"})
    return pa.Table.from_pylist(rows, schema=ALERT_SCHEMA)
