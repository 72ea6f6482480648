"""Config tree + step registry (config.py — reference §2.10/T-22)."""

import os

import pyarrow as pa
import ray.data as rd

from hyperion_crawler_ray.config import (
    DEFAULT_REGISTRY,
    build_pipeline,
    substitute_env,
)


def test_env_substitution_recursive():
    os.environ["HYP_TEST_X"] = "abc"
    tree = {"a": "${HYP_TEST_X}", "b": ["${HYP_TEST_X}/y", 3],
            "c": {"d": "${HYP_MISSING:-fallback}"}}
    out = substitute_env(tree)
    assert out == {"a": "abc", "b": ["abc/y", 3], "c": {"d": "fallback"}}


def test_registry_rejects_unknown_step():
    import pytest

    with pytest.raises(KeyError, match="unknown step"):
        DEFAULT_REGISTRY.get("nope")


def test_build_pipeline_composes_lazily_and_runs():
    ds = rd.from_arrow(pa.table({
        "sym": ["aa", "bb", "cc"], "val": [1.0, 2.0, 3.0]}))
    steps = [
        {"step": "normalize_identifier", "col": "sym", "out": "sym_up",
         "upper": True, "pad_to": 4},
        {"step": "whitelist", "col": "sym", "allowed": ["aa", "cc"]},
        {"step": "filter_fields", "allowed": ["sym_up", "val"]},
    ]
    out = build_pipeline(ds, steps).to_pandas()
    assert list(out["sym_up"]) == ["00AA", "00CC"]
    assert list(out.columns) == ["sym_up", "val"]


def test_yaml_config_tree_drives_pipeline_end_to_end(tmp_path):
    """Reference parity: load a YAML config file, env-substitute it,
    instantiate only ENABLED sources, run the composed plan
    (api/src/services/etl_service.py:45-90)."""
    import os

    from hyperion_crawler_ray.config import (
        build_from_config,
        enabled_sources,
        load_config,
    )

    os.environ.pop("HYP_CFG_SOURCE", None)
    cfg = load_config("tests/fixtures/etl_config.yaml")
    assert enabled_sources(cfg) == ["events"]   # dart disabled

    events = rd.from_arrow(pa.table({
        "event_id": [1, 2, 3, 4],
        "event_type": ["purchase", "view", "click", "purchase"],
    }))
    pipes = build_from_config(cfg, {"events": events, "dart": events})
    assert set(pipes) == {"events"}
    out = pipes["events"].to_pandas().sort_values("event_id")
    assert list(out["event_id"]) == [1, 3, 4]
    assert list(out["type_score"]) == [3, 2, 3]
    assert (out["data_source"] == "yaml-events").all()


def test_enabled_source_without_input_raises():
    import pytest

    from hyperion_crawler_ray.config import build_from_config

    with pytest.raises(KeyError, match="no input dataset"):
        build_from_config({"sources": {"x": {"enabled": True}}}, {})


def test_monitor_alert_evaluation():
    """Alert thresholds (reference api/src/config/etl_config.yaml:38-43):
    success-rate, latency, and failed-task alerts from lineage rows."""
    import json

    from hyperion_crawler_ray.monitor import evaluate_alerts
    from hyperion_crawler_ray.schema import LINEAGE_SCHEMA

    rows = [
        # healthy round
        {"round": 0, "task_id": "r0000:round", "stage": "round",
         "status": "success", "rows_in": 100, "rows_out": 99,
         "rows_rejected": 1, "retries": 0, "wall_ms": 1000.0,
         "parameters": "{}",
         "result_summary": json.dumps({"selected": 100, "fetched": 99})},
        # low success rate
        {"round": 1, "task_id": "r0001:round", "stage": "round",
         "status": "success", "rows_in": 100, "rows_out": 10,
         "rows_rejected": 90, "retries": 2, "wall_ms": 1000.0,
         "parameters": "{}",
         "result_summary": json.dumps({"selected": 100, "fetched": 10})},
        # slow stage
        {"round": 1, "task_id": "r0001:fetch_extract",
         "stage": "fetch_extract", "status": "success", "rows_in": -1,
         "rows_out": -1, "rows_rejected": -1, "retries": 0,
         "wall_ms": 700_000.0, "parameters": "{}", "result_summary": "{}"},
        # failed task
        {"round": 2, "task_id": "r0002:round", "stage": "round",
         "status": "failed", "rows_in": -1, "rows_out": -1,
         "rows_rejected": -1, "retries": 0, "wall_ms": -1.0,
         "parameters": "{}",
         "result_summary": json.dumps({"error": "boom"})},
    ]
    lineage = pa.Table.from_pylist(rows, schema=LINEAGE_SCHEMA)
    alerts = evaluate_alerts(lineage).to_pandas()
    kinds = sorted(zip(alerts["round"], alerts["alert"]))
    assert kinds == [(1, "latency"), (1, "success_rate"), (2, "task_failed")]
