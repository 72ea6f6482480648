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
