"""Config tree + pipeline builder (SURVEY.md §2.10, T-22).

Re-derives the reference's YAML-driven component registry
(api/src/services/etl_service.py:37-90) and recursive ``${ENV}``
substitution (api/src/services/etl_service.py:56-66) as a plain-Python
step registry: a pipeline config is a list of step dicts, each naming a
registered ``Dataset -> Dataset`` factory plus kwargs (the reference's
per-run boolean "rules" hook becomes plain kwargs).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

import ray.data as rd

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::-(.*?))?\}")


def substitute_env(tree):
    """Recursive ${ENV} / ${ENV:-default} substitution over a config
    tree (dicts / lists / strings)."""
    if isinstance(tree, dict):
        return {k: substitute_env(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [substitute_env(v) for v in tree]
    if isinstance(tree, str):
        def repl(m):
            return os.environ.get(m.group(1), m.group(2) or "")
        return _ENV_RE.sub(repl, tree)
    return tree


class StepRegistry:
    """Named ``(Dataset, **kwargs) -> Dataset`` step factories — the
    plugin surface (reference: register subclass triads per source,
    enable via YAML)."""

    def __init__(self):
        self._steps: dict[str, Callable] = {}

    def register(self, name: str, fn: Callable | None = None):
        if fn is not None:
            self._steps[name] = fn
            return fn

        def deco(f):
            self._steps[name] = f
            return f
        return deco

    def get(self, name: str) -> Callable:
        if name not in self._steps:
            raise KeyError(f"unknown step '{name}'; registered: "
                           f"{sorted(self._steps)}")
        return self._steps[name]

    def names(self) -> list[str]:
        return sorted(self._steps)


DEFAULT_REGISTRY = StepRegistry()


def _register_defaults():
    from .stages import transforms as tr

    DEFAULT_REGISTRY.register("normalize_date", tr.normalize_date)
    DEFAULT_REGISTRY.register("clean_numeric", tr.clean_numeric)
    DEFAULT_REGISTRY.register("map_fields", tr.map_fields)
    DEFAULT_REGISTRY.register("apply_defaults", tr.apply_defaults)
    DEFAULT_REGISTRY.register("filter_fields", tr.filter_fields)
    DEFAULT_REGISTRY.register("conditional_scale", tr.conditional_scale)
    DEFAULT_REGISTRY.register("normalize_identifier", tr.normalize_identifier)
    DEFAULT_REGISTRY.register("whitelist", tr.whitelist)
    DEFAULT_REGISTRY.register("add_metadata", tr.add_metadata)
    DEFAULT_REGISTRY.register("categorical_map", tr.categorical_map)
    DEFAULT_REGISTRY.register("split_column", tr.split_column)


_register_defaults()


def build_pipeline(ds: rd.Dataset, steps: list[dict],
                   registry: StepRegistry = DEFAULT_REGISTRY) -> rd.Dataset:
    """Compose a Dataset plan from config: each step is
    ``{"step": name, **kwargs}``. The plan stays lazy — composition adds
    no execution."""
    steps = substitute_env(steps)
    for spec in steps:
        spec = dict(spec)
        name = spec.pop("step")
        ds = registry.get(name)(ds, **spec)
    return ds


def load_config(path: str) -> dict:
    """Load a YAML config tree with recursive ${ENV} substitution — the
    reference's file-level config loading
    (api/src/services/etl_service.py:45-66 loads etl_config.yaml and
    env-substitutes before instantiating sources)."""
    import yaml

    with open(path) as f:
        tree = yaml.safe_load(f)
    return substitute_env(tree)


def enabled_sources(cfg: dict) -> list[str]:
    """Source-enable surface (reference api/src/config/etl_config.yaml:4-7:
    per-source ``enabled`` flags; disabled sources stay registered but
    are never instantiated)."""
    return sorted(name for name, sc in cfg.get("sources", {}).items()
                  if sc.get("enabled", False))


def build_from_config(cfg: dict, inputs: dict[str, rd.Dataset],
                      registry: StepRegistry = DEFAULT_REGISTRY
                      ) -> dict[str, rd.Dataset]:
    """Instantiate one pipeline per ENABLED source from a loaded config
    tree: ``{sources: {name: {enabled: true, steps: [...]}}}``. Inputs
    maps source name -> its input Dataset; a missing input for an
    enabled source raises (config error), disabled sources are
    skipped even when an input is offered."""
    out: dict[str, rd.Dataset] = {}
    for name in enabled_sources(cfg):
        if name not in inputs:
            raise KeyError(f"enabled source '{name}' has no input dataset")
        out[name] = build_pipeline(inputs[name],
                                   cfg["sources"][name].get("steps", []),
                                   registry)
    return out
