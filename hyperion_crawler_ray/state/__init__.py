"""Stateful components: cuckoo-filter URL-seen shards, robots gate,
politeness budgets. Reference analogs: the per-transformer uuid cache
(ST-1, api/src/etl/krx/transformer.py:24), the seen-keys dedup set (ST-3,
api/src/etl/base/loader.py:196-204), and the FK semi-join gate (J-2,
api/src/etl/krx/loader.py:187-193), re-expressed as sharded Ray actors +
broadcast lookups per SURVEY.md §7.
"""
