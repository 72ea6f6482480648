"""Hub-host selection at size (round-5 punch #6): a pending frontier
where ONE host holds ~1M rows, measured through the task-graph selection
layer — unsalted single-task vs the salted two-stage path the auto-salt
trigger switches to — with result-set equality asserted.

    python tools/salt_bench.py [--hub-rows 1000000] [--cpus 16]

Prints one JSON line: wall seconds for each path, the speedup, and the
equality verdict. The salted path's stage-1 tasks each hold ~hub/salt_n
rows, which is the bound that matters at 10^10-frontier scale (an
unsalted hub task's memory and sort time grow with the hub, salted ones
do not).
"""

from __future__ import annotations

import hashlib
import json
import time

import numpy as np
import pyarrow as pa


def _mk_pending(hub_rows: int, bg_hosts: int, bg_rows_per: int) -> pa.Table:
    """Deterministic synthetic pending frontier: one hub host + spread
    background hosts, schema-identical to the crawl's frontier."""
    urls, hashes, hexes, hosts, prios, depths = [], [], [], [], [], []

    def add(url: str, host: str, prio: float, depth: int) -> None:
        h = hashlib.sha1(url.encode()).digest()
        urls.append(url)
        hashes.append(h)
        hexes.append(h.hex())
        hosts.append(host)
        prios.append(prio)
        depths.append(depth)

    for i in range(hub_rows):
        add(f"https://hub.example/p{i}", "hub.example",
            0.5 + (i % 97) / 1000.0, 1 + i % 3)
    for hI in range(bg_hosts):
        for i in range(bg_rows_per):
            add(f"https://h{hI}.example/p{i}", f"h{hI}.example",
                0.4 + (i % 89) / 1000.0, 1)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "url_hash": pa.array(hashes, pa.binary()),
        "hash_hex": pa.array(hexes, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "priority": pa.array(prios, pa.float64()),
        "depth": pa.array(np.asarray(depths, np.int32), pa.int32()),
    })


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--hub-rows", type=int, default=1_000_000)
    ap.add_argument("--bg-hosts", type=int, default=64)
    ap.add_argument("--bg-rows-per", type=int, default=3000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--salt-n", type=int, default=8)
    args = ap.parse_args()

    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from hyperion_crawler_ray.pipelines.frontier_tg import (
        _host_bucket_of,
        _tg_partial_top,
        _tg_select,
        parts_from_table,
    )
    from hyperion_crawler_ray.state.robots import RobotsIndex

    pend = _mk_pending(args.hub_rows, args.bg_hosts, args.bg_rows_per)
    P = 64
    parts = parts_from_table(pend, P)
    hub_b = int(_host_bucket_of(np.asarray(["hub.example"], dtype=object),
                                P)[0])
    robots = RobotsIndex(pa.table({
        "host": pa.array([], pa.string()),
        "disallow_prefixes": pa.array([], pa.list_(pa.string())),
        "crawl_delay_ms": pa.array([], pa.int64())}))
    rref = ray.put(robots)
    mph, win = 4096, 1 << 22

    def run_unsalted():
        outs = [_tg_select.remote(rref, mph, win, *pc)
                for pc in parts if pc]
        ray.get([o[2] for o in outs])
        return outs

    def run_salted():
        outs = []
        for b, pc in enumerate(parts):
            if not pc:
                continue
            if b == hub_b:
                partials = [_tg_partial_top.remote(rref, mph, win, i,
                                                   args.salt_n, *pc)
                            for i in range(args.salt_n)]
                outs.append(_tg_select.remote(rref, mph, win,
                                              *[p[0] for p in partials]))
            else:
                outs.append(_tg_select.remote(rref, mph, win, *pc))
        ray.get([o[2] for o in outs])
        return outs

    # warm both paths once (worker spawn + import), then time
    run_unsalted(); run_salted()
    t0 = time.perf_counter(); u = run_unsalted()
    t_unsalted = time.perf_counter() - t0
    t0 = time.perf_counter(); s = run_salted()
    t_salted = time.perf_counter() - t0

    def sel_ids(outs):
        ids = []
        for o in outs:
            t = ray.get(o[0])
            ids.extend(t.column("hash_hex").to_pylist())
        return sorted(ids)

    equal = sel_ids(u) == sel_ids(s)
    print(json.dumps({
        "metric": "hub_salt_selection", "hub_rows": args.hub_rows,
        "total_rows": pend.num_rows, "cpus": args.cpus,
        "salt_n": args.salt_n, "unsalted_sec": round(t_unsalted, 3),
        "salted_sec": round(t_salted, 3),
        "speedup": round(t_unsalted / t_salted, 2), "selection_equal": equal,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
