"""Robots.txt gating as a broadcast semi-/anti-join.

Reference analog: the FK-existence semi-join validation gate (J-2,
api/src/etl/krx/loader.py:187-193) — rows failing the gate are routed to a
reject count, not errored (dead-letter semantics,
api/src/config/etl_config.yaml:143).

The robots table is tiny relative to the frontier (one row per host), so
per SURVEY §2.4 it is broadcast once via ``ray.put`` and applied inside
``map_batches`` — no shuffle. Scale note: at 10^8+ hosts the broadcast
dict would be sharded by ``hash(host)`` into the same actor topology as
the seen filter (state/seen.py); only hosts WITH disallow rules need
entries, which keeps the broadcast viable far longer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class RobotsIndex:
    """Compiled per-host disallow rules + crawl delays."""

    def __init__(self, robots_table: pa.Table):
        self.disallow: dict[str, tuple[str, ...]] = {}
        self.delay_ms: dict[str, int] = {}
        hosts = robots_table.column("host").to_pylist()
        pfx = robots_table.column("disallow_prefixes").to_pylist()
        delays = robots_table.column("crawl_delay_ms").to_pylist()
        for h, p, d in zip(hosts, pfx, delays):
            if p:
                self.disallow[h] = tuple(p)
            self.delay_ms[h] = int(d)

    def allowed(self, host: str, url: str) -> bool:
        rules = self.disallow.get(host)
        if not rules:
            return True
        path = "/" + url.split("://", 1)[1].split("/", 1)[1] if "/" in url.split("://", 1)[1] else "/"
        return not any(path.startswith(r) for r in rules)

    def allowed_mask(self, hosts: np.ndarray, urls: np.ndarray) -> np.ndarray:
        """Vector gate: True = fetchable. Hosts with no rules short-circuit
        (the common case) without touching the URL string."""
        n = len(hosts)
        out = np.ones(n, dtype=bool)
        dis = self.disallow
        for i in range(n):
            rules = dis.get(hosts[i])
            if rules:
                u = urls[i]
                rest = u.split("://", 1)[1]
                path = "/" + rest.split("/", 1)[1] if "/" in rest else "/"
                if any(path.startswith(r) for r in rules):
                    out[i] = False
        return out
