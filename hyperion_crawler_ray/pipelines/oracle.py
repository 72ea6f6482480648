"""Single-threaded oracle twin of the frontier crawl (FIXTURES.md §7).

Runs the EXACT same semantics as pipelines/frontier.py — same frozen
canonicalizer/extractor, same CuckooFilter class with the same per-shard
sorted insertion order, same dedup winner rule, same robots gate, same
politeness budgets, same (-priority, url_hash) crawl order — but as a
plain Python loop over in-memory tables. Used by tests to assert that the
distributed engine's crawl order, URL-seen set, and crawled page set are
reproduced at any parallelism, including after kill + resume.

Deliberately shares only the *leaf* functions with the engine (urlnorm,
extract, cuckoo, budget); the loop itself is written independently so a
logic bug in the distributed composition cannot self-confirm.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_links, extract_text
from ..functions.urlnorm import canonicalize_url, sha1_bytes
from ..state.cuckoo import CuckooFilter
from ..state.robots import RobotsIndex
from ..state.seen import shard_of
from .frontier import CrawlConfig


def oracle_crawl(pages_path, seeds: pa.Table, robots: pa.Table,
                 cfg: CrawlConfig) -> dict:
    """Returns {order: [(round, seq, url)...], seen_hashes: set[bytes],
    pages: {url: text}, fetched: int}."""
    import glob
    import os

    if os.path.isdir(pages_path):
        files = sorted(glob.glob(os.path.join(pages_path, "**", "*.parquet"),
                                 recursive=True))
        corpus_tbl = pa.concat_tables([pq.read_table(f) for f in files],
                                      promote_options="default")
    else:
        corpus_tbl = pq.read_table(pages_path)
    corpus: dict[bytes, tuple[str, bytes, str]] = {}
    for row in corpus_tbl.select(["url", "html", "lang"]).to_pylist():
        c = canonicalize_url(row["url"])
        if c is not None:
            corpus[sha1_bytes(c)] = (c, row["html"], row["lang"])

    robots_idx = RobotsIndex(robots)
    filters = [CuckooFilter(cfg.seen_capacity_per_shard)
               for _ in range(cfg.n_shards)]
    admitted: set[bytes] = set()

    def ingest(cands):
        """cands: list of (raw_url, base, priority, depth) -> new pending
        rows [(url, hash, host, priority, depth)], marking seen."""
        best: dict[bytes, tuple] = {}
        for raw, base, prio, depth in cands:
            c = canonicalize_url(raw, base)
            if c is None:
                continue
            h = sha1_bytes(c)
            cur = best.get(h)
            if cur is None or (-prio, depth) < (-cur[3], cur[4]):
                host = c.split("://", 1)[1].split("/", 1)[0]
                best[h] = (c, h, host, prio, depth)
        gated = [v for v in best.values()
                 if robots_idx.allowed(v[2], v[0])]
        by_shard: dict[int, list] = defaultdict(list)
        for v in gated:
            by_shard[shard_of(v[1], cfg.n_shards)].append(v)
        out = []
        for s in sorted(by_shard):
            rows = sorted(by_shard[s], key=lambda v: v[1].hex())
            cf = filters[s]
            mask = cf.contains_many([v[1] for v in rows])
            for k, v in enumerate(rows):
                if not mask[k]:
                    cf.insert(v[1])
                    admitted.add(v[1])
                    out.append(v)
        return out

    pending = ingest([(u, None, p, 0) for u, p in
                      zip(seeds.column("url").to_pylist(),
                          seeds.column("priority").to_pylist())])
    order: list[tuple[int, int, str]] = []
    pages: dict[str, str] = {}
    fetched_total = 0

    for r in range(cfg.max_rounds):
        if not pending:
            break
        by_host: dict[str, list] = defaultdict(list)
        for v in pending:
            by_host[v[2]].append(v)
        selected, deferred = [], []
        for host, rows in by_host.items():
            b = cfg.host_budget(robots_idx.delay_ms.get(host, 1000))
            rows.sort(key=lambda v: (-v[3], v[1].hex()))
            selected.extend(rows[:b])
            deferred.extend(rows[b:])
        selected.sort(key=lambda v: (-v[3], v[1].hex()))
        cands = []
        for seq, v in enumerate(selected):
            order.append((r, seq, v[0]))
            hit = corpus.get(v[1])
            if hit is None:
                continue  # dead link
            fetched_total += 1
            url, html, _lang = hit
            pages[url] = extract_text(html)
            for link in extract_links(html, url):
                cands.append((link, url, v[3] * cfg.link_priority_decay,
                              v[4] + 1))
        pending = deferred + ingest(cands)

    return {"order": order, "pages": pages, "fetched": fetched_total,
            "filters": filters, "admitted": admitted,
            "pending_left": pending}
