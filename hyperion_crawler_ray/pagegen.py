"""Deterministic synthetic Common-Crawl-style page universe (seed=42).

Produces the crawl-domain fixtures of FIXTURES.md §1-3 with NO external
data: a closed URL graph over a Zipf-skewed host universe (a few hub hosts
own most pages — exercises salted-key skew handling), HTML with out-links
(canonical, messy-variant, and relative spellings that all canonicalize to
the same target; plus some dead links), and a golden ``text`` column that
is BY CONSTRUCTION the output of the frozen extractor
(functions/extract.py) on ``html``.

Everything about page ``i`` derives from ``sha1(f"{seed}:{tag}:{i}")`` so
generation is order- and partition-independent: the distributed Ray
generator and any slice generated inline for a unit test agree byte for
byte.
"""

from __future__ import annotations

import hashlib
import struct
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa

from .functions.extract import extract_text
from .schema import PAGES_SCHEMA, ROBOTS_SCHEMA, SEEDS_SCHEMA

SEED = 42
GEN_VERSION = 2  # bump when generator output changes; invalidates caches

_VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango uniform victor "
    "whiskey xray yankee zulu market data crawl index fetch merge shard "
    "batch stream filter robot frontier queue token parser anchor corpus"
).split()

_LANGS = ("en", "en", "en", "ko", "de", "fr", "es")  # en-weighted
_EPOCH = datetime(2024, 1, 1)


def _h(tag: str, *parts) -> int:
    """Deterministic 64-bit hash of (seed, tag, parts)."""
    key = f"{SEED}:{tag}:" + ":".join(str(p) for p in parts)
    return struct.unpack("<Q", hashlib.sha1(key.encode()).digest()[:8])[0]


def _u(tag: str, *parts) -> float:
    """Deterministic uniform [0,1)."""
    return _h(tag, *parts) / 2**64


class PageUniverse:
    """Closed deterministic universe of ``n_pages`` pages.

    Host sizes follow Zipf(s=1.2): host rank r gets weight r^-1.2, so the
    top host owns a large share of URLs (hub-domain skew per SURVEY §7.3).
    """

    def __init__(self, n_pages: int, n_hosts: int | None = None,
                 links_per_page: int = 8):
        self.n_pages = n_pages
        self.n_hosts = n_hosts or max(8, int(n_pages ** 0.5) // 2)
        self.links_per_page = links_per_page
        w = np.arange(1, self.n_hosts + 1, dtype=np.float64) ** -1.2
        self._cdf = np.cumsum(w) / w.sum()
        self._hosts = [f"host{r:04d}.example.com" for r in range(self.n_hosts)]

    # -- per-index deterministic attributes -------------------------------
    def host_index(self, i: int) -> int:
        return int(np.searchsorted(self._cdf, _u("host", i), side="right"))

    def host_of(self, i: int) -> str:
        return self._hosts[self.host_index(i)]

    def url_of(self, i: int) -> str:
        """Canonical URL of page i (canonical by construction)."""
        h = _h("path", i)
        seg1 = _VOCAB[h % len(_VOCAB)]
        seg2 = _VOCAB[(h >> 8) % len(_VOCAB)]
        return f"http://{self.host_of(i)}/{seg1}/{seg2}/p{i}.html"

    def lang_of(self, i: int) -> str:
        return _LANGS[_h("lang", i) % len(_LANGS)]

    def ts_of(self, i: int) -> datetime:
        return _EPOCH + timedelta(seconds=i)

    def link_targets(self, i: int) -> list[int]:
        """Target page ids linked from page i (deterministic)."""
        out = []
        for k in range(self.links_per_page):
            out.append(_h("link", i, k) % self.n_pages)
        return out

    def messy_url(self, j: int, salt: int) -> str:
        """A non-canonical spelling of url_of(j); canonicalizes back."""
        u = self.url_of(j)
        scheme, rest = u.split("://", 1)
        host, path = rest.split("/", 1)
        kind = salt % 6
        if kind == 0:
            return f"HTTP://{host.upper()}/{path}"
        if kind == 1:
            return f"{scheme}://{host}:80/{path}"
        if kind == 2:
            return f"{scheme}://{host}/./{path}"
        if kind == 3:
            segs = path.split("/")
            return f"{scheme}://{host}/{segs[0]}/extra/../" + "/".join(segs[1:])
        if kind == 4:  # percent-encode the leading 'p' of the last segment
            segs = path.split("/")
            segs[-1] = "%70" + segs[-1][1:]
            return f"{scheme}://{host}/" + "/".join(segs)
        return u + "#frag" + str(salt)

    def link_hrefs(self, i: int) -> list[str]:
        """href spellings embedded in page i's HTML (closed + a few dead)."""
        base_host = self.host_of(i)
        hrefs = []
        for k, j in enumerate(self.link_targets(i)):
            r = _u("style", i, k)
            tgt = self.url_of(j)
            if r < 0.15:
                hrefs.append(self.messy_url(j, _h("salt", i, k) % 6))
            elif r < 0.30 and self.host_of(j) == base_host:
                # relative link (same host)
                hrefs.append("/" + tgt.split("://", 1)[1].split("/", 1)[1])
            else:
                hrefs.append(tgt)
        if _u("dead", i) < 0.10:  # dead out-link: fetch will miss
            hrefs.append(f"http://{base_host}/dead/d{_h('deadid', i) % 10**6}.html")
        return hrefs

    def html_of(self, i: int) -> bytes:
        h = _h("body", i)
        title = f"{_VOCAB[h % len(_VOCAB)]} {_VOCAB[(h >> 6) % len(_VOCAB)]} p{i}"
        n_words = 60 + _h("len", i) % 300
        words = [_VOCAB[_h("w", i, k) % len(_VOCAB)] for k in range(n_words)]
        paras = [" ".join(words[k : k + 18]) for k in range(0, n_words, 18)]
        anchors = "".join(
            f'<li><a href="{href}">link {k}</a></li>'
            for k, href in enumerate(self.link_hrefs(i))
        )
        body = "".join(f"<p>{p}</p>" for p in paras)
        doc = (
            "<html><head>"
            f"<title>{title}</title>"
            "<style>body{margin:0}</style>"
            "</head><body>"
            f"<h1>{title}</h1>"
            f"<script>var x={i};</script>"
            f"{body}<ul>{anchors}</ul>"
            "<!-- generator: hyperion_crawler_ray pagegen -->"
            "</body></html>"
        )
        return doc.encode("utf-8")

    # -- table builders ----------------------------------------------------
    def pages_slice(self, lo: int, hi: int) -> pa.Table:
        """Pages rows for ids [lo, hi)."""
        return self.pages_for_ids(range(lo, hi))

    def pages_for_ids(self, ids) -> pa.Table:
        """Pages rows for an arbitrary id iterable — used by the
        distributed generator per block AND by tests inline; output is a
        pure function of each id, so identical either way."""
        urls, tss, htmls, texts, langs = [], [], [], [], []
        for i in ids:
            i = int(i)
            html = self.html_of(i)
            urls.append(self.url_of(i))
            tss.append(self.ts_of(i))
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(self.lang_of(i))
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
            },
            schema=PAGES_SCHEMA,
        )

    def seeds_table(self, n_seeds: int = 16) -> pa.Table:
        """Fixed-order seed list; every 4th seed is a messy spelling so the
        canonicalize stage is exercised from round 0."""
        urls, prios = [], []
        for s in range(n_seeds):
            i = _h("seedpick", s) % self.n_pages
            u = self.messy_url(i, s) if s % 4 == 3 else self.url_of(i)
            urls.append(u)
            prios.append(round(1.0 - s * (0.5 / max(1, n_seeds)), 6))
        return pa.table(
            {"url": pa.array(urls, pa.string()),
             "priority": pa.array(prios, pa.float64())},
            schema=SEEDS_SCHEMA,
        )

    def robots_table(self) -> pa.Table:
        """Per-host gating rules: ~4% disallow-all, ~16% disallow one
        path prefix, rest open (FIXTURES.md §3)."""
        hosts, prefixes, delays = [], [], []
        for r, host in enumerate(self._hosts):
            u = _u("robots", r)
            if u < 0.04:
                dis = ["/"]
            elif u < 0.20:
                dis = ["/" + _VOCAB[_h("robopfx", r) % len(_VOCAB)]]
            else:
                dis = []
            hosts.append(host)
            prefixes.append(dis)
            delays.append(100 + _h("delay", r) % 900)
        return pa.table(
            {"host": pa.array(hosts, pa.string()),
             "disallow_prefixes": pa.array(prefixes, pa.list_(pa.string())),
             "crawl_delay_ms": pa.array(delays, pa.int64())},
            schema=ROBOTS_SCHEMA,
        )


def write_universe(out_dir: str, n_pages: int, *, use_ray: bool = True,
                   rows_per_block: int = 4096) -> "PageUniverse":
    """Materialize pages/seeds/robots parquet under ``out_dir``.

    Pages are generated distributed (``ray.data.range`` -> ``map_batches``,
    one deterministic slice per block) so bench-scale generation is
    parallel; seeds/robots are tiny and written driver-side. Idempotent:
    skips generation if a ``_SUCCESS`` marker exists for the same size.
    """
    import json
    import os

    uni = PageUniverse(n_pages)
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        try:
            meta = json.load(open(marker))
            if meta["n_pages"] == n_pages and meta.get("gen") == GEN_VERSION:
                return uni
        except Exception:
            pass
    # stale/partial output: clear before regenerating (write_parquet
    # would otherwise append alongside old files)
    import shutil
    shutil.rmtree(os.path.join(out_dir, "pages"), ignore_errors=True)
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    import pyarrow.parquet as pq

    if use_ray and n_pages > 20000:
        import ray.data as rd

        def gen(batch: pa.Table) -> pa.Table:
            return uni.pages_for_ids(batch.column("id").to_numpy())

        (
            rd.range(n_pages, override_num_blocks=max(8, n_pages // rows_per_block))
            .map_batches(gen, batch_format="pyarrow", batch_size=rows_per_block)
            .write_parquet(os.path.join(out_dir, "pages"))
        )
    else:
        pq.write_table(uni.pages_slice(0, n_pages),
                       os.path.join(out_dir, "pages", "part-0.parquet"))
    pq.write_table(uni.seeds_table(), os.path.join(out_dir, "seeds.parquet"))
    pq.write_table(uni.robots_table(), os.path.join(out_dir, "robots.parquet"))
    with open(marker, "w") as f:
        json.dump({"n_pages": n_pages, "seed": SEED, "gen": GEN_VERSION}, f)
    return uni
