"""RFC 3986 URL canonicalization + SHA-1 url hashing.

Reference analog: the identifier-normalization family
(``normalize_company_identifier`` upper/zfill,
reference api/src/etl/base/transformer.py:192-201) generalized to URLs per
the north_rule: scheme/host lowercase, default-port strip, dot-segment
removal, percent-encoding normalization, fragment drop.

Query-parameter policy (documented, frozen): parameter ORDER IS PRESERVED
(no reordering), each key/value is percent-normalized, empty query (``?``)
is dropped. Canonicalization is idempotent: canon(canon(u)) == canon(u).

The batch entry point ``canonicalize_batch`` takes/returns numpy object
arrays so it can sit inside ``map_batches(batch_format="pyarrow")`` with a
single Python loop over the (unavoidable — stringly-structured) URLs, with
a compiled fast-path regex that skips full parsing for already-canonical
URLs (the common case mid-crawl).
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin

import numpy as np

URLNORM_VERSION = "1.0.0"

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Unreserved characters per RFC 3986 §2.3 — percent-escapes of these are
# decoded during normalization.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_UNRESERVED_SET = frozenset(_UNRESERVED)

_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")

# Fast path: lowercase scheme+host (no trailing dot), no port, no
# %-escapes, no dot segments, no fragment, non-empty path starting with
# '/'. Matches the vast majority of URLs after the first round of a
# crawl. Character classes are exactly (unreserved ∪ slow-path `keep`)
# minus '%': every char the slow path would emit UNCHANGED — '.' is
# unreserved and included (round 4: it was missing, so every url with a
# '.html' path took the full per-character parse; measured 0% fast-path
# rate and ~15 µs/url on the bench corpus); dot SEGMENTS are excluded
# separately by _DOTSEG_RE.
_FAST_RE = re.compile(
    r"^(https?)://(?P<host>[a-z0-9]([a-z0-9.-]*[a-z0-9])?)"
    r"(?P<path>/[A-Za-z0-9/._~!$&'()*+,;=:@-]*)"
    r"(\?[A-Za-z0-9/._~!$&'()*+,;=:@?-]*[A-Za-z0-9/._~!$&'()*+,;=:@-])?$"
)
_DOTSEG_RE = re.compile(r"(^|/)\.\.?(/|$)")


def _pct_norm(component: str, keep: str) -> str:
    """Normalize percent-encoding in one URL component.

    - decode %XX escapes of unreserved characters
    - uppercase the hex digits of remaining escapes
    - percent-encode stray characters outside ``keep`` + unreserved
    """
    out = []
    i, n = 0, len(component)
    while i < n:
        c = component[i]
        if c == "%" and i + 2 < n + 1 and _PCT_RE.match(component, i):
            hexpair = component[i + 1 : i + 3]
            val = chr(int(hexpair, 16))
            if val in _UNRESERVED_SET:
                out.append(val)
            else:
                out.append("%" + hexpair.upper())
            i += 3
        elif c in _UNRESERVED_SET or c in keep:
            out.append(c)
            i += 1
        else:
            out.append("".join("%%%02X" % b for b in c.encode("utf-8")))
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    # Work on '/'-split segments; preserve leading slash semantics.
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if len(output) > 1:
                output.pop()
        else:
            output.append(seg)
    if path.startswith("/") and (not output or output[0] != ""):
        output.insert(0, "")
    # Trailing '/.' or '/..' leaves a trailing slash.
    if path.endswith(("/.", "/..")) and output and output[-1] != "":
        output.append("")
    return "/".join(output)


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Canonicalize one URL; return None for non-fetchable/invalid URLs.

    Steps: resolve against ``base`` (for relative links), require
    http/https, lowercase scheme+host, strip trailing host dot and default
    port, percent-normalize path & query, remove dot segments, ensure
    non-empty path, drop the fragment. Preserves query-parameter order.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base is not None and "://" not in url.split("?", 1)[0].split("#", 1)[0]:
        if url.startswith(("javascript:", "mailto:", "data:", "tel:")):
            return None
        url = urljoin(base, url)

    m = _FAST_RE.match(url)
    if m is not None:
        p = m.group("path")
        if "//" not in p[1:] and not _DOTSEG_RE.search(p):
            return url

    # Full parse. Manual split keeps us independent of urlsplit quirks.
    frag_split = url.split("#", 1)[0]
    scheme_split = frag_split.split("://", 1)
    if len(scheme_split) != 2:
        return None
    scheme = scheme_split[0].lower()
    if scheme not in ("http", "https"):
        return None
    rest = scheme_split[1]
    if "/" in rest:
        netloc, path_q = rest.split("/", 1)
        path_q = "/" + path_q
    elif "?" in rest:
        netloc, q = rest.split("?", 1)
        path_q = "/?" + q
    else:
        netloc, path_q = rest, "/"
    if "?" in path_q:
        path, query = path_q.split("?", 1)
    else:
        path, query = path_q, None

    # Host: lowercase, strip userinfo (rejected: crawl targets only),
    # trailing dot, default port.
    if "@" in netloc:
        return None
    host, port = (netloc.split(":", 1) + [None])[:2] if ":" in netloc else (netloc, None)
    host = host.lower().rstrip(".")
    if not host or not re.match(r"^[a-z0-9]([a-z0-9.-]*[a-z0-9])?$", host):
        return None
    if port is not None:
        if not port.isdigit():
            return None
        port = port.lstrip("0") or "0"
        if port == _DEFAULT_PORTS[scheme]:
            port = None
    netloc = host if port is None else f"{host}:{port}"

    path = _pct_norm(path, keep="/!$&'()*+,;=:@")
    path = _remove_dot_segments(path)
    if not path.startswith("/"):
        path = "/" + path

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + _pct_norm(query, keep="/?!$&'()*+,;=:@")
    return out


def url_host(url: str) -> str:
    """Host (incl. non-default port) of an already-canonical URL."""
    return url.split("://", 1)[1].split("/", 1)[0]


def sha1_bytes(url: str) -> bytes:
    """20-byte SHA-1 digest of the canonical URL (the ``url_hash`` key)."""
    return hashlib.sha1(url.encode("utf-8")).digest()


def canonicalize_batch(urls: np.ndarray, bases: np.ndarray | None = None):
    """Vectorized-entry canonicalization for ``map_batches`` stages.

    Returns ``(canon: object ndarray (None for invalid), host: object
    ndarray, url_hash: object ndarray of bytes)``.
    """
    n = len(urls)
    canon = np.empty(n, dtype=object)
    hosts = np.empty(n, dtype=object)
    hashes = np.empty(n, dtype=object)
    canon_f = canonicalize_url
    sha1 = hashlib.sha1
    for i in range(n):
        c = canon_f(urls[i], None if bases is None else bases[i])
        canon[i] = c
        if c is None:
            hosts[i] = None
            hashes[i] = None
        else:
            hosts[i] = c.split("://", 1)[1].split("/", 1)[0]
            hashes[i] = sha1(c.encode("utf-8")).digest()
    return canon, hosts, hashes
