"""Deterministic HTML -> text extraction and out-link extraction.

This is the frozen extractor of record for the per-url **byte-identical
text** invariant (BASELINE.json input_hint): the pages table's golden
``text`` column is produced by ``extract_text`` at generation time, and the
pipeline + pytest re-run the same function over ``html`` and assert byte
equality. Bump ``EXTRACTOR_VERSION`` on ANY behavior change and regenerate
fixtures.

Reference analog: the document-parser slot ``parse_xbrl_data``
(reference api/src/etl/base/transformer.py:187-190) — a per-record parser
UDF — here implemented trafilatura-style (boilerplate strip, block-level
line breaks, whitespace collapse) with only stdlib so it is reproducible
anywhere.
"""

from __future__ import annotations

import html as _htmllib
import re

EXTRACTOR_VERSION = "1.0.0"

# Non-content subtrees removed wholesale.
_DROP_RE = re.compile(
    r"<(script|style|noscript|template|svg)\b[^>]*>.*?</\1\s*>|<!--.*?-->",
    re.IGNORECASE | re.DOTALL,
)
# Tags that imply a line break in the extracted text.
_BLOCK_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|"
    r"blockquote|pre|title|nav|aside|hr|dd|dt|dl|form)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_HSPACE_RE = re.compile(r"[ \t\r\f\v ]+")

_HREF_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)


def extract_text(html: bytes | str) -> str:
    """Extract visible text from HTML, byte-deterministically.

    Pipeline: utf-8 decode (replace) -> drop script/style/comment subtrees
    -> block tags become newlines -> strip remaining tags -> entity
    unescape -> collapse horizontal whitespace -> strip each line -> drop
    empty lines -> join with "\\n".
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _DROP_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _htmllib.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _HSPACE_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_links(html: bytes | str, base_url: str | None = None) -> list[str]:
    """Extract href targets in document order, first-occurrence dedup.

    Returns raw (un-canonicalized) URLs; resolution against ``base_url``
    and RFC 3986 normalization happen in the canonicalize stage so the
    seen-filter sees exactly one spelling per target.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        s = bytes(html).decode("utf-8", errors="replace")
    else:
        s = html
    s = _DROP_RE.sub(" ", s)
    seen: set[str] = set()
    out: list[str] = []
    for m in _HREF_RE.finditer(s):
        href = _htmllib.unescape((m.group(1) or m.group(2) or m.group(3) or "").strip())
        if not href or href.startswith("#"):
            continue
        if href not in seen:
            seen.add(href)
            out.append(href)
    return out
