"""Charset detection + decoding — the corpus-engine analogue of the
reference's encoding path (``auto_encoder``/``encoding`` feature,
``page.rs:9384-9394``; meta-charset adjustment during the streaming parse,
``adjust_charset_on_meta_tag``, ``page.rs:7170``).

Detection order (mirrors the rewriter's behavior for a body-only corpus —
there are no Content-Type headers in the table):
1. BOM (UTF-8 / UTF-16 LE/BE)
2. ``<meta charset=X>`` or ``<meta http-equiv="content-type" content="...charset=X">``
   within the first 1024 bytes (sniffed via a latin-1 view, per the HTML spec
   prescan)
3. UTF-8 with replacement (the fixtures' default)
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET_RE = re.compile(
    r"""<meta[^>]+?(?:charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)|charset=([a-zA-Z0-9_\-]+))""",
    re.I,
)

_ALIASES = {
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "x-sjis": "shift_jis",
    "utf8": "utf-8",
    "iso-8859-1": "latin-1",
}


def detect_charset(html: bytes, sniff_len: int = 1024) -> str:
    if html.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if html.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if html.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    head = html[:sniff_len].decode("latin-1", "replace")
    m = _META_CHARSET_RE.search(head)
    if m:
        label = (m.group(1) or m.group(2) or "").lower()
        label = _ALIASES.get(label, label)
        try:
            codecs.lookup(label)
            return label
        except LookupError:
            pass
    return "utf-8"


def decode_html(html: bytes | None) -> str:
    """Decode page bytes using the detected charset; replacement on errors
    (never raises — parity with the reference's lossy streaming decode)."""
    if not html:
        return ""
    charset = detect_charset(html)
    try:
        return html.decode(charset, "replace")
    except (LookupError, ValueError):
        return html.decode("utf-8", "replace")
