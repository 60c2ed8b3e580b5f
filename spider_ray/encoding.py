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
3. content-based sniff (:func:`content_sniff`) — the ``auto_encoder``
   analogue for unlabeled bodies: strict-UTF-8 validation first, then a
   pinned deterministic legacy heuristic (Shift_JIS structural check,
   high-byte run statistics for Windows-1251 vs Windows-1252)
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


_SJIS_LEAD_RE = re.compile(rb"[\x81-\x9f]")
_HIGH_RUN_RE = re.compile(rb"[\x80-\xff]+")


def content_sniff(html: bytes) -> str:
    """Content-based charset detection for bodies with NO BOM and NO meta
    tag — the ``auto_encoder`` analogue (``page.rs:9384-9394``; the
    reference delegates to encoding_rs/chardetng).  Pinned deterministic
    heuristic, part of the op spec:

    1. strict UTF-8 validation → ``utf-8``;
    2. a strict Shift_JIS decode PLUS at least one 0x81-0x9F lead byte
       (real Japanese text always has kana/common-kanji leads there;
       Windows-1251 Cyrillic text almost never does) → ``shift_jis``;
    3. high-byte runs averaging >= 3 consecutive bytes →
       ``windows-1251`` (Cyrillic words are entirely high bytes, while
       western accents are isolated among ASCII);
    4. else ``windows-1252`` (the western superset fallback).

    A deterministic approximation of a chardetng-class detector — real
    deployments can plug a full detector behind the same hook.
    """
    try:
        html.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    if _SJIS_LEAD_RE.search(html):
        try:
            html.decode("shift_jis", "strict")
            return "shift_jis"
        except UnicodeDecodeError:
            pass
    runs = _HIGH_RUN_RE.findall(html)
    if runs and sum(len(r) for r in runs) >= 3 * len(runs):
        return "windows-1251"
    return "windows-1252"


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
    return content_sniff(html)


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
