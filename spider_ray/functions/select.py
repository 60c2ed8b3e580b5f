"""CSS/XPath-lite data extraction helper — the analogue of
``spider_utils::css_query_select_map[_streamed]``
(``spider_utils/src/lib.rs:11-120``): given a name → selector map, extract
matching text from each page into a ``map<string, list<string>>``-shaped
struct column.

Selector subset (covers the reference helper's common usage): ``tag``,
``.class``, ``#id``, ``tag.class``, ``tag#id``, ``tag[attr]``,
``tag[attr=value]``.  Matching returns the element's immediate text content
(entities decoded, whitespace collapsed).
"""

from __future__ import annotations

import html as _htmllib
import re

from ..htmlparse import END, RAWTEXT, START, TEXT, _RAW_TEXT, parse_attrs, tokenize

_SEL_RE = re.compile(
    r"^(?P<tag>[a-zA-Z][a-zA-Z0-9-]*)?"
    r"(?:\.(?P<cls>[-\w]+))?"
    r"(?:#(?P<id>[-\w]+))?"
    r"(?:\[(?P<attr>[-\w]+)(?:=(?P<val>\"[^\"]*\"|'[^']*'|[^\]]*))?\])?$"
)

_WS = re.compile(r"\s+")


class Selector:
    def __init__(self, selector: str):
        m = _SEL_RE.match(selector.strip())
        if m is None:
            raise ValueError(f"unsupported selector: {selector!r}")
        self.tag = (m.group("tag") or "").lower() or None
        self.cls = m.group("cls")
        self.id = m.group("id")
        self.attr = m.group("attr")
        val = m.group("val")
        if val is not None and len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
        self.val = val

    def matches(self, tag: str, attrs: list[tuple[str, str | None]]) -> bool:
        if self.tag is not None and tag != self.tag:
            return False
        if self.cls is not None:
            classes = next((v for k, v in attrs if k == "class"), None)
            if classes is None or self.cls not in classes.split():
                return False
        if self.id is not None:
            if next((v for k, v in attrs if k == "id"), None) != self.id:
                return False
        if self.attr is not None:
            found = next((v for k, v in attrs if k == self.attr), "\0missing")
            if found == "\0missing":
                return False
            if self.val is not None and found != self.val:
                return False
        return True


def css_query_select(html: str, selectors: dict[str, str]) -> dict[str, list[str]]:
    """Extract text of matching elements per named selector."""
    compiled = {name: Selector(s) for name, s in selectors.items()}
    out: dict[str, list[str]] = {name: [] for name in compiled}
    # stack of (depth, names capturing) — capture text until matching close
    open_caps: list[tuple[str, list[str], list[str]]] = []  # (tag, names, buf)
    for kind, tag, attrs_str, raw in tokenize(html):
        if kind == START:
            attrs = parse_attrs(attrs_str or "")
            names = [n for n, sel in compiled.items() if sel.matches(tag, attrs)]
            if names:
                if tag in _RAW_TEXT:
                    open_caps.append((tag, names, []))
                else:
                    open_caps.append((tag, names, []))
        elif kind == TEXT:
            for _, _, buf in open_caps:
                buf.append(tag)
        elif kind == RAWTEXT:
            for _, _, buf in open_caps:
                buf.append(raw or "")
        elif kind == END:
            for i in range(len(open_caps) - 1, -1, -1):
                if open_caps[i][0] == tag:
                    _, names, buf = open_caps.pop(i)
                    text = _WS.sub(" ", _htmllib.unescape("".join(buf))).strip()
                    for n in names:
                        out[n].append(text)
                    break
    return out


class CssSelectStage:
    """``map_batches`` stage: html column → one list<string> column per
    named selector (actor-pool friendly: selectors compiled once)."""

    def __init__(self, selectors: dict[str, str], html_column: str = "html",
                 url_column: str = "url"):
        self.selectors = selectors
        self.html_column = html_column
        self.url_column = url_column

    def __call__(self, batch):
        import pyarrow as pa

        htmls = batch.column(self.html_column).to_pylist()
        results = [
            css_query_select(
                h.decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or ""),
                self.selectors,
            )
            for h in htmls
        ]
        cols = {"url": batch.column(self.url_column)}
        for name in self.selectors:
            cols[name] = pa.array([r[name] for r in results], pa.list_(pa.string()))
        return pa.table(cols)
