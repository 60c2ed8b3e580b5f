"""JS-dependence sniffing — the pure classifier behind ``crawl_smart``
(``spider/src/page.rs:1840-1877``): DOM-manipulation patterns and framework
hydration ids detected in the body.  The Chrome re-fetch is out of scope (no
live rendering against a static corpus); the classifier ships as a
diagnostic ``needs_js`` column (SURVEY.md §3.4).
"""

from __future__ import annotations

# page.rs:1840-1867 — Aho-Corasick DOM patterns (substring membership)
DOM_PATTERNS = (
    ".innerHTML",
    ".outerHTML",
    "document.write(",
    "document.createElement(",
    "appendChild(",
    "history.pushState",
    "history.replaceState",
    "location.replace(",
    "location.assign(",
    "fetch(",
    "XMLHttpRequest",
)

# page.rs:1868-1877 — hydration container ids of JS frameworks
HYDRATION_IDS = (
    'id="__next"',
    'id="___gatsby"',
    'id="__nuxt"',
    'id="app"',
    'id="root"',
    "data-reactroot",
    "ng-version",
)


def needs_js(html: str | bytes) -> bool:
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", "replace")
    return any(p in html for p in DOM_PATTERNS) or any(p in html for p in HYDRATION_IDS)


class NeedsJsStage:
    """``map_batches`` stage → (url, needs_js:bool)."""

    def __init__(self, html_column: str = "html", url_column: str = "url"):
        self.html_column = html_column
        self.url_column = url_column

    def __call__(self, batch):
        import pyarrow as pa

        flags = [needs_js(h or b"") for h in batch.column(self.html_column).to_pylist()]
        return pa.table(
            {
                "url": batch.column(self.url_column),
                "needs_js": pa.array(flags, pa.bool_()),
            }
        )
