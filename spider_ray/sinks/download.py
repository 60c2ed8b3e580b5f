"""DOWNLOAD sink — the reference CLI's third subcommand
(`spider_cli/src/options/sub_command.rs:24-27`): store each crawled page's
raw HTML under a destination directory keyed by its URL path.

Path construction re-expresses ``build_local_path``
(`spider_cli/src/build_folders.rs:84-120`) and its helpers: percent-decode +
NFC-normalize each segment, replace forbidden/control characters with ``_``,
trim trailing spaces/dots, suffix Windows reserved device names with
``_file``, cap components at 120 chars (overlong components keep a prefix
plus ``~`` + 8-hex stable hash — we use md5's first 8 hex digits where the
reference uses Rust's unseeded ``DefaultHasher``; the *shape* is the
contract, the hash bits are process-local in the reference anyway), and
resolve the leaf to ``index.html`` / ``{leaf}.html`` / ``leaf`` by
trailing-slash + extension (`build_folders.rs:72-82`).

The write itself is a distributed Ray Data consumer: the corpus is the
content store, so download = filter the corpus to the visited set
(broadcast once via ``ray.put``) and let each ``map_batches`` task write its
own batch's files — no driver materialization of html bytes.
"""

from __future__ import annotations

import hashlib
import os
import unicodedata
from urllib.parse import unquote, urlsplit

import pyarrow as pa

_RESERVED = frozenset(
    ["CON", "PRN", "AUX", "NUL"]
    + [f"COM{i}" for i in range(1, 10)]
    + [f"LPT{i}" for i in range(1, 10)]
)
_FORBIDDEN = frozenset('\0/\\<>:"|?*')
_MAX_COMPONENT = 120


def _cap_component(s: str, max_len: int = _MAX_COMPONENT) -> str:
    if len(s) <= max_len:
        return s
    h = hashlib.md5(s.encode("utf-8")).hexdigest()[:8]
    keep = max(0, max_len - 9)
    return s[:keep] + "~" + h


def _sanitize_component(raw: str) -> str | None:
    """`build_folders.rs:33-70` — None means "skip this segment"."""
    if raw in ("", ".", ".."):
        return None
    decoded = unquote(raw, errors="replace")
    normalized = unicodedata.normalize("NFC", decoded)
    out = "".join(
        "_" if (c in _FORBIDDEN or unicodedata.category(c) in ("Cc", "Cf")) else c
        for c in normalized
    )
    out = out.strip(" .")
    if not out:
        return None
    stem = out.split(".", 1)[0].upper()
    if stem in _RESERVED:
        out = f"{out}_file"
    return _cap_component(out)


def _choose_filename(leaf: str, has_trailing_slash: bool) -> str:
    if has_trailing_slash or not leaf or "." not in leaf:
        return "index.html" if not leaf else f"{leaf}.html"
    return leaf


def build_local_path(base: str, url_path: str) -> str:
    """Pure port of `build_folders.rs:84-120`."""
    has_trailing_slash = url_path.endswith("/")
    clean = [
        c
        for seg in url_path.split("/")
        if seg
        for c in (_sanitize_component(seg),)
        if c is not None
    ]
    if not clean:
        return os.path.join(base, "index.html")
    leaf = clean.pop()
    return os.path.join(base, *clean, _choose_filename(leaf, has_trailing_slash))


class _BatchWriter:
    """Writes one batch's html bodies under dest; returns (url, path) rows."""

    def __init__(self, dest: str, url_set_ref):
        import ray

        self.dest = dest
        self.urls = ray.get(url_set_ref) if url_set_ref is not None else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        import base64

        urls_out, paths_out, nbytes_out, md5_out = [], [], [], []
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        for url, html in zip(urls, htmls):
            if html is None or (self.urls is not None and url.lower() not in self.urls):
                continue
            path = urlsplit(url).path or "/"
            final = build_local_path(self.dest, path)
            os.makedirs(os.path.dirname(final), exist_ok=True)
            with open(final, "wb") as f:
                f.write(html)
            urls_out.append(url)
            paths_out.append(final)
            nbytes_out.append(len(html))
            # md5(base64(bytes)) so the digest is SQL-expressible (DuckDB
            # md5 takes VARCHAR) — written-manifest audit column
            md5_out.append(hashlib.md5(base64.b64encode(html)).hexdigest())
        return pa.table(
            {
                "url": pa.array(urls_out, pa.string()),
                "path": pa.array(paths_out, pa.string()),
                "n_bytes": pa.array(nbytes_out, pa.int64()),
                "payload_md5": pa.array(md5_out, pa.string()),
            }
        )


def download_pages(corpus_dir: str, dest: str, visited: set[str] | None = None,
                   concurrency: int | None = None,
                   url_prefix: str | None = None) -> pa.Table:
    """Write raw html files for ``visited`` URLs (or the whole corpus when
    None); returns the ``(url, path, n_bytes, payload_md5)`` manifest
    table.  ``url_prefix`` filters at the Parquet scan (the one-site
    download the reference CLI performs — paths are host-less, so a
    whole-corpus download of a multi-host corpus would collide)."""
    import ray
    import ray.data

    os.makedirs(dest, exist_ok=True)
    url_set_ref = (
        ray.put(frozenset(u.lower() for u in visited)) if visited is not None else None
    )
    scan_filter = None
    if url_prefix is not None:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        scan_filter = pc.starts_with(pads.field("url"), pattern=url_prefix)
    ds = ray.data.read_parquet(
        corpus_dir, columns=["url", "html"], filter=scan_filter
    )
    # 0.5 CPU per writer: the stage is IO-bound, and a full-CPU pool could
    # starve the upstream read tasks on small sessions
    out = ds.map_batches(
        _BatchWriter,
        fn_constructor_args=(dest, url_set_ref),
        batch_format="pyarrow",
        concurrency=concurrency or 4,
        num_cpus=0.5,
        batch_size=64,
    )
    refs = out.materialize().to_arrow_refs()  # live-pipeline refs path is slow
    tables = [t for t in map(ray.get, refs) if t.num_rows]
    if not tables:
        return pa.table({"url": pa.array([], pa.string()), "path": pa.array([], pa.string())})
    return pa.concat_tables(tables)
