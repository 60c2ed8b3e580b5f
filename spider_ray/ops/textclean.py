"""Text cleaning for training-data pipelines: PII scrubbing and
Gopher-style quality filtering.

The reference engine stops at crawl/extract; a 100-TB webtext corpus needs a
cleaning pass before training.  Both ops are stateful-actor ``map_batches``
stages (patterns compiled once per actor in ``__init__``):

* **PiiScrubber** — masks URLs, then emails, then IPv4 literals (that order:
  a URL may embed an email-shaped userinfo) with ``<URL>/<EMAIL>/<IP>``
  tokens and reports per-doc match counts.  Patterns are RE2-compatible (no
  backreferences/lookaround) so the DuckDB oracle runs the *same* pattern
  strings through nested ``regexp_replace(..., 'g')``.
* **GopherQuality** — integer-only per-doc stats (word count, word chars,
  stopword count) plus a keep verdict from Gopher-style bounds (Rae et al.
  2021: 50..100k words, mean word length 3..10, >=2 stopwords and >=6%
  stopword fraction).  The mean-length and fraction tests are expressed as
  integer cross-multiplications so engine and SQL agree bit-for-bit.
"""

from __future__ import annotations

import re

import pyarrow as pa

URL_PAT = r"https?://[^ \t\n]+"
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
IPV4_PAT = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

TOKEN_PAT = r"\S+"

# Tiny fixed stopword list shared with the SQL oracle (order irrelevant).
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "that", "for", "on")


def plant_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Deterministically weave synthetic PII into each doc's text (keyed by
    doc_id) so the scrub oracle exercises real matches on the PII-free
    fixture corpus.  The exact same expression is inlined in the SQL oracle."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column(text_col).to_pylist()
    woven = [
        f"{t} contact user{i}@example.com or http://ex.com/p?q={i} from 10.0.{i % 256}.1"
        for i, t in zip(ids, texts)
    ]
    return batch.set_column(
        batch.schema.get_field_index(text_col), text_col, pa.array(woven, pa.string())
    )


class PiiScrubber:
    """``(doc_id, n_urls, n_emails, n_ips, clean_len)`` per doc; masking
    order URL -> email -> IPv4, global non-overlapping left-to-right (both
    ``re.sub`` and RE2 ``regexp_replace(...,'g')`` share this semantics)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.url = re.compile(URL_PAT)
        self.email = re.compile(EMAIL_PAT)
        self.ipv4 = re.compile(IPV4_PAT)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_urls, n_emails, n_ips, clean_lens = [], [], [], []
        for t in batch.column(self.text_col).to_pylist():
            t1, k_url = self.url.subn("<URL>", t)
            t2, k_email = self.email.subn("<EMAIL>", t1)
            t3, k_ip = self.ipv4.subn("<IP>", t2)
            n_urls.append(k_url)
            n_emails.append(k_email)
            n_ips.append(k_ip)
            clean_lens.append(len(t3))
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_urls": pa.array(n_urls, pa.int64()),
                "n_emails": pa.array(n_emails, pa.int64()),
                "n_ips": pa.array(n_ips, pa.int64()),
                "clean_len": pa.array(clean_lens, pa.int64()),
            }
        )


class GopherQuality:
    """``(doc_id, n_words, n_word_chars, n_stop, keep)`` — all-integer stats
    + boolean verdict; thresholds documented in the module docstring."""

    MIN_WORDS = 50
    MAX_WORDS = 100_000
    MIN_MEAN_LEN = 3  # 3*n_words <= n_word_chars
    MAX_MEAN_LEN = 10  # n_word_chars <= 10*n_words
    MIN_STOPWORDS = 2
    MIN_STOP_PCT = 6  # 100*n_stop >= 6*n_words

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.token = re.compile(TOKEN_PAT)
        self.stop = frozenset(STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_words, n_chars, n_stop, keep = [], [], [], []
        for t in batch.column(self.text_col).to_pylist():
            words = self.token.findall(t)
            w = len(words)
            c = sum(len(x) for x in words)
            s = sum(1 for x in words if x.lower() in self.stop)
            n_words.append(w)
            n_chars.append(c)
            n_stop.append(s)
            keep.append(
                self.MIN_WORDS <= w <= self.MAX_WORDS
                and self.MIN_MEAN_LEN * w <= c <= self.MAX_MEAN_LEN * w
                and s >= self.MIN_STOPWORDS
                and 100 * s >= self.MIN_STOP_PCT * w
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_words": pa.array(n_words, pa.int64()),
                "n_word_chars": pa.array(n_chars, pa.int64()),
                "n_stop": pa.array(n_stop, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )


# ---------------------------------------------------------------------------
# Per-host boilerplate line removal (nav/footer/template lines shared across
# a host's pages).  Classic webtext-curation pass (CCNet/RefinedWeb drop
# repeated lines; here scoped per host, where template reuse actually lives):
#
#   pass 1  map_batches combiner: per page, DISTINCT lines (Arrow
#           split_pattern/list_flatten/list_parent_indices — no Python loop)
#           -> (host, line, n_pages=1) partials -> ONE groupby(host, line)
#           shuffle of partials.  A line is boilerplate when it appears on
#           >= min_pages pages AND >= pct% of the host's pages.
#   pass 2  strip: broadcast (boiler set ray.put once, actor-pool lookup)
#           while the set is small, or a single shuffle-by-host cogroup of
#           pages + boiler lines when it isn't — auto-selected by a
#           distributed count (see host_boilerplate_removal docstring).
#
# The boiler set itself is derived with zero driver-side dicts: host page
# totals and per-(host,line) counts are co-grouped by host via a tagged
# union + groupby(host).  The driver only ever folds the final filtered
# boiler lines, and only on the broadcast path — never page text, never
# per-host totals.
# ---------------------------------------------------------------------------


def _corpus_page_filter(batch: pa.Table) -> pa.Table:
    """Text-bearing corpus pages only (mirrors the extract_text_parity
    exclusions: robots.txt / sitemap.xml rows, null text)."""
    import pyarrow.compute as pc

    urls = batch.column("url")
    keep = pc.and_(
        pc.is_valid(batch.column("text")),
        pc.invert(
            pc.or_(
                pc.ends_with(urls, "robots.txt"),
                pc.ends_with(urls, "sitemap.xml"),
            )
        ),
    )
    return batch.filter(keep)


def _hosts_of(urls) -> "pa.Array":
    """``split_part(split_part(url, '://', 2), '/', 1)`` in Arrow kernels."""
    import pyarrow.compute as pc

    rest = pc.list_element(pc.split_pattern(urls, pattern="://", max_splits=1), 1)
    return pc.list_element(pc.split_pattern(rest, pattern="/", max_splits=1), 0)


def _line_partials(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: distinct (host, line) per page -> partial counts."""
    import pyarrow.compute as pc

    batch = _corpus_page_filter(batch)
    if len(batch) == 0:
        return pa.table(
            {
                "host": pa.array([], pa.string()),
                "line": pa.array([], pa.string()),
                "n_pages": pa.array([], pa.int64()),
            }
        )
    hosts = _hosts_of(batch.column("url"))
    lines_list = pc.split_pattern(batch.column("text"), pattern="\n")
    flat = pc.list_flatten(lines_list)
    parent = pc.list_parent_indices(lines_list)
    t = pa.table(
        {"pg": parent, "host": pc.take(hosts, parent), "line": flat}
    )
    distinct = t.group_by(["pg", "host", "line"]).aggregate([])
    counts = distinct.group_by(["host", "line"]).aggregate([("pg", "count")])
    return counts.rename_columns(["host", "line", "n_pages"])


class _BoilerplateStrip:
    """Actor-pool pass 2: rebuild each page without its host's boilerplate
    lines.  ``(url, n_lines, n_removed, clean_text)``; ``clean_text`` is
    null when every line was boilerplate (string_agg-over-nothing parity
    with the SQL oracle)."""

    def __init__(self, boiler_ref):
        import ray

        # actor ctor args arrive de-referenced; plain refs when called inline
        self.boiler: dict[str, frozenset[str]] = (
            boiler_ref if isinstance(boiler_ref, dict) else ray.get(boiler_ref)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = _corpus_page_filter(batch)
        urls = batch.column("url").to_pylist()
        hosts = _hosts_of(batch.column("url")).to_pylist() if len(batch) else []
        out_n, out_rm, out_txt = [], [], []
        empty: frozenset[str] = frozenset()
        for host, text in zip(hosts, batch.column("text").to_pylist()):
            bset = self.boiler.get(host, empty)
            lines = text.split("\n")
            kept = [ln for ln in lines if ln not in bset]
            out_n.append(len(lines))
            out_rm.append(len(lines) - len(kept))
            out_txt.append("\n".join(kept) if kept else None)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "n_lines": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "clean_text": pa.array(out_txt, pa.string()),
            }
        )


def host_boilerplate_removal(
    corpus_dir: str,
    min_pages: int = 2,
    pct: int = 10,
    concurrency: int | None = None,
    strip_mode: str = "auto",
    broadcast_max_lines: int = 2_000_000,
):
    """Remove per-host boilerplate lines from a web corpus (see module
    comment).  A line is boilerplate on host H iff it occurs on
    ``>= min_pages`` of H's pages and on ``>= pct%`` of them.

    Scale design: the boilerplate set is computed FULLY DISTRIBUTED — host
    page totals and per-(host,line) page counts are co-grouped by host via
    a tagged union + ``groupby(host)`` (no hash join, no driver-side host
    or vocabulary dict).  The strip pass then picks one of two shapes:

    * ``broadcast`` (default while the boiler set is small): the filtered
      boiler lines are ``ray.put`` once and every strip actor reads the
      shared copy — zero extra shuffle of page text.
    * ``cogroup`` (the 10⁸-host path): pages and boiler lines shuffle ONCE
      by host and each host's pages are stripped in-group — driver never
      holds a line.  Assumes one host's pages fit one task (salt hot hosts
      upstream if not).

    ``strip_mode="auto"`` counts the boiler-line Dataset (a distributed
    scalar) and switches at ``broadcast_max_lines``.
    """
    import ray
    import ray.data
    import pyarrow.compute as pc

    cols = ["url", "text"]
    pages = ray.data.read_parquet(corpus_dir, columns=cols)

    # per-host page totals: distributed groupby, tagged is_total=1
    def host_partials(batch: pa.Table) -> pa.Table:
        batch = _corpus_page_filter(batch)
        hosts = (
            _hosts_of(batch.column("url"))
            if len(batch)
            else pa.array([], pa.string())
        )
        t = pa.table({"host": hosts})
        return (
            t.group_by(["host"])
            .aggregate([([], "count_all")])
            .rename_columns(["host", "n"])
        )

    totals_tagged = (
        pages.map_batches(host_partials, batch_format="pyarrow")
        .groupby("host")
        .sum("n")
        .map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("host"),
                    "line": pa.nulls(b.num_rows, pa.string()),
                    "n": pc.cast(b.column("sum(n)"), pa.int64()),
                    "is_total": pa.nulls(b.num_rows, pa.int8()).fill_null(1),
                }
            ),
            batch_format="pyarrow",
        )
    )

    counts_tagged = (
        pages.map_batches(_line_partials, batch_format="pyarrow")
        .groupby(["host", "line"])
        .sum("n_pages")
        .map_batches(
            lambda b: pa.table(
                {
                    "host": b.column("host"),
                    "line": b.column("line"),
                    "n": pc.cast(b.column("sum(n_pages)"), pa.int64()),
                    "is_total": pa.nulls(b.num_rows, pa.int8()).fill_null(0),
                }
            ),
            batch_format="pyarrow",
        )
    )

    def boiler_of_host(group: pa.Table) -> pa.Table:
        # one host's total row + its (line, n_pages) candidates
        is_tot = group.column("is_total")
        tot = pc.max(group.filter(pc.equal(is_tot, 1)).column("n")).as_py() or 0
        cand = group.filter(pc.equal(is_tot, 0))
        n = cand.column("n")
        keep = pc.and_(
            pc.greater_equal(n, min_pages),
            pc.greater_equal(pc.multiply(n, 100), pa.scalar(tot * pct, pa.int64())),
        )
        return cand.filter(keep).select(["host", "line"])

    boiler_ds = (
        totals_tagged.union(counts_tagged)
        .groupby("host")
        .map_groups(boiler_of_host, batch_format="pyarrow")
        .materialize()
    )

    if strip_mode == "broadcast" or (
        strip_mode == "auto" and boiler_ds.count() <= broadcast_max_lines
    ):
        boiler: dict[str, set[str]] = {}
        for batch in boiler_ds.iter_batches(batch_format="pyarrow"):
            for h, ln in zip(
                batch.column("host").to_pylist(), batch.column("line").to_pylist()
            ):
                boiler.setdefault(h, set()).add(ln)
        boiler_ref = ray.put({h: frozenset(s) for h, s in boiler.items()})

        from ..poolsize import autoscale_pool

        # autoscaling pool with min=1: a fixed-size pool equal to the CPU
        # count would starve the upstream read tasks on a small cluster
        return pages.map_batches(
            _BoilerplateStrip,
            fn_constructor_args=(boiler_ref,),
            batch_format="pyarrow",
            concurrency=concurrency or autoscale_pool(1),
        )

    # cogroup strip: pages + boiler lines shuffle once by host
    def page_tagged(batch: pa.Table) -> pa.Table:
        batch = _corpus_page_filter(batch)
        hosts = (
            _hosts_of(batch.column("url"))
            if len(batch)
            else pa.array([], pa.string())
        )
        return pa.table(
            {
                "host": hosts,
                "url": batch.column("url"),
                "payload": batch.column("text"),
                "is_page": pa.nulls(batch.num_rows, pa.int8()).fill_null(1),
            }
        )

    lines_tagged = boiler_ds.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("host"),
                "url": pa.nulls(b.num_rows, pa.string()),
                "payload": b.column("line"),
                "is_page": pa.nulls(b.num_rows, pa.int8()).fill_null(0),
            }
        ),
        batch_format="pyarrow",
    )

    def strip_group(group: pa.Table) -> pa.Table:
        is_pg = group.column("is_page")
        bset = set(group.filter(pc.equal(is_pg, 0)).column("payload").to_pylist())
        pg = group.filter(pc.equal(is_pg, 1))
        out_n, out_rm, out_txt = [], [], []
        for text in pg.column("payload").to_pylist():
            lines = text.split("\n")
            kept = [ln for ln in lines if ln not in bset]
            out_n.append(len(lines))
            out_rm.append(len(lines) - len(kept))
            out_txt.append("\n".join(kept) if kept else None)
        return pa.table(
            {
                "url": pg.column("url"),
                "n_lines": pa.array(out_n, pa.int64()),
                "n_removed": pa.array(out_rm, pa.int64()),
                "clean_text": pa.array(out_txt, pa.string()),
            }
        )

    return (
        pages.map_batches(page_tagged, batch_format="pyarrow")
        .union(lines_tagged)
        .groupby("host")
        .map_groups(strip_group, batch_format="pyarrow")
    )


def quality_by_source(docs, text_col: str = "text"):
    """``(source, n_docs, n_keep)`` — the curation REPORT every filtered
    corpus ships with: per ingestion source, how many documents pass the
    Gopher gate.  Keep share stays an exact integer pair (consumer divides
    at display time).

    Shape: the :class:`GopherQuality` stats run inside the same actor-pool
    batch pass (its output aligns row-for-row with the batch), the batch
    collapses to per-source partials immediately, and one |sources|-sized
    groupby folds them — text never shuffles.
    """
    import pyarrow.compute as pc

    from ..poolsize import autoscale_pool

    class _SourceGate(GopherQuality):
        def __call__(self, batch: pa.Table) -> pa.Table:
            gate = super().__call__(batch)
            t = pa.table(
                {
                    "source": batch.column("source"),
                    "n_docs": pa.nulls(batch.num_rows, pa.int64()).fill_null(1),
                    "n_keep": pc.cast(gate.column("keep"), pa.int64()),
                }
            )
            return (
                t.group_by(["source"])
                .aggregate([("n_docs", "sum"), ("n_keep", "sum")])
                .rename_columns(["source", "n_docs", "n_keep"])
            )

    partials = docs.map_batches(
        _SourceGate,
        fn_constructor_args=(text_col,),
        batch_format="pyarrow",
        concurrency=autoscale_pool(1),
        num_cpus=0.5,
    )
    rolled = partials.groupby("source").sum(["n_docs", "n_keep"])
    return rolled.map_batches(
        lambda b: pa.table(
            {
                "source": b.column("source"),
                "n_docs": pc.cast(b.column("sum(n_docs)"), pa.int64()),
                "n_keep": pc.cast(b.column("sum(n_keep)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
