"""Deterministic synthetic web corpus (FIXTURES.md).

Generates the ``web_pages`` Parquet table matching BASELINE.json's
``input_hint`` schema: ``(url, warc_ts, html, text, lang)``.  The golden
``text`` column is CONSTRUCTED first and wrapped into HTML (with decoy
script/style content and canonicalization-stressor links), so byte-identical
extraction is independently testable.

Seed hosts are ``www.site{k}.example`` (three labels) so the reference's
``extract_root_domain`` subdomain/TLD matching semantics behave as intended
(see tests/test_scope.py; ``page.rs:10846-10871``).  Layout mirrors the
10¹⁰-frontier partitioning: files bucketed by ``hash(host) % n_buckets``.
"""

from __future__ import annotations

import datetime
import json
import os
import random

from .hashing import stable_hash_str
from .textextract import extract_text

EPOCH = datetime.datetime(2020, 1, 1)

ROBOTS_BODIES = {
    # NOTE: "/private/" (directory rule) — the reference's RuleLine matching is
    # exact/prefix*, so bare "/private" would NOT block "/private/secret"
    # (parser.rs:132-145, test_rule_line_applies_exact).
    0: "User-agent: *\nDisallow: /private/\nAllow: /public\n",
    1: "User-agent: testbot\nCrawl-delay: 5\nDisallow: /test\n",
    2: "User-agent: spider\nDisallow: /nogo\n\nUser-agent: otherbot\nDisallow: /other\n",
    3: None,  # served as 403 → disallow_all (parser.rs:355-364)
    4: None,  # absent → 404 → allow_all
    5: "User-agent: *\nDisallow: /dir/\nDisallow: /pre*\n",
    6: "User-agent: *\nRequest-rate: 3/60\nDisallow: /limited\n",
}


def host_of(k: int) -> str:
    return f"www.site{k}.example"


def seed_of(k: int) -> str:
    return f"https://{host_of(k)}/"


class _PageBuilder:
    """Builds one page: text blocks first, then HTML around them."""

    def __init__(self, url: str, title: str):
        self.url = url
        self.title = title
        self.body: list[str] = []
        self.blocks: list[str] = []
        self.head_extra: list[str] = []

    def heading(self, text: str):
        self.body.append(f"<h1>{text}</h1>")
        self.blocks.append(text)

    def para(self, text: str, html_text: str | None = None):
        self.body.append(f"<p>{html_text if html_text is not None else text}</p>")
        self.blocks.append(text)

    def nav(self, items: list[tuple[str, str]], hidden: list[tuple[str, str]] = ()):
        lis = []
        for href, anchor in items:
            lis.append(f'<li><a href="{href}">{anchor}</a></li>')
            self.blocks.append(anchor)
        for href, anchor in hidden:
            lis.append(f'<li><a aria-hidden="true" href="{href}">{anchor}</a></li>')
            self.blocks.append(anchor)
        self.body.append("<ul>" + "".join(lis) + "</ul>")

    def raw_body(self, html: str):
        self.body.append(html)

    def render(self) -> tuple[str, str]:
        html = (
            "<!DOCTYPE html><html><head>"
            f"<title>{self.title}</title>"
            '<meta name="description" content="Synthetic fixture page">'
            f'<meta property="og:image" content="{self.url}og.png">'
            "<style>.decoy { color: red; }</style>"
            "<script>var decoyTop = 'not text';</script>"
            + "".join(self.head_extra)
            + "</head><body>"
            + "".join(self.body)
            + "<script>var decoyBottom = 42;</script>"
            "</body></html>"
        )
        return html, "\n".join(self.blocks)


def _sentence_pool(seed: int, n: int = 256) -> list[str]:
    """Pre-generated sentences (one rng pass) so heavy pages don't cost one
    rng call per word."""
    rng = random.Random(seed ^ 0x5EED)
    words = [
        "data", "crawl", "frontier", "page", "robot", "link", "host", "index",
        "graph", "stream", "batch", "arrow", "shard", "wave", "queue", "fetch",
        "parse", "budget", "depth", "bloom", "actor", "block", "spill", "merge",
    ]
    return [
        " ".join(rng.choice(words) for _ in range(rng.randint(9, 17))) + "."
        for _ in range(n)
    ]


def build_corpus(
    n_hosts: int = 8,
    pages_per_host: int = 50,
    seed: int = 42,
    stressors: bool = True,
    page_weight: int = 1,
) -> list[dict]:
    """Return rows: {url, warc_ts, html(bytes), text, lang, status}.

    ``page_weight`` scales leaf-page body size (≈1.5 KB × weight) toward
    realistic web-page sizes for benchmarking; unit scale stays light."""
    rows: list[dict] = []
    statuses: dict[str, int] = {}
    for k in range(n_hosts):
        hrows, hstat = _build_host_rows(k, n_hosts, pages_per_host, seed, stressors, page_weight)
        rows.extend(hrows)
        statuses.update(hstat)
    return _finalize(rows, statuses)


def _finalize(rows: list[dict], statuses: dict[str, int]) -> list[dict]:
    out = []
    for i, r in enumerate(rows):
        out.append(
            {
                "url": r["url"],
                "warc_ts": EPOCH + datetime.timedelta(seconds=i),
                "html": r["html"],
                "text": r["text"],
                "lang": r["lang"],
                "status": statuses.get(r["url"], 200),
                "location": r.get("location"),
                "content_type": r.get("content_type", "text/html"),
                "flaky_until": r.get("flaky_until", 0),
            }
        )
    return out


def _build_host_rows(
    k: int,
    n_hosts: int,
    pages_per_host: int,
    seed: int = 42,
    stressors: bool = True,
    page_weight: int = 1,
) -> tuple[list[dict], dict[str, int]]:
    rows: list[dict] = []
    statuses: dict[str, int] = {}

    def add(url: str, html: str, text: str, lang: str = "en", status: int = 200,
            encoding: str = "utf-8", location: str | None = None,
            content_type: str = "text/html", flaky_until: int = 0):
        rows.append({"url": url, "html": html.encode(encoding), "text": text, "lang": lang,
                     "location": location, "content_type": content_type,
                     "flaky_until": flaky_until})
        statuses[url] = status

    n_sections = max(2, min(8, pages_per_host // 12))
    leaves_per_section = max(1, (pages_per_host - 1 - n_sections) // n_sections)
    sentences = _sentence_pool(seed)

    if True:  # (kept as a block to preserve the per-host body below)
        rng = random.Random(seed * 1000003 + k)
        host = host_of(k)
        root = seed_of(k)
        sections = [f"/sec{i}/" for i in range(n_sections)]
        leaves = [f"/sec{i}/page{j}" for i in range(n_sections) for j in range(leaves_per_section)]
        all_paths = sections + leaves

        # robots.txt
        body = ROBOTS_BODIES.get(k % 7)
        robots_status = 403 if (k % 7) == 3 else 200
        if body is not None or (k % 7) == 3:
            rows_status = robots_status if body is None else 200
            if body is None:
                rows.append({"url": root + "robots.txt", "html": b"", "text": "", "lang": "en"})
                statuses[root + "robots.txt"] = rows_status
            else:
                add(root + "robots.txt", body, body.strip())
        # (k % 7) == 4 → no robots row at all → 404 → allow_all

        # root page
        p = _PageBuilder(root, f"site{k} home")
        p.heading(f"Welcome to site{k}")
        p.para(f"This is the home page of host {host}.")
        p.nav([(s, f"Section {s.strip('/')}") for s in sections])
        if stressors and k == 0:
            _add_root_stressors(p)
        html, text = p.render()
        add(root, html, text)

        # section pages
        for i, s in enumerate(sections):
            p = _PageBuilder(root + s.lstrip("/"), f"site{k} {s}")
            p.heading(f"Section sec{i} of site{k}")
            p.para(f"Listing of pages in sec{i}.")
            p.nav(
                [(f"page{j}", f"Page {i}-{j}") for j in range(leaves_per_section)]
                + [("/", "Home")]
            )
            html, text = p.render()
            add(root + s.lstrip("/"), html, text)

        # leaf pages
        for idx, leaf in enumerate(leaves):
            url = root + leaf.lstrip("/")
            p = _PageBuilder(url, f"site{k} {leaf}")
            p.heading(f"Content {leaf} on site{k}")
            n_paras = rng.randint(1, 3) * page_weight
            n_sent = len(sentences)
            for pi in range(n_paras):
                body = " ".join(
                    sentences[rng.randrange(n_sent)] for _ in range(rng.randint(2, 5))
                )
                p.para(f"Paragraph {pi}: {body}")
            # 3-8 same-host links
            targets = rng.sample(all_paths, min(len(all_paths), rng.randint(3, 8)))
            items = [(t, f"See {t}") for t in targets]
            # 0-2 cross-host links (out of scope in single-seed crawls)
            for _ in range(rng.randint(0, 2)):
                other = host_of(rng.randrange(n_hosts))
                items.append((f"https://{other}/sec0/", f"Peer {other}"))
            # 5% absent links → 404
            if rng.random() < 0.35:
                items.append((f"/missing/{idx}", f"Ghost {idx}"))
            p.nav(items)
            html, text = p.render()
            add(url, html, text, lang=("fr" if idx % 17 == 5 else "ja" if idx % 23 == 7 else "en"))

        # sitemap.xml (urlset) — includes an ORPHAN page reachable only via
        # the sitemap chain (sitemap_crawl scenario)
        orphan = f"{root}orphan/sm{k}"
        h_orph, t_orph = _mini_page(orphan, f"orphan page {k}", [f"Only the sitemap links here ({k})."])
        add(orphan, h_orph, t_orph)
        locs = "".join(
            f"<url><loc>{root}{t.lstrip('/')}</loc></url>" for t in sections
        ) + f"<url><loc>{orphan}</loc></url>"
        sitemap = f'<?xml version="1.0" encoding="UTF-8"?><urlset>{locs}</urlset>'
        rows.append({"url": root + "sitemap.xml", "html": sitemap.encode(), "text": "", "lang": "en"})
        statuses[root + "sitemap.xml"] = 200

        if stressors and k == 0:
            _add_special_hosts(add)
            _add_dup_pages(add, root)
            _add_private_pages(add, root)
            _add_encoding_page(add, root)
            _add_redirect_pages(add, root)
            _add_seed_redirect_hosts(add)
            _add_nonhtml_pages(add, root)
            _add_flaky_pages(add, root)
            _add_autosm_host(add)

    return rows, statuses


def build_corpus_parallel(
    n_hosts: int,
    pages_per_host: int,
    seed: int = 42,
    stressors: bool = True,
    page_weight: int = 1,
) -> list[dict]:
    """Ray-parallel corpus generation (one task per host; deterministic —
    identical output to :func:`build_corpus`)."""
    import ray

    if not ray.is_initialized():
        return build_corpus(n_hosts, pages_per_host, seed, stressors, page_weight)
    build = ray.remote(_build_host_rows)
    futs = [
        build.remote(k, n_hosts, pages_per_host, seed, stressors, page_weight)
        for k in range(n_hosts)
    ]
    rows: list[dict] = []
    statuses: dict[str, int] = {}
    for hrows, hstat in ray.get(futs):
        rows.extend(hrows)
        statuses.update(hstat)
    return _finalize(rows, statuses)


def _add_root_stressors(p: _PageBuilder):
    """FIXTURES.md §2 — one link per canonicalization stressor class."""
    p.raw_body(
        '<ul>'
        '<li><a href="/subpage">Root absolute</a></li>'
        '<li><a href="/sec0/page0#frag">Fragment stripped</a></li>'
        '<li><a href="/p?key=value&amp;other=123">Query preserved</a></li>'
        '<li><a href="mailto:x@y.z">Mail</a></li>'
        '<li><a href="tel:123">Tel</a></li>'
        '<li><a href="javascript:void(0);">JS</a></li>'
        '<li><a href="example.org/another-path">Domain-like path</a></li>'
        '<li><a href="HTTPS://WWW.SITE0.EXAMPLE/MiXeD">Mixed case</a></li>'
        '<li><a href="/MiXeD">Mixed twin</a></li>'
        '<li><a href="http://www.site0.example/coerced">Scheme coerce</a></li>'
        '<li><a href="https://sub.site0.example/subpage">Subdomain</a></li>'
        '<li><a href="https://site0.alt/tldpage">TLD variant</a></li>'
        '<li><a href="https://off-domain.example/x">External</a></li>'
        '<li><a href="https://www.site0.example:8080/ported">Ported</a></li>'
        '<li><a href="/assets/pic.jpg">Pic</a></li>'
        '<li><a href="/assets/app.js">App</a></li>'
        '<li><a aria-hidden="true" href="/hidden">Hidden</a></li>'
        '<li><a href="/sec0">No slash</a></li>'
        '<li><a href="/sec0/">With slash</a></li>'
        '<li><a href="/dup/a">Dup A</a></li>'
        '<li><a href="/dup/b">Dup B</a></li>'
        '<li><a href="/private/secret">Private</a></li>'
        '<li><a href="/public/open">Public</a></li>'
        '<li><a href="/ja/shiftjis">Japanese</a></li>'
        '<li><a href="/r/one">Redir one</a></li>'
        '<li><a href="/r/rel">Redir rel</a></li>'
        '<li><a href="/r/chain/0">Redir chain</a></li>'
        '<li><a href="/r/loop">Redir loop</a></li>'
        '<li><a href="/r/off">Redir off</a></li>'
        '<li><a href="/r/ssrf">Redir ssrf</a></li>'
        '<li><a href="/r/local">Redir local</a></li>'
        '<li><a href="/r/gone">Redir gone</a></li>'
        '<li><a href="/download/report">PDF download</a></li>'
        '<li><a href="/download/archive">Zip download</a></li>'
        '<li><a href="/flaky/once">Flaky once</a></li>'
        '<li><a href="/flaky/always">Flaky always</a></li>'
        "</ul>"
    )
    for anchor in [
        "Root absolute", "Fragment stripped", "Query preserved", "Mail", "Tel", "JS",
        "Domain-like path", "Mixed case", "Mixed twin", "Scheme coerce", "Subdomain",
        "TLD variant", "External", "Ported", "Pic", "App", "Hidden", "No slash", "With slash",
        "Dup A", "Dup B", "Private", "Public", "Japanese",
        "Redir one", "Redir rel", "Redir chain", "Redir loop", "Redir off",
        "Redir ssrf", "Redir local", "Redir gone", "PDF download", "Zip download",
        "Flaky once", "Flaky always",
    ]:
        p.blocks.append(anchor)


def _mini_page(url: str, title: str, paras: list[str], links: list[tuple[str, str]] = ()):
    p = _PageBuilder(url, title)
    p.heading(title)
    for t in paras:
        p.para(t)
    if links:
        p.nav(list(links))
    return p.render()


def _add_special_hosts(add):
    for url, title in [
        ("https://sub.site0.example/subpage", "sub host page"),
        ("https://sub.site0.example/", "sub host root"),
        ("https://site0.alt/tldpage", "tld variant page"),
        ("https://site0.alt/", "tld variant root"),
        ("https://off-domain.example/x", "external page"),
    ]:
        html, text = _mini_page(url, title, [f"Body of {title}."])
        add(url, html, text)


def _add_dup_pages(add, root: str):
    """Two URLs with identical normalized content; each carries a unique link
    that differs ONLY via href (removed by normalize_html) — the
    later-crawled duplicate's unique link must stay unvisited
    (website.rs:8673-8683)."""
    for name in ("a", "b"):
        url = f"{root}dup/{name}"
        p = _PageBuilder(url, "dup page")
        p.heading("Duplicated content")
        p.para("Identical body for signature dedup.")
        p.body.append(f'<ul><li><a href="/dup/only-{name}">Unique link</a></li></ul>')
        p.blocks.append("Unique link")
        html, text = p.render()
        # identical title so <head> normalizes identically
        add(url, html, text)
        only_url = f"{root}dup/only-{name}"
        h2, t2 = _mini_page(only_url, "dup leaf", [f"Leaf {name}."])
        add(only_url, h2, t2)


def _add_encoding_page(add, root: str):
    """Shift_JIS-encoded page with a <meta charset> tag — exercises the
    charset-detection path (page.rs:9384-9394 analogue); golden text is the
    unicode string, so byte-identical parity REQUIRES correct decoding."""
    url = root + "ja/shiftjis"
    p = _PageBuilder(url, "ja encoded page")
    p.head_extra.append('<meta charset="shift_jis">')
    p.heading("日本語のページ")
    p.para("これはシフトJISでエンコードされたページです。")
    html, text = p.render()
    add(url, html, text, lang="ja", encoding="shift_jis")

    # meta-LESS legacy pages: no BOM, no <meta charset> — content-based
    # sniffing (encoding.content_sniff, the auto_encoder analogue of
    # page.rs:9384-9394) is the ONLY way to recover the golden text.
    # ORPHANS by design: not nav-linked and absent from the sitemap, so
    # every crawl scenario is unchanged; corpus-wide queries recompute
    # from the same parquet in both engines.
    url = root + "ja/noheader-sjis"
    p = _PageBuilder(url, "ja raw page")
    p.heading("ヘッダーなしのページ")
    p.para("メタタグのないシフトJISの本文です。")
    html, text = p.render()
    add(url, html, text, lang="ja", encoding="shift_jis")

    url = root + "ru/noheader-1251"
    p = _PageBuilder(url, "ru raw page")
    p.heading("Страница без метки")
    p.para("Это русская страница в кодировке без метатега.")
    html, text = p.render()
    add(url, html, text, lang="ru", encoding="windows-1251")


def _add_redirect_pages(add, root: str):
    """FIXTURES §redirects — one row per redirect-semantics class
    (policy Loose/Strict/None, hop limit 7, SSRF guard; redirect.py):

    * ``/r/one``      — single 301 to a real same-host page
    * ``/r/rel``      — 302 with a RELATIVE Location (resolved vs current url)
    * ``/r/chain/0..8`` — 9-hop chain: exceeds limit 7 → aborted fetch
    * ``/r/loop``     — 2-cycle: exceeds limit → aborted
    * ``/r/off``      — 302 to an off-scope host (Loose follows, Strict stops)
    * ``/r/ssrf``     — 302 to the cloud metadata IP → blocked (all policies)
    * ``/r/local``    — 302 to 127.0.0.1 → blocked
    * ``/r/gone``     — 301 to a URL absent from the corpus → 404 final
    """
    add(root + "r/one", "", "", status=301, location=root + "sec0/")
    add(root + "r/rel", "", "", status=302, location="../sec1/")
    for i in range(9):
        add(root + f"r/chain/{i}", "", "", status=301,
            location=(root + f"r/chain/{i+1}") if i < 8 else root + "sec1/")
    add(root + "r/loop", "", "", status=302, location=root + "r/loop2")
    add(root + "r/loop2", "", "", status=302, location=root + "r/loop")
    add(root + "r/off", "", "", status=302, location="https://off-domain.example/x")
    add(root + "r/ssrf", "", "", status=302, location="http://169.254.169.254/latest/meta-data/")
    add(root + "r/local", "", "", status=302, location="http://127.0.0.1/admin")
    add(root + "r/gone", "", "", status=301, location=root + "r/nowhere")


def _add_nonhtml_pages(add, root: str):
    """Non-HTML rows for the ``only_html`` Content-Type gate: extension-free
    URLs (the asset-extension filter would drop ``.pdf`` links before fetch)
    whose Content-Type is in IGNORE_CONTENT_TYPES — body must be dropped at
    fetch when only_html is on.  Golden ``text`` is empty (never extracted)."""
    pdf_body = "%PDF-1.4 fake binary payload for the gate"
    zip_body = "PK\x03\x04 fake zip payload"
    # golden text = extractor output on the raw bytes (the roundtrip/parity
    # checks bypass the crawl gate); the CRAWL drops the body instead
    add(root + "download/report", pdf_body, extract_text(pdf_body),
        content_type="application/pdf")
    add(root + "download/archive", zip_body, extract_text(zip_body),
        content_type="application/zip")


def _add_flaky_pages(add, root: str):
    """Transient-failure rows for retry semantics (configuration.rs:462,
    retry loop website.rs:4205-4253): ``flaky_until`` = number of failing
    attempts (503, retryable per page.rs:1641-1653) before the real
    response.  With retry=N the fetcher makes N+1 attempts, so
    ``/flaky/once`` succeeds from retry>=1 while ``/flaky/always`` stays
    503 at any realistic retry budget."""
    h, t = _mini_page(root + "flaky/once", "flaky once page",
                      ["Succeeds on the second attempt."],
                      links=[("/flaky/leaf", "Flaky leaf")])
    add(root + "flaky/once", h, t, flaky_until=1)
    h, t = _mini_page(root + "flaky/leaf", "flaky leaf", ["Reached only after a retry."])
    add(root + "flaky/leaf", h, t)
    h, t = _mini_page(root + "flaky/always", "flaky always page", ["Never served."])
    add(root + "flaky/always", h, t, flaky_until=99)


def _add_seed_redirect_hosts(add):
    """Seed-redirect scenario (``modify_selectors``): the redirseed root 301s
    cross-host to redirtarget; after the rebuild BOTH hosts stay in scope, so
    the back-link to the original host must be crawled."""
    old_root = "https://www.redirseed.example/"
    new_root = "https://www.redirtarget.example/"
    add(old_root, "", "", status=301, location=new_root)
    h, t = _mini_page(
        new_root, "redirect target home",
        ["Landed here via a seed redirect."],
        links=[("/t1", "Target leaf"), (old_root + "back", "Back to origin")],
    )
    add(new_root, h, t)
    h, t = _mini_page(new_root + "t1", "target leaf", ["Leaf on the new host."])
    add(new_root + "t1", h, t)
    h, t = _mini_page(old_root + "back", "origin back page", ["Still-in-scope page on the original host."])
    add(old_root + "back", h, t)


def _add_private_pages(add, root: str):
    html, text = _mini_page(root + "private/secret", "private page", ["Robots-blocked content."])
    add(root + "private/secret", html, text)
    h2, t2 = _mini_page(root + "public/open", "public page", ["Open content."])
    add(root + "public/open", h2, t2)


def corpus_as_dict(rows: list[dict]) -> dict[str, tuple]:
    """Oracle-side corpus: url → (status, html bytes, location, content_type,
    flaky_until)."""
    return {
        r["url"]: (
            r["status"], r["html"], r.get("location"),
            r.get("content_type", "text/html"), r.get("flaky_until", 0),
        )
        for r in rows
    }


def _add_autosm_host(add):
    """Sitemap-autodiscovery host (``website.rs:12510-12546``): there is NO
    conventional ``/sitemap.xml`` row (404), but the homepage ``<head>``
    carries ``<link rel="sitemap" href="/maps/custom-sitemap.xml">`` whose
    urlset lists the linked section page plus an orphan reachable only via
    that non-conventional sitemap path."""
    root = "https://www.autosm.example/"
    p = _PageBuilder(root, "autosm home")
    p.head_extra.append('<link rel="sitemap" href="/maps/custom-sitemap.xml">')
    p.heading("Autodiscovery host")
    p.para("The sitemap lives at a non-conventional path.")
    p.nav([("/s0", "Section zero")])
    html, text = p.render()
    add(root, html, text)
    h, t = _mini_page(root + "s0", "autosm s0", ["Linked section page."])
    add(root + "s0", h, t)
    h, t = _mini_page(
        root + "orphan/auto", "autosm orphan", ["Only the custom sitemap links here."]
    )
    add(root + "orphan/auto", h, t)
    sm = (
        '<?xml version="1.0" encoding="UTF-8"?><urlset>'
        f"<url><loc>{root}s0</loc></url>"
        f"<url><loc>{root}orphan/auto</loc></url></urlset>"
    )
    # path ends with sitemap.xml so machine-page suffix filters apply
    add(root + "maps/custom-sitemap.xml", sm, "")


def autosm_seed() -> str:
    """Seed of the sitemap-autodiscovery host."""
    return "https://www.autosm.example/"


def redirseed_seed() -> str:
    """Seed whose root 301s cross-host (the modify_selectors scenario)."""
    return "https://www.redirseed.example/"


# ---------------------------------------------------------------------------
# Parquet layout — host-hash bucketed (the 10¹⁰-frontier layout)
# ---------------------------------------------------------------------------


def write_corpus_parquet(
    rows: list[dict], out_dir: str, n_buckets: int = 16, row_group_size: int = 128,
    params: dict | None = None,
) -> str:
    """Write ``web_pages`` bucketed by ``hash(host) % n_buckets``; rows inside
    a bucket sorted by url so row-group pruning on url predicates works."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .urlnorm import url_host

    os.makedirs(out_dir, exist_ok=True)
    buckets: dict[int, list[dict]] = {}
    for r in rows:
        b = stable_hash_str(url_host(r["url"])) % n_buckets
        buckets.setdefault(b, []).append(r)

    def _write_bucket(b, brows):
        brows.sort(key=lambda r: r["url"])
        table = pa.table(
            {
                "url": [r["url"] for r in brows],
                "warc_ts": pa.array([r["warc_ts"] for r in brows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in brows], pa.binary()),
                "text": [r["text"] for r in brows],
                "lang": [r["lang"] for r in brows],
                "status": pa.array([r["status"] for r in brows], pa.int32()),
                "location": pa.array([r.get("location") for r in brows], pa.string()),
                "content_type": pa.array(
                    [r.get("content_type", "text/html") for r in brows], pa.string()
                ),
                "flaky_until": pa.array(
                    [r.get("flaky_until", 0) for r in brows], pa.int32()
                ),
            }
        )
        bdir = os.path.join(out_dir, f"bucket={b:04d}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(table, os.path.join(bdir, "part-0.parquet"), row_group_size=row_group_size)

    try:
        import ray

        parallel = ray.is_initialized()
    except ImportError:
        parallel = False
    if parallel:
        import ray

        w = ray.remote(_write_bucket)
        ray.get([w.remote(b, brows) for b, brows in sorted(buckets.items())])
    else:
        for b, brows in sorted(buckets.items()):
            _write_bucket(b, brows)
    manifest = {"n_buckets": n_buckets, "rows": len(rows), "params": params}
    with open(os.path.join(out_dir, "_corpus_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return out_dir


def ensure_corpus(
    base_dir: str,
    scale: str = "unit",
    n_hosts: int = 8,
    pages_per_host: int = 50,
    seed: int = 42,
    n_buckets: int = 16,
    page_weight: int = 1,
) -> str:
    """Idempotently materialize a corpus at ``{base_dir}/{scale}/web_pages``."""
    out_dir = os.path.join(base_dir, scale, "web_pages")
    marker = os.path.join(out_dir, "_corpus_manifest.json")
    params = {"n_hosts": n_hosts, "pages_per_host": pages_per_host, "seed": seed,
              "n_buckets": n_buckets, "page_weight": page_weight,
              "gen_version": GENERATOR_VERSION}
    if os.path.exists(marker):
        with open(marker) as f:
            manifest = json.load(f)
        if manifest.get("params") == params:
            return out_dir
        import shutil

        shutil.rmtree(out_dir)  # stale corpus from different params
    rows = build_corpus_parallel(
        n_hosts=n_hosts, pages_per_host=pages_per_host, seed=seed, page_weight=page_weight
    )
    return write_corpus_parquet(rows, out_dir, n_buckets=n_buckets, params=params)


SCALE_PARAMS = {
    # sf name → (n_hosts, pages_per_host, n_buckets, page_weight)
    # page_weight scales leaf bodies toward realistic web-page sizes (bench
    # scales only; correctness scales stay light so oracle runs are fast)
    "sf0.001": (4, 30, 8, 1),
    "sf0.01": (8, 120, 16, 1),
    "sf0.1": (96, 9600, 128, 16),
    "unit": (8, 50, 16, 1),
}

# bump when generator output changes so cached corpora auto-invalidate
GENERATOR_VERSION = 7

FIXTURE_BASE = "/tmp/spider_ray_fixtures"


def ensure_scale(sf_name: str) -> str:
    """Corpus for a named scale (deterministic path for oracle SQL)."""
    params = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])
    n_hosts, pph, n_buckets, page_weight = params
    return ensure_corpus(
        FIXTURE_BASE, sf_name, n_hosts, pph, seed=42, n_buckets=n_buckets, page_weight=page_weight
    )


def sanity_check_text_roundtrip(rows: list[dict]) -> int:
    """Every constructed page's golden text must equal the extractor output."""
    bad = 0
    for r in rows:
        if r["url"].endswith(("robots.txt", "sitemap.xml")):
            continue
        if extract_text(r["html"]) != r["text"]:
            bad += 1
    return bad
