"""Driver contract for the spider_ray engine (Ray Data).

``entry()``  — flagship crawl over the sf0.001 synthetic web corpus.
``queries()``— one entry per implemented operator family (SURVEY.md §2 +
               training-data ops); each callable takes ``sf_dir``.
``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset.
Crawl pipelines are iterative/stateful (not SQL-expressible) → rows-only
checks; their real correctness gate is the oracle-parity pytest suite
(tests/test_crawl_parity.py).

The synthetic web corpus (BASELINE.json input_hint schema) is derived
deterministically per scale under /tmp/spider_ray_fixtures — no external
data; DuckDB reads the same files via read_parquet() for exact
byte-identical text comparison.

Ray is initialised by the driver BEFORE importing this module; nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SF001_CORPUS = "/tmp/spider_ray_fixtures/sf0.01/web_pages"


def _sf_name(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "unit"


def _corpus_for(sf_dir: str) -> str:
    from spider_ray.fixtures import ensure_scale

    return ensure_scale(_sf_name(sf_dir))


def _docs(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(sf_dir: str):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ---------------------------------------------------------------------------
# crawl pipelines (rows-only checks; pytest oracle-parity is the real gate)
# ---------------------------------------------------------------------------


def _crawl_spec(name: str):
    """(config, seed indices, result shape) — SHARED with the golden-oracle
    generator (spider_ray/goldens.py) so the Ray query and its sequential
    golden always run the identical job."""
    from spider_ray.goldens import crawl_specs

    return crawl_specs()[name]


def _crawl(sf_dir: str, name: str, keep_pages: bool = True):
    from spider_ray.config import CrawlJob
    from spider_ray.fixtures import seed_of
    from spider_ray.pipelines.crawl import crawl

    spec = _crawl_spec(name)
    config, seed_ks = spec[0], spec[1]
    provider = spec[3] if len(spec) > 3 else None
    corpus = _corpus_for(sf_dir)
    job = CrawlJob(tuple(seed_of(k) if isinstance(k, int) else k for k in seed_ks), config)
    return crawl(job, corpus, keep_pages=keep_pages, queue_provider=provider)


def _visited_table(res) -> pa.Table:
    from spider_ray.goldens import visited_table

    return visited_table(res.admitted_order)


def q_crawl_plain(sf_dir: str):
    return _visited_table(_crawl(sf_dir, "crawl_plain", keep_pages=False))


def q_crawl_pages(sf_dir: str):
    res = _crawl(sf_dir, "crawl_pages")
    return res.pages_table().drop_columns(["links"])


def q_crawl_budget(sf_dir: str):
    return _visited_table(_crawl(sf_dir, "crawl_budget", keep_pages=False))


def q_crawl_robots(sf_dir: str):
    return _visited_table(_crawl(sf_dir, "crawl_robots", keep_pages=False))


def q_crawl_dedup(sf_dir: str):
    return _visited_table(_crawl(sf_dir, "crawl_dedup", keep_pages=False))


def q_crawl_streaming(sf_dir: str):
    """HostGate actor-pool streaming admission (per-host frontier shards).
    Result shape: per-host admission sequences — the invariant streaming
    admission preserves (cross-host interleave is per-shard deterministic,
    not globally canonical)."""
    from spider_ray.config import CrawlJob
    from spider_ray.fixtures import seed_of
    from spider_ray.goldens import perhost_table
    from spider_ray.pipelines.crawl import RayCrawler

    config, seed_ks = _crawl_spec("crawl_streaming")[:2]
    corpus = _corpus_for(sf_dir)
    job = CrawlJob(tuple(seed_of(k) for k in seed_ks), config)
    res = RayCrawler(job, corpus, keep_pages=False).run_streaming()
    return perhost_table(res.admitted_order)


def q_crawl_multihost(sf_dir: str):
    return _visited_table(_crawl(sf_dir, "crawl_multihost", keep_pages=False))


def q_crawl_redirect_strict(sf_dir: str):
    """Strict redirect policy: off-host redirects stop (3xx page row);
    same-host chains follow under the default-policy cap."""
    res = _crawl(sf_dir, "crawl_redirect_strict")
    return res.pages_table().drop_columns(["links"])


def q_crawl_seed_redirect(sf_dir: str):
    """Cross-host 301 of the SEED: selectors rebuilt for the target host
    (modify_selectors) with the original host kept in scope — pages on BOTH
    hosts must appear."""
    res = _crawl(sf_dir, "crawl_seed_redirect")
    return res.pages_table().drop_columns(["links"])


def q_crawl_hooks(sf_dir: str):
    """on_link_find rewrite at dispatch + on_should_crawl page suppression
    (blocked_crawl rows kept, links not expanded)."""
    res = _crawl(sf_dir, "crawl_hooks")
    return res.pages_table().drop_columns(["links"])


def q_crawl_path_budget(sf_dir: str):
    """Path-prefix budgets: cumulative segment counters + wildcard cap."""
    return _visited_table(_crawl(sf_dir, "crawl_path_budget", keep_pages=False))


def q_crawl_subdomains(sf_dir: str):
    """subdomains=True scope: sub.site0.example pages stay in scope."""
    return _visited_table(_crawl(sf_dir, "crawl_subdomains", keep_pages=False))


def q_crawl_extra_links(sf_dir: str):
    """extra_links merged into the first frontier generation."""
    return _visited_table(_crawl(sf_dir, "crawl_extra_links", keep_pages=False))


def q_crawl_queue(sf_dir: str):
    """Mid-crawl queue injection (channel_queue): the sitemap-orphan page is
    queued after wave 0, bypassing the wildcard budget but passing the rest
    of the admission chain."""
    return _visited_table(_crawl(sf_dir, "crawl_queue", keep_pages=False))


def q_crawl_retry(sf_dir: str):
    """retry=1: the flaky-once row succeeds on its second attempt (its leaf
    link gets crawled); flaky-always stays 503 with no content."""
    res = _crawl(sf_dir, "crawl_retry")
    return res.pages_table().drop_columns(["links"])


def q_recrawl_diff(sf_dir: str):
    """Incremental re-crawl diff (ETag/304 class re-expressed as a signature
    join): fresh crawl classified against a synthetic prior derived by the
    shared recrawl_prior_spec (changed/unchanged/new/gone)."""
    import ray.data

    from spider_ray.goldens import recrawl_prior_spec
    from spider_ray.pipelines.recrawl import recrawl_diff

    res = _crawl(sf_dir, "crawl_pages")
    tbl = res.pages_table()
    urls = tbl.column("url").to_pylist()
    sigs = [s or 0 for s in tbl.column("signature").to_pylist()]
    p_urls, p_sigs = [], []
    for u, s in zip(urls, sigs):
        spec = recrawl_prior_spec(u, s)
        if spec is not None:
            p_urls.append(u)
            p_sigs.append(spec[1])
    for i in range(3):
        p_urls.append(f"https://www.site0.example/gone/p{i}")
        p_sigs.append(i)
    prior = pa.table(
        {"url": pa.array(p_urls, pa.string()), "signature": pa.array(p_sigs, pa.uint64())}
    )
    fresh = ray.data.from_arrow(
        pa.table({"url": pa.array(urls, pa.string()), "signature": pa.array(sigs, pa.uint64())})
    )
    diff_ds, gone = recrawl_diff(prior, fresh)
    diff = pa.concat_tables(
        [b for b in diff_ds.iter_batches(batch_format="pyarrow")]
        + [
            pa.table(
                {
                    "url": pa.array(gone, pa.string()),
                    "change": pa.array(["gone"] * len(gone), pa.string()),
                }
            )
        ]
    )
    return diff


def q_crawl_sitemap(sf_dir: str):
    """Sitemap chain: orphan page reachable only via sitemap.xml is crawled,
    sitemap-discovered links are not expanded."""
    return _visited_table(_crawl(sf_dir, "crawl_sitemap", keep_pages=False))


def q_crawl_sitemap_auto(sf_dir: str):
    """Sitemap autodiscovery (website.rs:12510-12546): conventional
    /sitemap.xml 404s, so the homepage's <link rel=sitemap> path is used;
    its orphan must be crawled."""
    return _visited_table(_crawl(sf_dir, "crawl_sitemap_auto", keep_pages=False))


def q_crawl_regex_filters(sf_dir: str):
    """Regex blacklist mode (RegexSet.is_match semantics): /sec1/, /sec2/
    and /dup/ URLs blocked at admission."""
    return _visited_table(_crawl(sf_dir, "crawl_regex_filters", keep_pages=False))


def q_crawl_content_gate(sf_dir: str):
    """only_html Content-Type gate (pdf/zip bodies dropped) + max_page_bytes
    truncation (2 KiB cap, truncated flag, links parsed from the prefix)."""
    res = _crawl(sf_dir, "crawl_content_gate")
    return res.pages_table().drop_columns(["links"])


# ---------------------------------------------------------------------------
# corpus-table pipelines with exact SQL oracles
# ---------------------------------------------------------------------------


def q_extract_text_parity(sf_dir: str):
    """Byte-identical text extraction: Ray re-extracts text from raw html;
    the oracle reads the corpus's golden text column."""
    import ray.data

    from spider_ray.textextract import extract_text

    corpus = _corpus_for(sf_dir)

    def extract(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "url": batch.column("url"),
                "text": pa.array(
                    [extract_text(h) for h in batch.column("html").to_pylist()],
                    pa.string(),
                ),
            }
        )

    def drop_machine_pages(batch: pa.Table) -> pa.Table:
        keep = pc.invert(
            pc.or_(
                pc.ends_with(batch.column("url"), "robots.txt"),
                pc.ends_with(batch.column("url"), "sitemap.xml"),
            )
        )
        return batch.filter(keep)

    ds = ray.data.read_parquet(corpus, columns=["url", "html"])
    return ds.map_batches(drop_machine_pages, batch_format="pyarrow").map_batches(
        extract, batch_format="pyarrow"
    )


def q_scrape_markdown(sf_dir: str):
    """Scrape content transform, markdown return-format (the reference CLI's
    scrape default, spider_cli args.rs:123-125): distributed pruned read +
    actor-pool converter; golden = sequential page-loop recompute."""
    from spider_ray.markdown import transform_corpus

    return transform_corpus(_corpus_for(sf_dir), "markdown")


def q_scrape_commonmark(sf_dir: str):
    """Commonmark return-format (spec-escaped markdown variant)."""
    from spider_ray.markdown import transform_corpus

    return transform_corpus(_corpus_for(sf_dir), "commonmark")


def q_scrape_xml(sf_dir: str):
    """XML return-format (token-level reserialization — lowercase tags,
    quoted attrs, escaped text, void self-close)."""
    from spider_ray.markdown import transform_corpus

    return transform_corpus(_corpus_for(sf_dir), "xml")


def q_host_page_counts(sf_dir: str):
    import ray.data

    from spider_ray.urlnorm import url_host

    corpus = _corpus_for(sf_dir)

    def hosts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"host": pa.array([url_host(u) for u in batch.column("url").to_pylist()], pa.string())}
        )

    ds = ray.data.read_parquet(corpus, columns=["url"]).map_batches(hosts, batch_format="pyarrow")
    out = ds.groupby("host").count()
    return out.map_batches(
        lambda b: pa.table({"host": b.column("host"), "n_pages": pc.cast(b.column("count()"), pa.int64())}),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# training-data ops over the sf tables (strong SQL oracles where expressible)
# ---------------------------------------------------------------------------


def q_exact_dedup(sf_dir: str):
    from spider_ray.ops.dedup import exact_dedup_counts

    return exact_dedup_counts(_docs(sf_dir))


def q_token_stats(sf_dir: str):
    from spider_ray.ops.textstats import TokenCounter

    out = _docs(sf_dir).map_batches(TokenCounter(), batch_format="pyarrow")
    return out.map_batches(lambda b: b.select(["doc_id", "n_chars", "n_tokens"]), batch_format="pyarrow")


def q_docs_by_lang(sf_dir: str):
    ds = _docs(sf_dir).groupby("lang").count()
    return ds.map_batches(
        lambda b: pa.table({"lang": b.column("lang"), "n_docs": pc.cast(b.column("count()"), pa.int64())}),
        batch_format="pyarrow",
    )


def q_events_by_type(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"])
    from ray.data.aggregate import Count, Max

    out = ds.groupby("event_type").aggregate(Count(), Max("user_id"))
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "n_events": pc.cast(b.column("count()"), pa.int64()),
                "max_user_id": pc.cast(b.column("max(user_id)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_docs_by_source(sf_dir: str):
    ds = _docs(sf_dir).groupby("source").count()
    return ds.map_batches(
        lambda b: pa.table({"source": b.column("source"), "n_docs": pc.cast(b.column("count()"), pa.int64())}),
        batch_format="pyarrow",
    )


def q_events_per_day(sf_dir: str):
    import ray.data

    ds = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def day_of(batch: pa.Table) -> pa.Table:
        return pa.table({"day": pc.floor_temporal(batch.column("ts"), unit="day")})

    out = ds.map_batches(day_of, batch_format="pyarrow").groupby("day").count()
    return out.map_batches(
        lambda b: pa.table(
            {
                "day": pc.cast(b.column("day"), pa.timestamp("us")),
                "n_events": pc.cast(b.column("count()"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


SAMPLE_RATES = {"en": 0.5, "de": 0.1, "es": 0.1, "fr": 0.1, "zh": 0.1}


def q_curate_corpus(sf_dir: str):
    """Flagship composed curation pipeline: Gopher quality filter → exact
    dedup → MinHash near-dup removal → deterministic stratified sample →
    token manifest (golden = independent sequential chain)."""
    from spider_ray.ops.curate import curate_corpus

    return curate_corpus(_docs(sf_dir), SAMPLE_RATES)


def q_pii_scrub(sf_dir: str):
    """PII scrub counts over the documents table with deterministically
    planted PII (the fixture text has none; the same weave expression is
    inlined in the SQL oracle so the matching is actually exercised)."""
    from spider_ray.ops.textclean import PiiScrubber, plant_pii

    ds = _docs(sf_dir).map_batches(plant_pii, batch_format="pyarrow")
    return ds.map_batches(PiiScrubber(), batch_format="pyarrow")


def q_gopher_quality(sf_dir: str):
    """Gopher-style quality stats + keep verdict (all-integer parity)."""
    from spider_ray.ops.textclean import GopherQuality

    return _docs(sf_dir).map_batches(GopherQuality(), batch_format="pyarrow")


def q_stratified_sample(sf_dir: str):
    """Deterministic per-lang down-sampling (Knuth multiplicative hash)."""
    from spider_ray.ops.sampling import stratified_sample

    out = stratified_sample(_docs(sf_dir), SAMPLE_RATES)
    return out.map_batches(lambda b: b.select(["doc_id", "lang"]), batch_format="pyarrow")


def q_shard_shuffle(sf_dir: str):
    """Deterministic training-shard shuffle: global (knuth-hash, id) sort +
    remote per-block enumeration; shard = pos % 8."""
    from spider_ray.ops.sampling import shard_shuffle

    return shard_shuffle(_docs(sf_dir), n_shards=8)


def q_bigram_topk(sf_dir: str):
    """Top-100 corpus bigrams (combiner partials -> one shuffle -> small
    sort/limit); ties break on the bigram string."""
    from spider_ray.ops.ngrams import bigram_topk

    return bigram_topk(_docs(sf_dir), k=100)


def q_sequence_packing(sf_dir: str):
    """Token-budget sequence packing under the pinned partition-parallel
    greedy spec (golden = independent sequential recompute)."""
    from spider_ray.ops.packing import pack_sequences

    return pack_sequences(_docs(sf_dir), budget=256, n_parts=8)


def q_lang_quantiles(sf_dir: str):
    """Exact per-language p50/p90/p99 of doc length via the histogram fold
    (shuffle moves only (lang, n_chars, count) rows — quantile_disc rank
    semantics, rank = ceil(q*n))."""
    from spider_ray.ops.corpusstats import group_quantiles

    return group_quantiles(_docs(sf_dir), group_col="lang", value_col="n_chars")


def q_top_terms_per_lang(sf_dir: str):
    """Per-language top-10 terms (combiner partials -> one vocab-bounded
    shuffle -> per-group top-k), ties on the term string."""
    from spider_ray.ops.corpusstats import top_terms_per_group

    return top_terms_per_group(_docs(sf_dir), group_col="lang", k=10)


def q_posting_lists(sf_dir: str):
    """Inverted index: per term df + first-100 sorted doc ids (posting
    capped so stopword-frequency terms stay bounded)."""
    from spider_ray.ops.corpusstats import posting_lists

    return posting_lists(_docs(sf_dir), max_ids=100)


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag docs sharing any word 3-gram with
    the deterministic eval split (doc_id % 97 == 0); benchmark gram set is
    broadcast once via ray.put."""
    from spider_ray.ops.corpusstats import decontaminate

    return decontaminate(_docs(sf_dir), n=3, bench_mod=97)


def q_distinct_users_kmv(sf_dir: str):
    """KMV (k-minimum-values) distinct-user sketch per event type —
    deterministic Knuth-multiplicative hash so the SQL oracle replays the
    estimator exactly; combiner partials keep the shuffle at <= k hashes
    per (batch, group)."""
    import ray.data

    from spider_ray.ops.sketch import kmv_distinct

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    return kmv_distinct(ev, group_col="event_type", key_col="user_id", k=64)


def q_rolling_user_sums(sf_dir: str):
    """Per-user rolling 3-row window sum in integer cents (the SQL ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW frame), one groupby(user) shuffle."""
    import ray.data

    from spider_ray.ops.windows import rolling_user_sums

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return rolling_user_sums(ev, window_rows=3)


def q_dataset_split(sf_dir: str):
    """Deterministic 80/10/10 train/val/test assignment (Knuth hash mod
    100) — shuffle-free per-row map, SQL-replayable membership."""
    from spider_ray.ops.sampling import dataset_split

    return dataset_split(_docs(sf_dir), pct=(80, 10))


def q_class_balance(sf_dir: str):
    """Deterministic class balancing to the minority-lang size: per-lang
    keep the lowest-(hash, doc_id) rows; one (lang, doc_id) shuffle."""
    from spider_ray.ops.sampling import class_balance

    return class_balance(_docs(sf_dir), class_col="lang", key_col="doc_id")


def q_length_rank(sf_dir: str):
    """ROW_NUMBER window primitive: per-lang rank by (n_chars DESC, doc_id)
    — one 3-column groupby(lang) shuffle."""
    from spider_ray.ops.corpusstats import group_rank

    return group_rank(_docs(sf_dir))


def q_kmv_users_per_day(sf_dir: str):
    """Windowed KMV distinct-user sketch per UTC day — same estimator
    contract as distinct_users_kmv, composed with the day bucket."""
    import ray.data

    from spider_ray.ops.sketch import kmv_users_per_day

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return kmv_users_per_day(ev, k=64)


def q_value_outliers(sf_dir: str):
    """Tukey 1.5-IQR outlier report per event type — exact integer
    quantile_disc fences, histogram-fold shuffle only."""
    import ray.data

    from spider_ray.ops.behavior import value_outliers

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    return value_outliers(ev)


def q_top_users_per_day(sf_dir: str):
    """Windowed top-k contributors: per-batch count combiner, one slim
    (day,user) fold, per-day rank."""
    import ray.data

    from spider_ray.ops.behavior import top_users_per_day

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    return top_users_per_day(ev, k=3)


def q_near_dup_canonical(sf_dir: str):
    """Keep-longest canonical doc per near-dup cluster (ties -> lowest
    doc_id); slim filtered length pass + driver argmax over the tiny
    cluster set."""
    from spider_ray.ops.dedup import near_dup_canonical

    return near_dup_canonical(_docs(sf_dir), threshold=0.5)


def q_lang_confusion(sf_dir: str):
    """Metadata-lang vs LangId-heuristic confusion matrix — per-batch
    Counter combiner, one tiny (lang, pred) groupby."""
    from spider_ray.ops.textstats import lang_confusion

    return lang_confusion(_docs(sf_dir))


def q_host_lang_mix(sf_dir: str):
    """Per-host language mix of the corpus — pruned 2-column read,
    count combiner, one slim fold."""
    from spider_ray.ops.textstats import host_lang_mix

    return host_lang_mix(_corpus_for(sf_dir))


def q_url_features(sf_dir: str):
    """URL-shape filtering signals (FineWeb/C4 URL heuristics) — pure
    Arrow kernels over the pruned url column, zero parse."""
    from spider_ray.ops.textstats import url_features

    return url_features(_corpus_for(sf_dir))


def q_robots_audit(sf_dir: str):
    """Per-host robots.txt compliance audit over the held corpus —
    broadcast robots dict, per-batch count combiner, one (host) groupby."""
    from spider_ray.ops.robotsaudit import robots_audit

    return robots_audit(_corpus_for(sf_dir))


def q_top_backlinks(sf_dir: str):
    """Top-100 most-linked URLs: parse combiner -> one (url,n) groupby ->
    sort+limit; driver holds exactly k rows."""
    from spider_ray.ops.linkgraph import top_backlinks

    return top_backlinks(_corpus_for(sf_dir))


def q_late_shipment_priority(sf_dir: str):
    """TPC-H Q12 shape: lineitem⋈orders lateness bands × order-priority
    CASE counts via one coarse hash(orderkey) co-group of slim rows."""
    import ray.data

    from spider_ray.ops.tpch2 import late_shipment_priority

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    ords = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    return late_shipment_priority(li, ords)


def q_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape: disjunctive OR-of-ANDs bracket predicate over a
    broadcast part dimension; single scan, integer-exact revenue."""
    import ray.data

    from spider_ray.ops.tpch2 import bracket_revenue, part_size_brand

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    return bracket_revenue(li, part_size_brand(sf_dir))


def q_bpe_token_counts(sf_dir: str):
    """GPT-2-style BPE pre-tokenizer counts per doc (stateless vectorized
    map; the pinned ASCII-class pattern evaluates identically in Python re
    and DuckDB RE2)."""
    from spider_ray.ops.textstats import bpe_token_counts

    return bpe_token_counts(_docs(sf_dir))


def q_incremental_curation(sf_dir: str):
    """End-to-end incremental curation cycle (the per-ingest production
    composition): fresh generation → exact dedup vs ingested reference →
    cross-generation MinHash near-dup drop (shared minhash_pairs golden)
    → C4 quality gate → exact-dedup canonicalization → resumable
    partitioned write → read-back from disk (pipelines/incremental.py)."""
    import shutil

    from spider_ray.pipelines.incremental import incremental_curation

    out = os.path.join("/tmp/spider_ray_scratch", f"inc_{_sf_name(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    return incremental_curation(_docs(sf_dir), out)


def q_warc_roundtrip(sf_dir: str):
    """WARC sink byte-layout proof (utils/warc.rs:1-120 analogue): write
    the corpus as per-block .warc files, parse the BYTES back, and emit
    per-record digests; the oracle computes the same digests from the
    corpus table, so a value match pins the record layout end to end."""
    from spider_ray.sinks.warc import warc_export_roundtrip

    out = os.path.join(
        "/tmp/spider_ray_scratch", f"warc_{_sf_name(sf_dir)}"
    )
    return warc_export_roundtrip(_corpus_for(sf_dir), out)


def q_download_manifest(sf_dir: str):
    """DOWNLOAD sink manifest (build_folders.rs:84-120 path construction):
    one-site download of www.site0.example with digests of the bytes
    written; paths are host-less per the reference CLI, hence the single
    host."""
    import pyarrow.compute as pc

    from spider_ray.sinks.download import download_pages

    dest = os.path.join(
        "/tmp/spider_ray_scratch", f"dl_{_sf_name(sf_dir)}"
    )
    import shutil

    shutil.rmtree(dest, ignore_errors=True)
    m = download_pages(
        _corpus_for(sf_dir), dest, url_prefix="https://www.site0.example/"
    )
    rel = pc.utf8_slice_codeunits(
        m.column("path"), start=len(dest) + 1, stop=1 << 30
    )
    return pa.table(
        {
            "url": m.column("url"),
            "rel_path": rel,
            "n_bytes": m.column("n_bytes"),
            "payload_md5": m.column("payload_md5"),
        }
    )


def q_host_hits(sf_dir: str):
    """Kleinberg HITS over the host link graph — distributed edge
    aggregation, one pinned-order remote kernel (host_pagerank's shape)."""
    from spider_ray.ops.linkgraph import host_hits

    return host_hits(_corpus_for(sf_dir))


def q_embedding_pca(sf_dir: str):
    """Distributed PCA over the embeddings table — integer-moment
    covariance combiner (order-free), eigh + pinned sign on the driver."""
    import ray.data

    from spider_ray.ops.cluster import embedding_pca

    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return embedding_pca(emb)


def q_dsir_weights(sf_dir: str):
    """DSIR hashed-n-gram importance weights toward the lang='en' slice
    (Xie et al. 2023) — bounded B=10^4 bucket-count shuffle + broadcast
    quantized log-ratio vector; exact int64 weights."""
    from spider_ray.ops.dsir import dsir_weights

    return dsir_weights(_docs(sf_dir))


def q_host_cap(sf_dir: str):
    """Domain-cap sampling: first 5 URLs per host (FineWeb/Gopher domain
    balancing) — per-batch cap combiner, then one (host,url) groupby."""
    from spider_ray.ops.sampling import host_cap

    return host_cap(_corpus_for(sf_dir), cap=5)


def q_repetition_stats(sf_dir: str):
    """Gopher-style within-doc repetition signal: total vs duplicate word
    bigram occurrences, all-integer, shuffle-free per-row map."""
    from spider_ray.ops.corpusstats import repetition_stats

    return repetition_stats(_docs(sf_dir))


def q_sliding_events(sf_dir: str):
    """Sliding-window (1h window, 15min step) event counts — bounded flat
    expansion + per-batch combiner, one (window, type) shuffle."""
    import ray.data

    from spider_ray.ops.windows import sliding_window_counts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    return sliding_window_counts(ev, width_s=3600, step_s=900)


def q_concurrent_sessions(sf_dir: str):
    """Sessions active per hour window — the interval-overlap join expressed
    as a bounded flat expansion + one groupby(window) shuffle."""
    import ray.data

    from spider_ray.ops.windows import concurrent_sessions

    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    return concurrent_sessions(ev, gap_s=1800, width_s=3600)


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped pruned-read aggregate over lineitem (integer
    price-cents space end-to-end)."""
    import ray.data

    from spider_ray.ops.relational import pricing_summary

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    return pricing_summary(li, ship_cutoff="1998-09-01")


def q_top_customers(sf_dir: str):
    """Per-customer order rollup joined to the customer dimension via the
    broadcast-join operator (small side shipped once through the object
    store, pyarrow hash join per batch)."""
    import pyarrow.parquet as pq
    import ray.data

    from spider_ray.ops.relational import broadcast_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_custkey": batch.column("o_custkey"),
                "n_orders": pa.nulls(len(batch), pa.int64()).fill_null(1),
                "total_cents": pc.cast(
                    pc.round(pc.multiply(batch.column("o_totalprice"), 100.0)), pa.int64()
                ),
            }
        )
        return (
            t.group_by(["o_custkey"])
            .aggregate([("n_orders", "sum"), ("total_cents", "sum")])
            .rename_columns(["o_custkey", "n_orders", "total_cents"])
        )

    agg = orders.map_batches(partial, batch_format="pyarrow")
    rolled = agg.groupby("o_custkey").sum(["n_orders", "total_cents"])
    rolled = rolled.map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "n_orders": pc.cast(b.column("sum(n_orders)"), pa.int64()),
                "total_cents": pc.cast(b.column("sum(total_cents)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey", "c_name"]
    )
    joined = broadcast_join(rolled, cust, keys="o_custkey", right_keys="c_custkey")
    return joined.map_batches(
        lambda b: b.select(["o_custkey", "c_name", "n_orders", "total_cents"]),
        batch_format="pyarrow",
    )


def q_tfidf_top_terms(sf_dir: str):
    """Top-5 tf·idf terms per doc (corpus DF via combiner + one shuffle,
    broadcast df map, per-doc scoring; golden = sequential recompute)."""
    from spider_ray.ops.tfidf import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=5)


def q_order_revenue(sf_dir: str):
    """Big×big hash-shuffle join (Ray Data native Dataset.join) + rollup."""
    import ray.data

    from spider_ray.ops.relational import order_priority_revenue

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    return order_priority_revenue(li, orders, num_partitions=8)


def q_tumbling_events(sf_dir: str):
    """Tumbling-window (1h) event rollup: per-batch combiner then one
    groupby shuffle of partials; integer-cents sums for distributed-order
    determinism."""
    import ray.data

    from spider_ray.ops.windows import tumbling_window_counts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    return tumbling_window_counts(ev, width_s=3600)


def q_sessionize(sf_dir: str):
    """Gap-based (30 min) sessionization: groupby(user_id).map_groups with
    in-group (ts, event_id) sort."""
    import ray.data

    from spider_ray.ops.windows import sessionize

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id"]
    )
    return sessionize(ev, gap_s=1800)


def q_event_asof(sf_dir: str):
    """As-of join: per purchase event, the same user's latest view event at
    or before it (vectorized pre-filter -> one groupby(user) shuffle ->
    searchsorted resolve; oracle = DuckDB ASOF LEFT JOIN)."""
    import ray.data

    from spider_ray.ops.windows import asof_join_events

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return asof_join_events(ev, left_type="purchase", right_type="view")


def q_boilerplate(sf_dir: str):
    """Per-host boilerplate line removal over the fixture web corpus
    (distinct-lines-per-page combiner -> one (host, line) shuffle ->
    broadcast strip pass; oracle = pure SQL over the same Parquet)."""
    from spider_ray.ops.textclean import host_boilerplate_removal

    return host_boilerplate_removal(_corpus_for(sf_dir), min_pages=2, pct=10)


def q_top_k_similarity(sf_dir: str):
    from spider_ray.ops.similarity import brute_force_top_k

    emb = _emb(sf_dir)
    queries = np.array(
        [r["embedding"] for r in emb.sort("vec_id").limit(5).take_all()], dtype=np.float64
    )
    out = brute_force_top_k(emb, queries, k=10)  # pyarrow.Table
    return out.select(["query_id", "vec_id", "rank"])


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup pairs (exact, recall 1.0): block-pair
    task fan-out — one remote task per unordered block pair, no
    whole-matrix broadcast; SQL oracle is the full self-join."""
    from spider_ray.ops.similarity import cosine_near_dup

    return cosine_near_dup(_emb(sf_dir), threshold=0.4)


def q_minhash_pairs(sf_dir: str):
    from spider_ray.ops.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir), threshold=0.5).select_columns(["doc_a", "doc_b"])


def q_simhash_near_dup(sf_dir: str):
    """SimHash near-dup pairs with hamming ≤ 3: banded 4×16-bit blocking
    (exact by pigeonhole at this radius), signature travels with the band
    rows so verify is an in-group XOR-popcount — no joins, no driver
    state.  Oracle = independent sequential recompute golden."""
    from spider_ray.ops.dedup import simhash_near_dup

    return simhash_near_dup(_docs(sf_dir), max_hamming=3)


def q_dedup_against_ref(sf_dir: str):
    """Incremental exact dedup: pages of every non-site0 host whose text
    does not already appear on www.site0.example (the "reference corpus")
    — the drop-what's-already-ingested pass of a continuously-crawled
    corpus (``ops/dedup.dedup_against_corpus``: slim ref hashes + anti
    semi-join, auto broadcast/cogroup)."""
    import pyarrow.compute as pc
    import ray.data

    from spider_ray.ops.dedup import dedup_against_corpus
    from spider_ray.ops.textclean import _corpus_page_filter, _hosts_of

    pages = ray.data.read_parquet(_corpus_for(sf_dir), columns=["url", "text"])

    def side(want_ref: bool):
        def split(b):
            b = _corpus_page_filter(b)
            if len(b) == 0:
                return b
            m = pc.equal(_hosts_of(b.column("url")), "www.site0.example")
            return b.filter(m if want_ref else pc.invert(m))

        return pages.map_batches(split, batch_format="pyarrow")

    return dedup_against_corpus(side(False), side(True), column="text").select_columns(
        ["url"]
    )


def q_ngram_jaccard(sf_dir: str):
    """n-gram (character-shingle) Jaccard near-dup pairs WITH the exact
    similarity score: LSH blocking + distributed shingle-join verify
    (``ops/dedup.minhash_dedup``), exposing the verified ``jaccard`` value
    per pair.  Oracle = sequential recompute golden (same blocking spec,
    identical integer-ratio float64)."""
    from spider_ray.ops.dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir), threshold=0.5).select_columns(
        ["doc_a", "doc_b", "jaccard"]
    )


def q_near_dup_clusters(sf_dir: str):
    """Connected components over the verified MinHash near-dup pair graph
    (cluster_id = min doc_id of the component)."""
    from spider_ray.ops.dedup import near_dup_clusters

    return near_dup_clusters(_docs(sf_dir), threshold=0.5)


def q_near_dup_clusters_lp(sf_dir: str):
    """Distributed twin of ``near_dup_clusters``: hash-to-min label
    propagation over the verified pair graph (labels ⋈ pairs join +
    groupby-min per round, zero driver-side graph state) — the scale path
    for pair lists that outgrow one process.  Oracle = the same sequential
    union-find golden (identical output by construction)."""
    from spider_ray.ops.dedup import near_dup_clusters_labelprop

    return near_dup_clusters_labelprop(_docs(sf_dir), threshold=0.5)


def q_quality_scores(sf_dir: str):
    from spider_ray.ops.textstats import QualityScorer

    return _docs(sf_dir).map_batches(QualityScorer(), batch_format="pyarrow")


def q_lsh_ann(sf_dir: str):
    """Hyperplane-LSH bucketed ANN top-k (approximate scale path; the golden
    is the independent sequential recompute of the same pinned spec)."""
    from spider_ray.ops.similarity import lsh_top_k

    emb = _emb(sf_dir)
    queries = np.array(
        [r["embedding"] for r in emb.sort("vec_id").limit(5).take_all()], dtype=np.float64
    )
    out = lsh_top_k(emb, queries, k=10, n_planes=8)
    return out.select(["query_id", "vec_id", "rank"])


def q_ivf_ann(sf_dir: str):
    """IVF-bucketed ANN top-k (deterministic training-free coarse quantizer;
    golden = independent sequential recompute of the pinned spec)."""
    from spider_ray.ops.similarity import ivf_top_k

    emb = _emb(sf_dir)
    queries = np.array(
        [r["embedding"] for r in emb.sort("vec_id").limit(5).take_all()], dtype=np.float64
    )
    out = ivf_top_k(emb, queries, k=10, n_cells=16, nprobe=4)
    return out.select(["query_id", "vec_id", "rank"])


def q_token_percentiles(sf_dir: str):
    """Within-source percentile ranks via a bounded histogram fold +
    broadcast cumulative table + vectorized searchsorted (no per-doc
    shuffle, no window sort)."""
    from spider_ray.ops.corpusstats import token_percentiles

    return token_percentiles(_docs(sf_dir))


def q_near_dup_incremental(sf_dir: str):
    """Incremental NEAR-dup vs the ingested generation (fuzzy sibling of
    dedup_against_corpus): minhash_dedup pair spec over the union, fresh
    docs with a confirmed cross-generation pair dropped via the 3-tier
    anti semi-join."""
    from spider_ray.ops.dedup import near_dup_against_corpus

    return near_dup_against_corpus(_docs(sf_dir), threshold=0.5)


def q_source_overlap(sf_dir: str):
    """Cross-source n-gram contamination matrix: distinct (gram, source)
    partials -> one hash(gram) co-group -> length-vectorized per-gram
    pair generation -> <= C(sources,2)-row fold."""
    from spider_ray.ops.corpusstats import source_overlap

    return source_overlap(_docs(sf_dir), n=3)


def q_weighted_sample(sf_dir: str):
    """Efraimidis-Spirakis weight-proportional sample without replacement
    (RNG-free reproducible uniforms, per-block top-k partials, O(blocks*k)
    driver fold)."""
    from spider_ray.ops.sampling import weighted_sample_k

    return weighted_sample_k(_docs(sf_dir), k=100)


def q_temperature_mix(sf_dir: str):
    """Temperature-weighted source mixing (α-sampling): integer-exact
    per-source epoch weights from one slim count fold, then the
    source_mix row-local expansion."""
    from spider_ray.ops.sampling import temperature_mix

    return temperature_mix(
        _docs(sf_dir).select_columns(["doc_id", "source"]),
        alpha=0.5, budget=5000,
    )


def q_knn_graph(sf_dir: str):
    """EXACT k-NN graph via block-pair task fan-out + one coarse
    hash(vec_id) top-k co-group; round-6 similarity is the op spec (the
    precision at which DuckDB's list_cosine_similarity over DOUBLE casts
    agrees bit-for-bit with the numpy GEMM — pure-SQL oracle)."""
    from spider_ray.ops.similarity import knn_graph

    return knn_graph(_emb(sf_dir), k=5)


def q_pq_ann(sf_dir: str):
    """Product-quantization ADC top-k (codes, not floats, at scan time —
    the memory-side ANN scale path; golden = independent sequential
    recompute of the pinned spec)."""
    from spider_ray.ops.similarity import pq_top_k

    emb = _emb(sf_dir)
    queries = np.array(
        [r["embedding"] for r in emb.sort("vec_id").limit(5).take_all()],
        dtype=np.float64,
    )
    return pq_top_k(emb, queries, k=10, m=4, nbits=4)


def q_simhash(sf_dir: str):
    from spider_ray.ops.dedup import simhash_signatures

    return simhash_signatures(_docs(sf_dir))


def q_lang_id(sf_dir: str):
    from spider_ray.ops.textstats import LangId

    out = _docs(sf_dir).map_batches(LangId(), batch_format="pyarrow")
    return out.groupby("lang_pred").count().map_batches(
        lambda b: pa.table(
            {"lang_pred": b.column("lang_pred"), "n": pc.cast(b.column("count()"), pa.int64())}
        ),
        batch_format="pyarrow",
    )


def q_js_challenge_report(sf_dir: str):
    """Anti-bot JS-challenge interstitial detector over the corpus
    (website.rs:860-906 is_safe_javascript_challenge + the pinned vendor
    phrase table) as a per-vendor count report — stable 3-row output,
    zeros included.  The UTF-8-validity gate is SQL-inexpressible
    (DuckDB decode() aborts on the corpus's Shift_JIS rows), so the
    oracle scans hex-encoded bytes with even-offset anchoring; the
    validity gate itself is pinned by the 1:1 pytest port
    (test_js_challenge.py)."""
    from spider_ray.functions.js_challenge import js_challenge_report

    return js_challenge_report(_corpus_for(sf_dir))


def q_needs_js(sf_dir: str):
    """JS-dependence sniff over the fixture web corpus (page.rs:1840-1877
    pattern tables; golden = independent regex-alternation recompute)."""
    import ray.data

    from spider_ray.functions.needs_js import NeedsJsStage

    ds = ray.data.read_parquet(_corpus_for(sf_dir), columns=["url", "html"])
    return ds.map_batches(NeedsJsStage(), batch_format="pyarrow")


def q_link_graph(sf_dir: str):
    """Host-pair link-graph edges over the fixture web corpus (distributed
    parse → per-batch combiner → multi-key groupby)."""
    from spider_ray.ops.linkgraph import host_link_edges

    return host_link_edges(_corpus_for(sf_dir))


def q_host_degrees(sf_dir: str):
    from spider_ray.ops.linkgraph import host_degrees

    return host_degrees(_corpus_for(sf_dir))


def q_host_pagerank(sf_dir: str):
    from spider_ray.ops.linkgraph import host_pagerank

    return host_pagerank(_corpus_for(sf_dir))


def q_host_components(sf_dir: str):
    """Connected components of the host graph: hash-to-min label
    propagation, one join + one groupby-min per round, distributed
    convergence check (golden = sequential union-find)."""
    from spider_ray.ops.linkgraph import host_components

    return host_components(_corpus_for(sf_dir))


def q_fingerprints(sf_dir: str):
    from spider_ray.ops.textstats import Fingerprinter

    out = _docs(sf_dir).map_batches(Fingerprinter(), batch_format="pyarrow")
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "doc_hash": b.column("doc_hash"),
                "n_fingerprints": pa.array([len(x) for x in b.column("fingerprint").to_pylist()], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_multimodal_decode(sf_dir: str):
    """Fake-codec image metadata extraction (deterministic payloads derived
    from doc ids — the Ray-side plumbing is real, the codec is the stub)."""
    import ray.data

    from spider_ray.ops.multimodal import ImageDecode, fake_image

    ids = list(range(64))
    items = pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "data": pa.array([fake_image(i, 8 + i % 8, 4 + i % 4) for i in ids], pa.binary()),
        }
    )
    ds = ray.data.from_arrow(items)
    return ds.map_batches(ImageDecode(), batch_format="pyarrow", batch_size=16)


def q_multimodal_audio(sf_dir: str):
    """Fake-codec audio metadata extraction (deterministic PCM payloads;
    real soundfile path used when the library is importable)."""
    import ray.data

    from spider_ray.ops.multimodal import AudioDecode, fake_audio

    ids = list(range(48))
    items = pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "data": pa.array(
                [fake_audio(i, 8000 + (i % 4) * 4000, 1000 + i * 37) for i in ids],
                pa.binary(),
            ),
        }
    )
    ds = ray.data.from_arrow(items)
    return ds.map_batches(AudioDecode(), batch_format="pyarrow", batch_size=16)


def q_multimodal_frames(sf_dir: str):
    """Video frame-sample (flat-map: 1 video row → N frame rows) chained
    into per-frame image decode — stride-2 sampling of fake-codec videos."""
    import ray.data

    from spider_ray.ops.multimodal import FrameSampler, ImageDecode, fake_image, fake_video

    ids = list(range(24))
    vids = []
    for i in ids:
        frames = [fake_image(i * 100 + j, 8 + (i + j) % 8, 4 + (i + j) % 4)
                  for j in range(3 + i % 5)]
        vids.append(fake_video(frames))
    items = pa.table(
        {"item_id": pa.array(ids, pa.int64()), "data": pa.array(vids, pa.binary())}
    )
    dec = ImageDecode()

    def decode_frames(batch: pa.Table) -> pa.Table:
        meta = dec(batch)
        return meta.add_column(1, "frame_index", batch.column("frame_index"))

    ds = ray.data.from_arrow(items)
    frames = ds.map_batches(FrameSampler(stride=2), batch_format="pyarrow", batch_size=8)
    out = frames.map_batches(decode_frames, batch_format="pyarrow", batch_size=32)
    return out.map_batches(
        lambda b: b.select(["item_id", "frame_index", "width", "height", "mean_luma"]),
        batch_format="pyarrow",
    )


def q_dup_ngram_spans(sf_dir: str):
    """Exact-substring dedup, n-gram form (Lee et al. 2021): corpus-wide
    duplicated k-token windows merged into per-doc spans — two bounded
    shuffles, no driver state (golden = sequential recompute)."""
    from spider_ray.ops.spans import dup_ngram_spans

    return dup_ngram_spans(_docs(sf_dir))


def q_remove_dup_spans(sf_dir: str):
    """Symmetric duplicate-span removal: cleaned text with every
    corpus-duplicated k-gram span dropped (span rows co-grouped with doc
    rows by doc_id — union + groupby, no join, no driver state)."""
    from spider_ray.ops.spans import remove_dup_spans

    return remove_dup_spans(_docs(sf_dir))


def q_kmeans_clusters(sf_dir: str):
    """Deterministic streaming k-means (Lloyd's, integer-quantized partial
    sums; golden = sequential numpy recompute of the pinned spec)."""
    from spider_ray.ops.cluster import kmeans_assign

    return kmeans_assign(_emb(sf_dir))


def q_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): greedy semantic dedup within k-means
    clusters; pairwise work never leaves a cluster group."""
    from spider_ray.ops.cluster import semdedup

    return semdedup(_emb(sf_dir))


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid sums (prototype/class-mean building
    block): integer-quantized per-batch partials, one (label, dim)
    groupby — batch-boundary-proof."""
    from spider_ray.ops.cluster import label_centroids

    return label_centroids(_emb(sf_dir))


def q_user_features(sf_dir: str):
    """Event-log -> per-user feature matrix (pivoted type counts, value
    totals, first/last seen): per-batch combiner, one groupby(user)."""
    import ray.data

    from spider_ray.ops.features import user_features

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value", "ts"],
    )
    return user_features(ev)


def q_unigram_logprob(sf_dir: str):
    """Corpus unigram LM -> per-doc log-prob (perplexity-proxy quality
    score); broadcast dict pruned to repeated terms (hapax elision)."""
    from spider_ray.ops.textstats import unigram_logprob

    return unigram_logprob(_docs(sf_dir))


def q_perplexity_buckets(sf_dir: str):
    """CCNet-style head/middle/tail quality buckets per language: docs
    ranked within their language by per-token unigram log-prob (IEEE
    double quotient of the pinned int64 spec — bit-identical across
    engines), split by exact SQL ntile semantics; ONE slim co-group +
    ONE slim sort + ordered-prefix rank assignment (no doc row on the
    driver)."""
    from spider_ray.ops.textstats import perplexity_buckets

    return perplexity_buckets(_docs(sf_dir))


def q_bigram_logprob(sf_dir: str):
    """Order-1 (bigram) conditional log-prob per doc: one tagged count
    shuffle, repeated-items-only broadcast (hapax elision)."""
    from spider_ray.ops.textstats import bigram_logprob

    return bigram_logprob(_docs(sf_dir))


def q_heuristic_filter(sf_dir: str):
    """C4-style doc-level heuristic filter (length / repetition gates),
    integer-exact, shuffle-free."""
    from spider_ray.ops.textstats import heuristic_filter

    return heuristic_filter(_docs(sf_dir))


def q_interval_join(sf_dir: str):
    """Non-equi range join (signup -> purchases within the hour): bucketed
    replication (factor 2), two bounded shuffles, LEFT semantics without a
    join — the attribution-window shape Ray Data has no primitive for."""
    import ray.data

    from spider_ray.ops.intervals import interval_join_counts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"],
    )
    return interval_join_counts(ev, window_s=3600)


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(day, event_type) via tagged-union partials — all
    three grouping-set levels from one shuffle of combiner output."""
    import ray.data

    from spider_ray.ops.relational import events_rollup

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    return events_rollup(ev)


MIX_WEIGHTS_X100 = {"src0": 250, "src1": 0, "src2": 130, "src3": 300}


def q_source_mix(sf_dir: str):
    """Training-mixture construction: weighted per-source doc repetition
    (integer-hundredth epochs, Knuth-hash fractional membership) —
    shuffle-free row-local expansion."""
    from spider_ray.ops.sampling import source_mix

    return source_mix(_docs(sf_dir), MIX_WEIGHTS_X100)


def q_line_dedup(sf_dir: str):
    """Corpus-global exact line (paragraph) dedup, first occurrence by
    (url, idx) wins — RefinedWeb-style hygiene: explode -> groupby(line)
    losers -> tagged co-group rebuild; two bounded shuffles, no joins."""
    from spider_ray.ops.linededup import global_line_dedup

    return global_line_dedup(_corpus_for(sf_dir))


def q_line_dedup_partitioned(sf_dir: str):
    """Fused resumable-layout tier of global_line_dedup (r5): each rebuild
    task atomically lands its input shard as file_id=<N>/part.parquet
    before returning; rows here are read BACK from the landed files, so
    the oracle match proves the fused write (the incremental_curation
    pattern — no second materialization of the corpus text)."""
    import glob as _glob
    import shutil

    import ray.data

    from spider_ray.ops.linededup import global_line_dedup

    out = os.path.join("/tmp/spider_ray_scratch", f"lded_{_sf_name(sf_dir)}")
    shutil.rmtree(out, ignore_errors=True)
    global_line_dedup(_corpus_for(sf_dir), out_dir=out).materialize()
    files = sorted(_glob.glob(os.path.join(out, "*", "part.parquet")))
    # drop the hive-inferred file_id partition column: the contract is the
    # line_dedup schema, read back from disk
    return ray.data.read_parquet(files).select_columns(
        ["url", "n_lines", "n_removed", "clean_text"]
    )


def q_normalize_text(sf_dir: str):
    """CCNet-style pre-dedup normalization (lowercase, digits->0,
    whitespace-run collapse, trim) — pure Arrow RE2 kernels."""
    from spider_ray.ops.linededup import normalize_pages

    return normalize_pages(_corpus_for(sf_dir))


def q_chunk_documents(sf_dir: str):
    """Token-window chunking (64-token windows, stride 48): shuffle-free
    row-local flat expansion — the context-length splitter between
    curation and sequence packing."""
    from spider_ray.ops.chunking import chunk_documents

    return chunk_documents(_docs(sf_dir), chunk_tokens=64, stride=48)


def q_global_sample(sf_dir: str):
    """Exactly-k deterministic global sample: k smallest (knuth(id), id) —
    per-batch combiner prunes to k candidates before the tiny sort."""
    from spider_ray.ops.sampling import global_sample_k

    return global_sample_k(_docs(sf_dir), k=100)


def q_length_trim(sf_dir: str):
    """Per-lang percentile band filter (p5..p95 of n_chars,
    quantile_disc rank semantics): histogram fold -> broadcast edges."""
    from spider_ray.ops.corpusstats import length_trim

    return length_trim(_docs(sf_dir), q_lo=0.05, q_hi=0.95)


BM25_QUERY_TERMS = ("sort", "hash", "join", "scan", "window")


def q_bm25_scores(sf_dir: str):
    """BM25 relevance of every doc against a fixed query-term set —
    integer-exact per-term contributions (round(w*1e6) half-away), stats
    fold broadcast once."""
    from spider_ray.ops.bm25 import bm25_scores

    return bm25_scores(_docs(sf_dir), BM25_QUERY_TERMS)


def q_anchor_terms(sf_dir: str):
    """Anchor-text aggregation per link target (top-10 terms by count):
    combiner partials -> one bounded (target, term) shuffle -> per-target
    rank; golden = sequential page-loop recompute of the pinned spec."""
    from spider_ray.ops.anchors import anchor_text_terms

    return anchor_text_terms(_corpus_for(sf_dir), k=10)


def q_token_entropy(sf_dir: str):
    """Per-doc token Shannon entropy (integer-exact per-term rounding) —
    doc-local, shuffle-free curation signal."""
    from spider_ray.ops.entropy import token_entropy

    return token_entropy(_docs(sf_dir))


def q_revenue_forecast(sf_dir: str):
    """TPC-H-Q6-shaped pruned-read filter + scalar integer aggregate."""
    import ray.data

    from spider_ray.ops.relational import revenue_forecast

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    return revenue_forecast(li)


def q_shipping_priority(sf_dir: str):
    """TPC-H-Q3-shaped 3-table pipeline: segment semi-join -> big×big
    Dataset.join -> (orderkey, date) rollup -> deterministic top-10."""
    import ray.data

    from spider_ray.ops.relational import shipping_priority

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    return shipping_priority(li, orders, cust, num_partitions=8)


def q_funnel_counts(sf_dir: str):
    """Ordered conversion funnel (view -> signup -> purchase, 24 h windows):
    slim 3-type rows take ONE coarse hash(user) shuffle; each of 64
    partitions folds with C++ group_by/join/filter chains — no per-user
    Python anywhere."""
    import ray.data

    from spider_ray.ops.behavior import funnel_counts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    return funnel_counts(ev)


def q_retention_cohorts(sf_dir: str):
    """Retention triangle (cohort day × active-day offset × users): batch
    dedup to distinct (user, day), one coarse user-hash shuffle, Arrow-only
    per-partition fold."""
    import ray.data

    from spider_ray.ops.behavior import retention_cohorts

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return retention_cohorts(ev)


def q_order_priority_check(sf_dir: str):
    """TPC-H-Q4-shaped EXISTS semi-join of two fact tables: lineitem
    reduces to distinct qualifying orderkeys, auto broadcast/cogroup
    semi-join, priority rollup — only int64 keys and partials shuffle."""
    import ray.data

    from spider_ray.ops.relational import order_priority_check

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )
    return order_priority_check(orders, li)


def q_customer_distribution(sf_dir: str):
    """TPC-H-Q13-shaped LEFT OUTER count distribution without a join
    operator: tagged slim partials, one coarse custkey shuffle, per-part
    C++ fold (zero-order customers included exactly)."""
    import ray.data

    from spider_ray.ops.relational import customer_order_distribution

    cust = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )
    return customer_order_distribution(cust, orders)


def q_regional_revenue(sf_dir: str):
    """TPC-H-Q5-shaped broadcast dimension chain: supplier⋈nation⋈region
    joined once driver-side, broadcast once; the fact table never
    shuffles — per-batch C++ join + integer partials only."""
    import ray.data

    from spider_ray.ops.relational import regional_revenue, supplier_nation_dims

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    return regional_revenue(li, supplier_nation_dims(sf_dir, region="ASIA"))


def q_event_transitions(sf_dir: str):
    """Event-type Markov transition counts (consecutive pairs per user in
    (ts, event_id) order): one coarse user-hash shuffle, one Arrow sort +
    numpy boundary mask per partition."""
    import ray.data

    from spider_ray.ops.behavior import event_transitions

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return event_transitions(ev)


def q_rolling_active_users(sf_dir: str):
    """DAU + trailing-7-day distinct WAU per day: rolling DISTINCT via the
    bounded window-end expansion (≤7× slim rows), user-hash partitions so
    partial counts sum without double-counting."""
    import ray.data

    from spider_ray.ops.behavior import rolling_active_users

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    return rolling_active_users(ev)


def q_promo_revenue(sf_dir: str):
    """TPC-H-Q14-shaped promo revenue share per ship month: part dimension
    broadcast once, integer promo/total revenue pair per month (the share
    stays an exact integer ratio)."""
    import ray.data

    from spider_ray.ops.relational import part_promo_dims, promo_revenue

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    return promo_revenue(li, part_promo_dims(sf_dir))


def q_small_qty_revenue(sf_dir: str):
    """TPC-H-Q17-shaped correlated per-part average: two fact passes with
    the per-part aggregate broadcast between them; the avg predicate is a
    cross-multiplied integer comparison (division-free, SQL-exact)."""
    import ray.data

    from spider_ray.ops.tpch2 import brand_partkeys, small_qty_revenue

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    return small_qty_revenue(li, brand_partkeys(sf_dir))


def q_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped HAVING on a fact aggregate: slim (orderkey, qty)
    combiner→groupby, rare winners broadcast back as a semi-join to the
    orders stream, customer dim joined only to survivors."""
    import ray.data

    from spider_ray.ops.tpch2 import customer_names, large_orders

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    return large_orders(li, orders, customer_names(sf_dir))


def q_top_returned_customers(sf_dir: str):
    """TPC-H-Q10-shaped big×big co-group + top-k: returned-item revenue
    attaches to custkeys via one coarse hash(orderkey) shuffle of ≤16-byte
    rows; customer/nation dims join only against the 20 winners."""
    import ray.data

    from spider_ray.ops.tpch2 import customer_nation_dims, top_returned_customers

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    return top_returned_customers(li, orders, customer_nation_dims(sf_dir))


def q_dormant_customers(sf_dir: str):
    """TPC-H-Q22-shaped global-scalar broadcast + ANTI semi-join: exact
    integer above-average-balance predicate (cross-multiplied), recent
    orderers reduced to distinct custkeys, bloom/set anti filter."""
    import ray.data

    from spider_ray.ops.tpch2 import dormant_customers

    customer = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )
    return dormant_customers(customer, orders)


def q_top_supplier(sf_dir: str):
    """TPC-H-Q15-shaped aggregate→global-max with ties kept: per-block
    partial maxima fold on the driver (O(blocks) rows), tie-keeping
    filter + broadcast supplier-name join."""
    import ray.data

    from spider_ray.ops.tpch2 import supplier_names, top_supplier

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    return top_supplier(li, supplier_names(sf_dir))


def q_nation_trade_volume(sf_dir: str):
    """TPC-H-Q7-shaped 3-table big×big chain as TWO coarse slim co-groups
    (orders⋈customer by custkey, then lineitem⋈that by orderkey); the
    25-nation dim broadcasts, nothing wider than ~24 bytes shuffles."""
    import ray.data

    from spider_ray.ops.tpch2 import (
        customer_nation_map,
        nation_trade_volume,
        supplier_nation_map,
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    return nation_trade_volume(
        li, orders, customer_nation_map(sf_dir), supplier_nation_map(sf_dir)
    )


def q_brand_revenue_share(sf_dir: str):
    """TPC-H-Q11-shaped group total vs broadcast global total: per-brand
    integer revenue with the partkey→brand dim broadcast, integer
    basis-point share (floor division, SQL-exact)."""
    import ray.data

    from spider_ray.ops.tpch2 import brand_revenue_share, part_brand_map

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    return brand_revenue_share(li, part_brand_map(sf_dir))


def q_supplier_part_counts(sf_dir: str):
    """TPC-H-Q16-shaped COUNT(DISTINCT) with NOT-IN exclusion: in-batch
    dedup of slim (brand, band, suppkey) triples, one coarse
    hash(suppkey) shuffle, per-partition distinct fold."""
    import ray.data

    from spider_ray.ops.tpch2 import (
        negative_balance_suppliers,
        part_class_map,
        supplier_part_counts,
    )

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )
    return supplier_part_counts(
        li, part_class_map(sf_dir), negative_balance_suppliers(sf_dir)
    )


def q_interarrival_quantiles(sf_dir: str):
    """Exact per-event-type quantiles of same-(user,type) inter-arrival
    gaps: one coarse hash(user) shuffle, vectorized in-partition sort+diff,
    gap-histogram fold (quantile_disc rank rule)."""
    import ray.data

    from spider_ray.ops.windows import interarrival_quantiles

    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return interarrival_quantiles(events)


def q_zipf_slope(sf_dir: str):
    """Zipf rank-frequency slope over the corpus's top-1000 terms:
    combiner→groupby term counts, bounded top-k fold, driver regression
    (the tail vocabulary never reaches the driver)."""
    import ray.data

    from spider_ray.ops.ngrams import zipf_slope

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )
    return zipf_slope(docs)


def q_host_triangles(sf_dir: str):
    """Exact triangle count on the undirected host graph via distributed
    degree-orientation (wedge generation bounded by O(√m) out-degree,
    wedge∩edge co-group); oracle = SQL joins over the link-graph golden."""
    from spider_ray.ops.linkgraph import host_triangles

    return host_triangles(_corpus_for(sf_dir))


def q_host_kcore(sf_dir: str):
    """k-core decomposition of the host graph: memoized edge aggregation →
    one remote vectorized-peel kernel (integer-exact; golden = independent
    Matula–Beck implementation)."""
    from spider_ray.ops.linkgraph import host_kcore

    return host_kcore(_corpus_for(sf_dir))


def q_host_ppr(sf_dir: str):
    """Personalized PageRank from the smallest source host (teleport +
    dangling mass to the seed), pinned accumulation order like
    host_pagerank; golden = sequential pinned-order replay."""
    from spider_ray.ops.linkgraph import host_ppr

    return host_ppr(_corpus_for(sf_dir))


def q_daily_revenue_anomaly(sf_dir: str):
    """Day-over-trailing-baseline anomaly: fact rows fold to per-day
    integer partials, the trailing-window compare runs over the
    calendar-bounded day aggregate (aggregate-then-window)."""
    import ray.data

    from spider_ray.ops.relational import daily_revenue_anomaly

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )
    return daily_revenue_anomaly(orders)


def q_host_cocitation(sf_dir: str):
    """Bipartite co-occurrence projection: top-50 co-cited host pairs via
    one groupby(dst) with a hub cap (part of the spec, applied in both
    engines) bounding per-group pair fan-out; SQL self-join oracle over
    the link-graph golden."""
    from spider_ray.ops.linkgraph import host_cocitation

    return host_cocitation(_corpus_for(sf_dir))


def q_token_budget_trim(sf_dir: str):
    """Distributed ordered prefix sum (scan): per-source token-budget gate
    kept exact by (bucket totals → driver exclusive prefixes → broadcast →
    per-bucket vectorized gate); driver state O(sources × buckets)."""
    import ray.data

    from spider_ray.ops.sampling import token_budget_trim

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    return token_budget_trim(docs)


def q_event_trigrams(sf_dir: str):
    """Top-20 3-event user journeys: coarse user shuffle, vectorized
    in-partition sort + boundary masks, slim (trigram, n) partials."""
    import ray.data

    from spider_ray.ops.behavior import event_trigrams

    events = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    return event_trigrams(events)


def q_latest_shipper_orders(sf_dir: str):
    """TPC-H-Q21-shaped per-order EXISTS analysis on one fact table: the
    supplier with the lexicographically greatest (shipdate, suppkey) of
    each multi-supplier order; combiner → one coarse hash(orderkey)
    co-group, vectorized boundary resolve, slim (suppkey, n) rollup."""
    import ray.data

    from spider_ray.ops.tpch2 import latest_shipper_orders, supplier_names

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    return latest_shipper_orders(li, supplier_names(sf_dir))


def q_host_reciprocity(sf_dir: str):
    """Directed host-graph reciprocity without a self-join: distinct
    directed pairs fold to unordered-pair orientation counts (a count of
    2 = mutual); oracle = SQL over the link-graph golden."""
    from spider_ray.ops.linkgraph import host_reciprocity

    return host_reciprocity(_corpus_for(sf_dir))


def q_kcenter_coreset(sf_dir: str):
    """Greedy k-center (farthest-point) coreset over the embedding table:
    k streaming passes, each folding a per-block (min round-9 best-sim,
    id) candidate against the broadcast center matrix; golden =
    sequential farthest-point recompute of the same pinned spec."""
    import ray.data

    from spider_ray.ops.cluster import kcenter_coreset

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    return kcenter_coreset(emb)


def q_quality_by_source(sf_dir: str):
    """Per-source Gopher-gate keep report (exact integer share pair):
    gate stats + per-source collapse inside one actor-pool batch pass,
    one |sources|-sized groupby — text never shuffles."""
    import ray.data

    from spider_ray.ops.textclean import quality_by_source

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return quality_by_source(docs)


def q_best_line_per_order(sf_dir: str):
    """Per-group argmax row (dedup-keep-best) as a plain associative max:
    (revenue, tiebreak) packed into one int64, per-batch combiner, one
    slim shuffle — no join-back pass."""
    import ray.data

    from spider_ray.ops.relational import best_line_per_order

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    return best_line_per_order(li)


def q_session_stats(sf_dir: str):
    """Composition shape: sessionize -> exact histogram-fold quantiles
    (quantile_disc semantics) -> one-row global session statistics.
    Only (value, count) histogram rows shuffle."""
    import ray.data

    from spider_ray.ops.windows import session_stats

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id"],
    )
    return session_stats(ev)


def q_props_stats(sf_dir: str):
    """Semi-structured JSON property extraction (events.props -> $.k):
    decode once per row in-batch, collapse to (type, k) partials before
    anything shuffles — raw JSON strings never leave the read."""
    import ray.data

    from spider_ray.ops.semistruct import props_stats

    ev = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )
    return props_stats(ev)


def q_heavy_hitters(sf_dir: str):
    """Exact φ=1/5000 heavy-hitter trigrams via mergeable Misra-Gries
    summaries (64-way tree merge, bounded driver fold) + broadcast
    candidate recount — the tail vocabulary never shuffles."""
    from spider_ray.ops.heavyhitters import heavy_hitter_ngrams

    return heavy_hitter_ngrams(_docs(sf_dir), n=3, inv_phi=5000, capacity=8192)


def entry() -> Any:
    """Flagship: full crawl of the sf0.001-scale synthetic web corpus."""
    from spider_ray.config import CrawlConfig, CrawlJob
    from spider_ray.fixtures import ensure_scale, seed_of
    from spider_ray.pipelines.crawl import crawl

    corpus = ensure_scale("sf0.001")
    job = CrawlJob((seed_of(0),), CrawlConfig(normalize=True))
    res = crawl(job, corpus)
    return res.pages_table().drop_columns(["links"]).to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    from spider_ray.fixtures import ensure_scale
    from spider_ray.goldens import ensure_goldens

    ensure_scale("sf0.01")  # materialize before any oracle SQL runs
    ensure_goldens("sf0.01")  # sequential-oracle goldens for the crawl/ops queries
    return {
        "crawl_plain": q_crawl_plain,
        "crawl_pages": q_crawl_pages,
        "crawl_budget": q_crawl_budget,
        "crawl_robots": q_crawl_robots,
        "crawl_dedup": q_crawl_dedup,
        "crawl_multihost": q_crawl_multihost,
        "crawl_streaming": q_crawl_streaming,
        "crawl_redirect_strict": q_crawl_redirect_strict,
        "crawl_seed_redirect": q_crawl_seed_redirect,
        "crawl_hooks": q_crawl_hooks,
        "crawl_content_gate": q_crawl_content_gate,
        "crawl_regex_filters": q_crawl_regex_filters,
        "crawl_path_budget": q_crawl_path_budget,
        "crawl_subdomains": q_crawl_subdomains,
        "crawl_extra_links": q_crawl_extra_links,
        "crawl_sitemap": q_crawl_sitemap,
        "crawl_sitemap_auto": q_crawl_sitemap_auto,
        "crawl_retry": q_crawl_retry,
        "crawl_queue": q_crawl_queue,
        "recrawl_diff": q_recrawl_diff,
        "extract_text_parity": q_extract_text_parity,
        "scrape_markdown": q_scrape_markdown,
        "scrape_commonmark": q_scrape_commonmark,
        "scrape_xml": q_scrape_xml,
        "host_page_counts": q_host_page_counts,
        "host_cap": q_host_cap,
        "dsir_weights": q_dsir_weights,
        "embedding_pca": q_embedding_pca,
        "host_hits": q_host_hits,
        "top_backlinks": q_top_backlinks,
        "robots_audit": q_robots_audit,
        "late_shipment_priority": q_late_shipment_priority,
        "bracket_revenue": q_bracket_revenue,
        "bpe_token_counts": q_bpe_token_counts,
        "incremental_curation": q_incremental_curation,
        "warc_roundtrip": q_warc_roundtrip,
        "download_manifest": q_download_manifest,
        "url_features": q_url_features,
        "host_lang_mix": q_host_lang_mix,
        "lang_confusion": q_lang_confusion,
        "near_dup_canonical": q_near_dup_canonical,
        "top_users_per_day": q_top_users_per_day,
        "value_outliers": q_value_outliers,
        "kmv_users_per_day": q_kmv_users_per_day,
        "exact_dedup": q_exact_dedup,
        "token_stats": q_token_stats,
        "docs_by_lang": q_docs_by_lang,
        "events_by_type": q_events_by_type,
        "docs_by_source": q_docs_by_source,
        "events_per_day": q_events_per_day,
        "tumbling_events": q_tumbling_events,
        "sessionize": q_sessionize,
        "event_asof": q_event_asof,
        "boilerplate_removal": q_boilerplate,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "order_revenue": q_order_revenue,
        "tfidf_top_terms": q_tfidf_top_terms,
        "pii_scrub": q_pii_scrub,
        "gopher_quality": q_gopher_quality,
        "stratified_sample": q_stratified_sample,
        "shard_shuffle": q_shard_shuffle,
        "curate_corpus": q_curate_corpus,
        "bigram_topk": q_bigram_topk,
        "sequence_packing": q_sequence_packing,
        "lang_quantiles": q_lang_quantiles,
        "top_terms_per_lang": q_top_terms_per_lang,
        "posting_lists": q_posting_lists,
        "decontaminate": q_decontaminate,
        "distinct_users_kmv": q_distinct_users_kmv,
        "rolling_user_sums": q_rolling_user_sums,
        "concurrent_sessions": q_concurrent_sessions,
        "sliding_events": q_sliding_events,
        "repetition_stats": q_repetition_stats,
        "length_rank": q_length_rank,
        "dataset_split": q_dataset_split,
        "class_balance": q_class_balance,
        "top_k_similarity": q_top_k_similarity,
        "embedding_near_dup": q_embedding_near_dup,
        "minhash_pairs": q_minhash_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_against_ref": q_dedup_against_ref,
        "simhash_near_dup": q_simhash_near_dup,
        "near_dup_clusters": q_near_dup_clusters,
        "near_dup_clusters_lp": q_near_dup_clusters_lp,
        "quality_scores": q_quality_scores,
        "lsh_ann": q_lsh_ann,
        "ivf_ann": q_ivf_ann,
        "pq_ann": q_pq_ann,
        "knn_graph": q_knn_graph,
        "temperature_mix": q_temperature_mix,
        "weighted_sample": q_weighted_sample,
        "source_overlap": q_source_overlap,
        "near_dup_incremental": q_near_dup_incremental,
        "token_percentiles": q_token_percentiles,
        "simhash": q_simhash,
        "lang_id": q_lang_id,
        "fingerprints": q_fingerprints,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_frames": q_multimodal_frames,
        "dup_ngram_spans": q_dup_ngram_spans,
        "remove_dup_spans": q_remove_dup_spans,
        "kmeans_clusters": q_kmeans_clusters,
        "semdedup": q_semdedup,
        "label_centroids": q_label_centroids,
        "user_features": q_user_features,
        "unigram_logprob": q_unigram_logprob,
        "perplexity_buckets": q_perplexity_buckets,
        "bigram_logprob": q_bigram_logprob,
        "heuristic_filter": q_heuristic_filter,
        "interval_join": q_interval_join,
        "events_rollup": q_events_rollup,
        "source_mix": q_source_mix,
        "line_dedup": q_line_dedup,
        "line_dedup_partitioned": q_line_dedup_partitioned,
        "normalize_text": q_normalize_text,
        "chunk_documents": q_chunk_documents,
        "global_sample": q_global_sample,
        "length_trim": q_length_trim,
        "bm25_scores": q_bm25_scores,
        "token_entropy": q_token_entropy,
        "anchor_terms": q_anchor_terms,
        "revenue_forecast": q_revenue_forecast,
        "shipping_priority": q_shipping_priority,
        "funnel_counts": q_funnel_counts,
        "retention_cohorts": q_retention_cohorts,
        "order_priority_check": q_order_priority_check,
        "customer_distribution": q_customer_distribution,
        "regional_revenue": q_regional_revenue,
        "heavy_hitters": q_heavy_hitters,
        "event_transitions": q_event_transitions,
        "rolling_active_users": q_rolling_active_users,
        "promo_revenue": q_promo_revenue,
        "small_qty_revenue": q_small_qty_revenue,
        "large_orders": q_large_orders,
        "top_returned_customers": q_top_returned_customers,
        "dormant_customers": q_dormant_customers,
        "top_supplier": q_top_supplier,
        "nation_trade_volume": q_nation_trade_volume,
        "brand_revenue_share": q_brand_revenue_share,
        "supplier_part_counts": q_supplier_part_counts,
        "interarrival_quantiles": q_interarrival_quantiles,
        "zipf_slope": q_zipf_slope,
        "host_triangles": q_host_triangles,
        "kcenter_coreset": q_kcenter_coreset,
        "latest_shipper_orders": q_latest_shipper_orders,
        "token_budget_trim": q_token_budget_trim,
        "host_kcore": q_host_kcore,
        "host_ppr": q_host_ppr,
        "host_cocitation": q_host_cocitation,
        "daily_revenue_anomaly": q_daily_revenue_anomaly,
        "event_trigrams": q_event_trigrams,
        "host_reciprocity": q_host_reciprocity,
        "props_stats": q_props_stats,
        "session_stats": q_session_stats,
        "best_line_per_order": q_best_line_per_order,
        "quality_by_source": q_quality_by_source,
        "needs_js": q_needs_js,
        "js_challenge_report": q_js_challenge_report,
        "link_graph": q_link_graph,
        "host_degrees": q_host_degrees,
        "host_pagerank": q_host_pagerank,
        "host_components": q_host_components,
    }


def oracle_sql() -> dict[str, str]:
    from spider_ray.goldens import ensure_goldens, golden_sql

    ensure_goldens("sf0.01")
    corpus_glob = f"{SF001_CORPUS}/*/*.parquet"
    from spider_ray.goldens import golden_path

    oracles = {
        **golden_sql("sf0.01"),
        # the labelprop twin converges to the identical (doc_id, cluster_id)
        # table as the union-find, so it shares the golden
        "kmv_users_per_day": (
            "WITH h AS (SELECT DISTINCT (epoch_us(ts) // 86400000000) * 86400 AS day, "
            "((user_id * 2654435761) % 4294967296) + 1 AS hv FROM events), "
            "r AS (SELECT day, hv, "
            "row_number() OVER (PARTITION BY day ORDER BY hv) AS rk, "
            "count(*) OVER (PARTITION BY day) AS n FROM h) "
            "SELECT day, "
            "(CASE WHEN max(n) < 64 THEN max(n) "
            "ELSE (63 * 4294967296) // max(CASE WHEN rk = 64 THEN hv END) END)::BIGINT "
            "AS n_distinct_est FROM r GROUP BY day"
        ),
        "value_outliers": (
            "WITH c AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents "
            "FROM events WHERE value IS NOT NULL), "
            "q AS (SELECT event_type, quantile_disc(cents, 0.25) AS q1, "
            "quantile_disc(cents, 0.75) AS q3, count(*)::BIGINT AS n FROM c GROUP BY 1) "
            "SELECT q.event_type, q.n, q.q1 AS q1_cents, q.q3 AS q3_cents, "
            "(SELECT count(*) FROM c WHERE c.event_type = q.event_type AND "
            "(2 * c.cents < 2 * q.q1 - 3 * (q.q3 - q.q1) OR "
            "2 * c.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)))::BIGINT AS n_outliers "
            "FROM q"
        ),
        "top_users_per_day": (
            "WITH c AS (SELECT (epoch_us(ts) // 86400000000) * 86400 AS day, "
            "user_id, count(*)::BIGINT AS n FROM events GROUP BY 1, 2), "
            "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY day "
            "ORDER BY n DESC, user_id) AS rn FROM c) "
            "SELECT day, user_id, n, rn::BIGINT AS rank FROM r WHERE rn <= 3"
        ),
        "near_dup_canonical": (
            "WITH m AS (SELECT g.cluster_id, d.doc_id, "
            "ROW_NUMBER() OVER (PARTITION BY g.cluster_id "
            "ORDER BY length(d.text) DESC, d.doc_id) AS rn, "
            "COUNT(*) OVER (PARTITION BY g.cluster_id) AS n_members "
            f"FROM read_parquet('{golden_path('sf0.01', 'near_dup_clusters')}') g "
            "JOIN documents d USING (doc_id)) "
            "SELECT cluster_id, doc_id AS canonical_doc_id, "
            "n_members::BIGINT AS n_members, (n_members - 1)::BIGINT AS n_dropped "
            "FROM m WHERE rn = 1"
        ),
        "near_dup_clusters_lp": (
            f"SELECT * FROM read_parquet('{golden_path('sf0.01', 'near_dup_clusters')}')"
        ),
        "dedup_against_ref": (
            f"SELECT a.url FROM read_parquet('{corpus_glob}') a "
            "WHERE split_part(split_part(a.url, '://', 2), '/', 1) <> 'www.site0.example' "
            "AND a.text IS NOT NULL "
            "AND a.url NOT LIKE '%robots.txt' AND a.url NOT LIKE '%sitemap.xml' "
            "AND NOT EXISTS ("
            f"SELECT 1 FROM read_parquet('{corpus_glob}') b "
            "WHERE split_part(split_part(b.url, '://', 2), '/', 1) = 'www.site0.example' "
            "AND b.text IS NOT NULL "
            "AND b.url NOT LIKE '%robots.txt' AND b.url NOT LIKE '%sitemap.xml' "
            "AND b.text = a.text)"
        ),
        "extract_text_parity": (
            f"SELECT url, text FROM read_parquet('{corpus_glob}') "
            "WHERE url NOT LIKE '%robots.txt' AND url NOT LIKE '%sitemap.xml'"
        ),
        "token_percentiles": (
            r"WITH t AS (SELECT doc_id, source, "
            r"length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT "
            r"AS n_tokens FROM documents), "
            "r AS (SELECT doc_id, source, n_tokens, "
            "rank() OVER (PARTITION BY source ORDER BY n_tokens) AS rk, "
            "count(*) OVER (PARTITION BY source) AS n FROM t) "
            "SELECT doc_id, source, n_tokens, "
            "((rk - 1) * 1000000 // n)::BIGINT AS pct_x1e6 FROM r"
        ),
        "near_dup_incremental": (
            f"WITH pairs AS (SELECT * FROM "
            f"read_parquet('{golden_path('sf0.01', 'minhash_pairs')}')), "
            "drops AS (SELECT doc_b AS d FROM pairs "
            "WHERE doc_b % 2 = 1 AND doc_a % 2 = 0 "
            "UNION SELECT doc_a FROM pairs "
            "WHERE doc_a % 2 = 1 AND doc_b % 2 = 0) "
            "SELECT doc_id, source FROM documents "
            "WHERE doc_id % 2 = 1 AND doc_id NOT IN (SELECT d FROM drops)"
        ),
        "source_overlap": (
            r"WITH words AS (SELECT source, "
            r"regexp_extract_all(lower(coalesce(text, '')), '\S+') AS w "
            r"FROM documents), "
            r"grams AS (SELECT DISTINCT source, unnest(list_transform("
            r"generate_series(1, greatest(len(w)-2, 0)), "
            r"i -> array_to_string(w[i:i+2], ' '))) AS g FROM words) "
            "SELECT a.source AS source_a, b.source AS source_b, "
            "count(*)::BIGINT AS n_shared "
            "FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source "
            "GROUP BY 1, 2"
        ),
        "weighted_sample": (
            r"WITH t AS (SELECT doc_id, "
            r"length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT "
            r"AS n_tokens FROM documents), "
            "k AS (SELECT doc_id, n_tokens, "
            "power(((doc_id * 2654435761) % 4294967296 + 1) / 4294967297.0, "
            "1.0 / greatest(n_tokens, 1)) AS ky FROM t) "
            "SELECT doc_id, n_tokens, "
            "row_number() OVER (ORDER BY ky DESC, doc_id ASC) AS rank "
            "FROM k ORDER BY ky DESC, doc_id ASC LIMIT 100"
        ),
        "temperature_mix": (
            "WITH n AS (SELECT source, count(*)::BIGINT AS n "
            "FROM documents GROUP BY 1), "
            "a AS (SELECT source, n, "
            "CAST(round(power(n, 0.5) * 1e6) AS BIGINT) AS am FROM n), "
            "s AS (SELECT sum(am)::BIGINT AS tot FROM a), "
            "w AS (SELECT source, "
            "((5000::BIGINT * am * 100) // (tot * n))::BIGINT AS wx "
            "FROM a, s), "
            "c AS (SELECT d.doc_id, d.source, (wx // 100) + "
            "(CASE WHEN (d.doc_id * 2654435761) % 4294967296 < "
            "((wx % 100) * 4294967296) // 100 THEN 1 ELSE 0 END) AS nrep "
            "FROM documents d JOIN w USING (source)) "
            "SELECT doc_id, source, "
            "unnest(generate_series(0, (nrep - 1)::INT))::BIGINT AS copy_id "
            "FROM c WHERE nrep > 0"
        ),
        "knn_graph": (
            "WITH s AS (SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]), 6) AS c "
            "FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id), "
            "r AS (SELECT vec_id, neighbor_id, c, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY c DESC, neighbor_id) AS rk FROM s) "
            "SELECT vec_id, neighbor_id, rk AS rank, "
            "CAST(round(c * 1e6) AS BIGINT) AS sim_x1e6 FROM r WHERE rk <= 5"
        ),
        "late_shipment_priority": (
            "SELECT CASE "
            "WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) <= 2592000000000 "
            "THEN 'on_time' "
            "WHEN epoch_us(l_shipdate) - epoch_us(o_orderdate) <= 5184000000000 "
            "THEN 'late' ELSE 'very_late' END AS lateness_band, "
            "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END)::BIGINT AS high_line_count, "
            "sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END)::BIGINT AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1"
        ),
        "bracket_revenue": (
            "SELECT count(*)::BIGINT AS n_items, "
            "coalesce(sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "(100 - CAST(round(l_discount * 100) AS BIGINT))), 0)::BIGINT "
            "AS revenue_cents_x100 "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey "
            "WHERE (p.p_brand = 'Brand#12' AND p.p_size <= 5 "
            "AND l.l_quantity BETWEEN 1 AND 11) "
            "OR (p.p_brand = 'Brand#23' AND p.p_size <= 10 "
            "AND l.l_quantity BETWEEN 10 AND 20) "
            "OR (p.p_brand = 'Brand#34' AND p.p_size <= 15 "
            "AND l.l_quantity BETWEEN 20 AND 30)"
        ),
        "bpe_token_counts": (
            r"WITH t AS (SELECT doc_id, "
            r"length(regexp_extract_all(coalesce(text, ''), "
            r"$$'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+$$"
            r"))::BIGINT AS n_pre, "
            r"length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_ws "
            r"FROM documents) "
            "SELECT doc_id, n_pre AS n_pretokens, n_ws AS n_ws_tokens, "
            "CASE WHEN n_ws = 0 THEN 0 ELSE (n_pre * 1000) // n_ws END "
            "AS pretokens_per_ws_token_x1000 FROM t"
        ),
        "incremental_curation": (
            r"WITH ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0), "
            r"fresh AS (SELECT * FROM documents WHERE doc_id % 2 = 1), "
            f"pairs AS (SELECT * FROM "
            f"read_parquet('{golden_path('sf0.01', 'minhash_pairs')}')), "
            "ndrops AS (SELECT doc_b AS d FROM pairs "
            "WHERE doc_b % 2 = 1 AND doc_a % 2 = 0 "
            "UNION SELECT doc_a FROM pairs "
            "WHERE doc_a % 2 = 1 AND doc_b % 2 = 0), "
            r"nodup AS (SELECT f.* FROM fresh f WHERE NOT EXISTS "
            r"(SELECT 1 FROM ref r WHERE coalesce(r.text, '') = coalesce(f.text, '')) "
            r"AND f.doc_id NOT IN (SELECT d FROM ndrops)), "
            r"tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(coalesce(text, '')), '\S+')) AS term FROM nodup), "
            r"c AS (SELECT doc_id, term, count(*)::BIGINT AS n FROM tok GROUP BY 1, 2), "
            r"agg AS (SELECT doc_id, sum(n) AS nw, count(*) AS nd, max(n) AS mx FROM c GROUP BY 1), "
            r"q AS (SELECT d.* FROM nodup d JOIN agg a USING (doc_id) "
            r"WHERE a.nw BETWEEN 10 AND 100000 AND 2*a.nd >= a.nw AND 8*a.mx <= a.nw), "
            r"canon AS (SELECT * FROM q WHERE doc_id IN "
            r"(SELECT min(doc_id) FROM q GROUP BY coalesce(text, ''))) "
            r"SELECT doc_id, source, "
            r"length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS n_tokens "
            r"FROM canon"
        ),
        "js_challenge_report": (
            # bytes are scanned HEX-ENCODED with an even-offset anchor
            # ('^(..)*' — to_hex doubles every byte, so an aligned match
            # is exactly a byte-level substring hit); decode() would
            # abort on the corpus's invalid-UTF-8 rows.  Leftmost-phrase
            # vendor attribution, pattern order breaking position ties.
            "WITH p AS (SELECT to_hex(html) AS h "
            f"FROM read_parquet('{corpus_glob}') "
            "WHERE html IS NOT NULL AND octet_length(html) BETWEEN 1 AND 10000), "
            "pats AS (SELECT to_hex('Enable JavaScript and cookies to continue'::BLOB) AS p1, "
            "to_hex('To continue, please enable JavaScript in your browser settings'::BLOB) AS p2, "
            "to_hex('Please enable JavaScript to view the page content'::BLOB) AS p3), "
            "hits AS (SELECT "
            "CASE WHEN regexp_matches(h, '^(..)*' || p1) THEN "
            "length(regexp_extract(h, '^((?:..)*?)' || p1, 1)) // 2 END AS q1, "
            "CASE WHEN regexp_matches(h, '^(..)*' || p2) THEN "
            "length(regexp_extract(h, '^((?:..)*?)' || p2, 1)) // 2 END AS q2, "
            "CASE WHEN regexp_matches(h, '^(..)*' || p3) THEN "
            "length(regexp_extract(h, '^((?:..)*?)' || p3, 1)) // 2 END AS q3 "
            "FROM p, pats), "
            "best AS (SELECT CASE "
            "WHEN q1 IS NOT NULL AND (q2 IS NULL OR q1 <= q2) "
            "AND (q3 IS NULL OR q1 <= q3) THEN 'cloudflare' "
            "WHEN q2 IS NOT NULL AND (q3 IS NULL OR q2 <= q3) THEN 'akamai_f5' "
            "WHEN q3 IS NOT NULL THEN 'aws_waf' END AS vendor FROM hits "
            "WHERE q1 IS NOT NULL OR q2 IS NOT NULL OR q3 IS NOT NULL) "
            "SELECT v.vendor, count(b.vendor)::BIGINT AS n_pages "
            "FROM (VALUES ('cloudflare'), ('akamai_f5'), ('aws_waf')) v(vendor) "
            "LEFT JOIN best b USING (vendor) GROUP BY 1"
        ),
        "warc_roundtrip": (
            "SELECT url, "
            "strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ') AS warc_date, "
            "status::BIGINT AS http_status, "
            "octet_length(coalesce(html, ''::BLOB))::BIGINT AS content_length, "
            "md5(base64(coalesce(html, ''::BLOB))) AS payload_md5 "
            f"FROM read_parquet('{corpus_glob}')"
        ),
        "download_manifest": (
            "WITH p AS (SELECT url, html, "
            "CASE WHEN regexp_replace(url, '^[a-z]+://[^/]+', '') = '' THEN '/' "
            "ELSE regexp_replace(url, '^[a-z]+://[^/]+', '') END AS path "
            f"FROM read_parquet('{corpus_glob}') "
            "WHERE html IS NOT NULL AND url LIKE 'https://www.site0.example/%'), "
            "s AS (SELECT url, html, path, "
            "list_filter(string_split(path, '/'), x -> x <> '') AS segs, "
            "path LIKE '%/' AS trail FROM p) "
            "SELECT url, "
            "CASE WHEN len(segs) = 0 THEN 'index.html' "
            "ELSE array_to_string(list_slice(segs, 1, len(segs) - 1) || "
            "[CASE WHEN trail OR strpos(segs[len(segs)], '.') = 0 "
            "THEN segs[len(segs)] || '.html' ELSE segs[len(segs)] END], '/') "
            "END AS rel_path, "
            "octet_length(html)::BIGINT AS n_bytes, "
            "md5(base64(html)) AS payload_md5 FROM s"
        ),
        "host_page_counts": (
            f"SELECT split_part(split_part(url, '://', 2), '/', 1) AS host, "
            f"count(*)::BIGINT AS n_pages FROM read_parquet('{corpus_glob}') GROUP BY 1"
        ),
        "host_lang_mix": (
            "SELECT split_part(split_part(url, '://', 2), '/', 1) AS host, lang, "
            f"count(*)::BIGINT AS n_pages FROM read_parquet('{corpus_glob}') "
            "GROUP BY 1, 2"
        ),
        "url_features": (
            "SELECT url, length(url)::BIGINT AS url_len, "
            "(length(url) - length(replace(url, '/', '')))::BIGINT AS n_slash, "
            "(CASE WHEN contains(url, '?') THEN "
            "length(url) - length(replace(url, '&', '')) + 1 ELSE 0 END)::BIGINT "
            "AS n_query_params, "
            "(length(url) - length(regexp_replace(url, '[0-9]', '', 'g')))::BIGINT "
            f"AS n_digits FROM read_parquet('{corpus_glob}')"
        ),
        "host_cap": (
            "SELECT host, url, rank FROM ("
            "SELECT split_part(split_part(url, '://', 2), '/', 1) AS host, url, "
            "ROW_NUMBER() OVER (PARTITION BY split_part(split_part(url, '://', 2), '/', 1) "
            f"ORDER BY url)::BIGINT AS rank FROM read_parquet('{corpus_glob}')"
            ") WHERE rank <= 5"
        ),
        "exact_dedup": (
            "SELECT min(doc_id) AS doc_id, count(*)::BIGINT AS dup_count "
            "FROM documents GROUP BY text"
        ),
        "token_stats": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars, "
            "length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_tokens FROM documents"
        ),
        "docs_by_lang": "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang",
        "events_by_type": (
            "SELECT event_type, count(*)::BIGINT AS n_events, max(user_id)::BIGINT AS max_user_id "
            "FROM events GROUP BY event_type"
        ),
        "docs_by_source": "SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source",
        "events_per_day": (
            "SELECT date_trunc('day', ts) AS day, count(*)::BIGINT AS n_events "
            "FROM events GROUP BY 1"
        ),
        "pricing_summary": (
            "SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n_rows, "
            "sum(CAST(round(l_quantity) AS BIGINT))::BIGINT AS sum_qty, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT))::BIGINT AS sum_base_cents, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT AS sum_disc_x10000, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)) * "
            "(100 + CAST(round(l_tax*100) AS BIGINT)))::BIGINT AS sum_charge_x1e6 "
            "FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-09-01' GROUP BY 1, 2"
        ),
        "order_revenue": (
            "SELECT o_orderpriority, count(*)::BIGINT AS n_items, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT AS revenue_x10000 "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "GROUP BY o_orderpriority"
        ),
        "top_customers": (
            "SELECT o_custkey, c_name, count(*)::BIGINT AS n_orders, "
            "sum(CAST(round(o_totalprice*100) AS BIGINT))::BIGINT AS total_cents "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY o_custkey, c_name"
        ),
        "pii_scrub": (
            r"WITH pii AS (SELECT doc_id, "
            r"text || ' contact user' || doc_id || '@example.com or http://ex.com/p?q=' || doc_id || "
            r"' from 10.0.' || (doc_id % 256) || '.1' AS t FROM documents) "
            r"SELECT doc_id, "
            r"length(regexp_extract_all(t, 'https?://[^ \t\n]+'))::BIGINT AS n_urls, "
            r"length(regexp_extract_all(regexp_replace(t, 'https?://[^ \t\n]+', '<URL>', 'g'), "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+'))::BIGINT AS n_emails, "
            r"length(regexp_extract_all(regexp_replace(regexp_replace(t, 'https?://[^ \t\n]+', '<URL>', 'g'), "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'), "
            r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))::BIGINT AS n_ips, "
            r"length(regexp_replace(regexp_replace(regexp_replace(t, "
            r"'https?://[^ \t\n]+', '<URL>', 'g'), "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', '<EMAIL>', 'g'), "
            r"'\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'))::BIGINT AS clean_len "
            r"FROM pii"
        ),
        "gopher_quality": (
            r"SELECT doc_id, "
            r"length(regexp_extract_all(text, '\S+'))::BIGINT AS n_words, "
            r"length(regexp_replace(text, '\s', '', 'g'))::BIGINT AS n_word_chars, "
            r"len(list_filter(regexp_extract_all(lower(text), '\S+'), "
            r"x -> x IN ('the','a','of','to','and','in','is','that','for','on')))::BIGINT AS n_stop, "
            r"(n_words BETWEEN 50 AND 100000 AND 3*n_words <= n_word_chars "
            r"AND n_word_chars <= 10*n_words AND n_stop >= 2 AND 100*n_stop >= 6*n_words) AS keep "
            r"FROM documents"
        ),
        "stratified_sample": (
            "SELECT doc_id, lang FROM documents "
            "WHERE (doc_id * 2654435761) % 4294967296 < "
            "CASE lang WHEN 'en' THEN 2147483648 WHEN 'de' THEN 429496729 "
            "WHEN 'es' THEN 429496729 WHEN 'fr' THEN 429496729 "
            "WHEN 'zh' THEN 429496729 ELSE 0 END"
        ),
        "shard_shuffle": (
            "SELECT doc_id, "
            "((row_number() OVER (ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)) - 1) % 8 AS shard, "
            "(row_number() OVER (ORDER BY (doc_id * 2654435761) % 4294967296, doc_id)) - 1 AS pos "
            "FROM documents"
        ),
        "lang_quantiles": (
            "SELECT lang, quantile_disc(n_chars, 0.5)::BIGINT AS p50, "
            "quantile_disc(n_chars, 0.9)::BIGINT AS p90, "
            "quantile_disc(n_chars, 0.99)::BIGINT AS p99 "
            "FROM documents GROUP BY lang"
        ),
        "top_terms_per_lang": (
            r"WITH toks AS (SELECT lang, unnest(regexp_extract_all(lower(text), '\S+')) AS term "
            r"FROM documents), "
            r"cnt AS (SELECT lang, term, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2), "
            r"ranked AS (SELECT lang, term, n, "
            r"row_number() OVER (PARTITION BY lang ORDER BY n DESC, term ASC)::BIGINT AS rank "
            r"FROM cnt) "
            r"SELECT lang, term, n, rank FROM ranked WHERE rank <= 10"
        ),
        "posting_lists": (
            r"WITH pairs AS (SELECT DISTINCT doc_id, "
            r"unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents) "
            r"SELECT term, count(*)::BIGINT AS df, "
            r"array_to_string((list(doc_id ORDER BY doc_id))[1:100], ',') AS posting "
            r"FROM pairs GROUP BY term"
        ),
        "decontaminate": (
            r"WITH words AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w "
            r"FROM documents), "
            r"grams AS (SELECT doc_id, unnest(list_transform("
            r"generate_series(1, greatest(len(w)-2, 0)), i -> array_to_string(w[i:i+2], ' '))) AS g "
            r"FROM words), "
            r"bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0), "
            r"hits AS (SELECT DISTINCT gr.doc_id FROM grams gr JOIN bench USING (g) "
            r"WHERE gr.doc_id % 97 <> 0) "
            r"SELECT d.doc_id, (d.doc_id IN (SELECT doc_id FROM hits)) AS contaminated "
            r"FROM documents d WHERE d.doc_id % 97 <> 0"
        ),
        "length_rank": (
            "SELECT doc_id, lang, n_chars, "
            "row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)::BIGINT "
            "AS rank FROM documents"
        ),
        "dataset_split": (
            "SELECT doc_id, CASE "
            "WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 80 THEN 'train' "
            "WHEN ((doc_id * 2654435761) % 4294967296) % 100 < 90 THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "class_balance": (
            "WITH n AS (SELECT min(cnt) AS k FROM "
            "(SELECT count(*) AS cnt FROM documents GROUP BY lang)), "
            "ranked AS (SELECT doc_id, lang, row_number() OVER ("
            "PARTITION BY lang ORDER BY (doc_id * 2654435761) % 4294967296, doc_id"
            ") AS r FROM documents) "
            "SELECT doc_id, lang FROM ranked, n WHERE r <= n.k"
        ),
        "repetition_stats": (
            r"WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w "
            r"FROM documents), "
            r"b AS (SELECT doc_id, unnest(list_transform(list_zip(w[1:len(w)-1], w[2:len(w)]), "
            r"p -> p[1] || ' ' || p[2])) AS bg FROM w), "
            r"c AS (SELECT doc_id, bg, count(*) AS k FROM b GROUP BY 1, 2), "
            r"agg AS (SELECT doc_id, sum(k) AS n_bigrams, "
            r"sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS n_dup_bigrams FROM c GROUP BY doc_id) "
            r"SELECT d.doc_id, coalesce(a.n_bigrams, 0)::BIGINT AS n_bigrams, "
            r"coalesce(a.n_dup_bigrams, 0)::BIGINT AS n_dup_bigrams "
            r"FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "sliding_events": (
            "WITH x AS (SELECT event_type, "
            "(epoch_us(ts) // 900000000) * 900 - k.k * 900 AS window_start "
            "FROM events, unnest(generate_series(0, 3)) AS k(k)) "
            "SELECT window_start::BIGINT AS window_start, event_type, "
            "count(*)::BIGINT AS n_events FROM x GROUP BY 1, 2"
        ),
        "concurrent_sessions": (
            "WITH e AS ("
            "  SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
            "         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts_us, "
            "         sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END) "
            "           OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS grp "
            "  FROM e"
            "), sess AS ("
            "  SELECT user_id, grp, min(ts_us) AS start_us, max(ts_us) AS end_us "
            "  FROM s GROUP BY user_id, grp"
            ") "
            "SELECT (hb * 3600)::BIGINT AS window_start, count(*)::BIGINT AS n_sessions "
            "FROM sess, unnest(generate_series(start_us // 3600000000, end_us // 3600000000)) AS t(hb) "
            "GROUP BY 1"
        ),
        "distinct_users_kmv": (
            "WITH h AS (SELECT DISTINCT event_type, "
            "((user_id * 2654435761) % 4294967296) + 1 AS hv FROM events), "
            "r AS (SELECT event_type, hv, "
            "row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk, "
            "count(*) OVER (PARTITION BY event_type) AS n FROM h) "
            "SELECT event_type, "
            "(CASE WHEN max(n) < 64 THEN max(n) "
            "ELSE (63 * 4294967296) // max(CASE WHEN rk = 64 THEN hv END) END)::BIGINT "
            "AS n_distinct_est FROM r GROUP BY event_type"
        ),
        "rolling_user_sums": (
            "SELECT event_id, user_id, "
            "sum(CAST(round(value*100) AS BIGINT)) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)::BIGINT AS roll_cents "
            "FROM events"
        ),
        "bigram_topk": (
            r"WITH toks AS (SELECT regexp_extract_all(lower(text), '\S+') AS w FROM documents), "
            r"big AS (SELECT unnest(list_transform(list_zip(w[1:len(w)-1], w[2:len(w)]), "
            r"p -> p[1] || ' ' || p[2])) AS bigram FROM toks) "
            r"SELECT bigram, count(*)::BIGINT AS n FROM big "
            r"GROUP BY 1 ORDER BY n DESC, bigram ASC LIMIT 100"
        ),
        "tumbling_events": (
            "SELECT (epoch_us(ts) // 3600000000) * 3600 AS window_start, event_type, "
            "count(*)::BIGINT AS n_events, "
            "sum(CAST(round(value*100) AS BIGINT))::BIGINT AS sum_value_cents "
            "FROM events GROUP BY 1, 2"
        ),
        "sessionize": (
            "WITH e AS ("
            "  SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
            "         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev "
            "  FROM events"
            "), s AS ("
            "  SELECT user_id, ts_us, "
            "         sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000 THEN 1 ELSE 0 END) "
            "           OVER (PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS grp "
            "  FROM e"
            ") "
            "SELECT user_id, (grp-1)::BIGINT AS session_id, count(*)::BIGINT AS n_events, "
            "min(ts_us)::BIGINT AS start_us, max(ts_us)::BIGINT AS end_us "
            "FROM s GROUP BY user_id, grp"
        ),
        "event_asof": (
            "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), "
            "v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') "
            "SELECT p.event_id AS event_id, p.user_id AS user_id, epoch_us(p.ts) AS ts_us, "
            "v.event_id AS match_event_id, epoch_us(v.ts) AS match_ts_us, "
            "epoch_us(p.ts) - epoch_us(v.ts) AS gap_us "
            "FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND v.ts <= p.ts"
        ),
        "boilerplate_removal": (
            f"WITH pages AS ("
            f"  SELECT url, split_part(split_part(url, '://', 2), '/', 1) AS host, text "
            f"  FROM read_parquet('{corpus_glob}') "
            f"  WHERE text IS NOT NULL AND url NOT LIKE '%robots.txt' "
            f"    AND url NOT LIKE '%sitemap.xml'"
            f"), lines AS ("
            f"  SELECT url, host, unnest(string_split(text, chr(10))) AS line, "
            f"         generate_subscripts(string_split(text, chr(10)), 1) AS ord "
            f"  FROM pages"
            f"), counts AS ("
            f"  SELECT host, line, count(DISTINCT url) AS n_pages FROM lines GROUP BY 1, 2"
            f"), hosttot AS (SELECT host, count(*) AS n FROM pages GROUP BY 1"
            f"), boiler AS ("
            f"  SELECT counts.host AS host, line FROM counts JOIN hosttot USING (host) "
            f"  WHERE n_pages >= 2 AND n_pages * 100 >= 10 * n"
            f") "
            f"SELECT l.url, count(*)::BIGINT AS n_lines, count(b.line)::BIGINT AS n_removed, "
            f"string_agg(CASE WHEN b.line IS NULL THEN l.line END, chr(10) ORDER BY l.ord) AS clean_text "
            f"FROM lines l LEFT JOIN boiler b ON l.host = b.host AND l.line = b.line "
            f"GROUP BY l.url"
        ),
        "label_centroids": (
            "WITH x AS (SELECT label, unnest(embedding::DOUBLE[]) AS v, "
            "generate_subscripts(embedding, 1) AS dim FROM embeddings) "
            "SELECT label::BIGINT AS label, dim::BIGINT AS dim, "
            "sum(CAST(round(v*1000000) AS BIGINT))::BIGINT AS qsum_x1e6, "
            "count(*)::BIGINT AS n_vecs FROM x GROUP BY 1, 2"
        ),
        "user_features": (
            "SELECT user_id, count(*)::BIGINT AS n_events, "
            "(max(CASE WHEN event_type='click' THEN 1 ELSE 0 END) + "
            "max(CASE WHEN event_type='error' THEN 1 ELSE 0 END) + "
            "max(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) + "
            "max(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) + "
            "max(CASE WHEN event_type='view' THEN 1 ELSE 0 END))::BIGINT AS n_types, "
            "sum(CAST(round(value*100) AS BIGINT))::BIGINT AS value_cents, "
            "min(epoch_us(ts))::BIGINT AS first_us, "
            "max(epoch_us(ts))::BIGINT AS last_us, "
            "sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END)::BIGINT AS n_click, "
            "sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END)::BIGINT AS n_error, "
            "sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase, "
            "sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup, "
            "sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END)::BIGINT AS n_view "
            "FROM events GROUP BY user_id"
        ),
        "unigram_logprob": (
            r"WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term "
            r"FROM documents), "
            r"tot AS (SELECT count(*)::DOUBLE AS n FROM toks), "
            r"freq AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term), "
            r"lp AS (SELECT term, CAST(round(ln(c / (SELECT n FROM tot)) * 1000000) AS BIGINT) AS lp "
            r"FROM freq), "
            r"agg AS (SELECT t.doc_id, count(*)::BIGINT AS n_tokens, sum(l.lp)::BIGINT AS s "
            r"FROM toks t JOIN lp l USING (term) GROUP BY t.doc_id) "
            r"SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens, "
            r"coalesce(a.s, 0)::BIGINT AS sum_logp_x1e6 "
            r"FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "perplexity_buckets": (
            r"WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term "
            r"FROM documents), "
            r"tot AS (SELECT count(*)::DOUBLE AS n FROM toks), "
            r"freq AS (SELECT term, count(*)::BIGINT AS c FROM toks GROUP BY term), "
            r"lp AS (SELECT term, CAST(round(ln(c / (SELECT n FROM tot)) * 1000000) AS BIGINT) AS lp "
            r"FROM freq), "
            r"agg AS (SELECT t.doc_id, count(*)::BIGINT AS n_tokens, sum(l.lp)::BIGINT AS s "
            r"FROM toks t JOIN lp l USING (term) GROUP BY t.doc_id), "
            r"ky AS (SELECT d.doc_id, d.lang, (a.s::DOUBLE / a.n_tokens) AS key "
            r"FROM documents d JOIN agg a USING (doc_id) WHERE a.n_tokens > 0) "
            r"SELECT doc_id, lang, "
            r"ntile(3) OVER (PARTITION BY lang ORDER BY key DESC, doc_id ASC)::BIGINT AS bucket "
            r"FROM ky"
        ),
        "bigram_logprob": (
            r"WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS w "
            r"FROM documents), "
            r"bg AS (SELECT doc_id, unnest(list_transform(list_zip(w[1:len(w)-1], w[2:len(w)]), "
            r"p -> p[1] || ' ' || p[2])) AS b, unnest(w[1:len(w)-1]) AS prev FROM w), "
            r"cb AS (SELECT b, count(*)::BIGINT AS c FROM bg GROUP BY b), "
            r"cu AS (SELECT term, count(*)::BIGINT AS c FROM "
            r"(SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term FROM documents) "
            r"GROUP BY term), "
            r"scored AS (SELECT bg.doc_id, "
            r"CAST(round(ln(cb.c::DOUBLE / cu.c) * 1000000) AS BIGINT) AS lp "
            r"FROM bg JOIN cb ON bg.b = cb.b JOIN cu ON bg.prev = cu.term), "
            r"agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(lp)::BIGINT AS s "
            r"FROM scored GROUP BY doc_id) "
            r"SELECT d.doc_id, coalesce(a.n_bigrams, 0)::BIGINT AS n_bigrams, "
            r"coalesce(a.s, 0)::BIGINT AS sum_logp_x1e6 "
            r"FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "heuristic_filter": (
            r"WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term "
            r"FROM documents), "
            r"c AS (SELECT doc_id, term, count(*)::BIGINT AS n FROM toks GROUP BY 1, 2), "
            r"agg AS (SELECT doc_id, sum(n)::BIGINT AS nw, count(*)::BIGINT AS nd, "
            r"max(n)::BIGINT AS mx FROM c GROUP BY doc_id) "
            r"SELECT d.doc_id, coalesce(a.nw, 0)::BIGINT AS n_words, "
            r"coalesce(a.nd, 0)::BIGINT AS n_distinct, coalesce(a.mx, 0)::BIGINT AS max_tf, "
            r"(coalesce(a.nw, 0) BETWEEN 10 AND 100000 AND 2*coalesce(a.nd, 0) >= coalesce(a.nw, 0) "
            r"AND 8*coalesce(a.mx, 0) <= coalesce(a.nw, 0)) AS keep "
            r"FROM documents d LEFT JOIN agg a USING (doc_id)"
        ),
        "interval_join": (
            "SELECT w.event_id, epoch_us(w.ts)::BIGINT AS window_start_us, "
            "count(p.ts)::BIGINT AS n_points, "
            "coalesce(sum(CAST(round(p.value*100) AS BIGINT)), 0)::BIGINT AS point_cents "
            "FROM events w LEFT JOIN events p ON p.event_type = 'purchase' "
            "AND epoch_us(p.ts) >= epoch_us(w.ts) "
            "AND epoch_us(p.ts) < epoch_us(w.ts) + 3600000000 "
            "WHERE w.event_type = 'signup' GROUP BY 1, 2"
        ),
        "events_rollup": (
            "SELECT (epoch_us(ts) // 86400000000) * 86400 AS day_s, event_type, "
            "count(*)::BIGINT AS n_events, "
            "sum(CAST(round(value*100) AS BIGINT))::BIGINT AS value_cents "
            "FROM events GROUP BY ROLLUP(day_s, event_type)"
        ),
        "source_mix": (
            "WITH w AS (SELECT doc_id, source, "
            "CASE source WHEN 'src0' THEN 250 WHEN 'src1' THEN 0 "
            "WHEN 'src2' THEN 130 WHEN 'src3' THEN 300 ELSE 100 END AS wx "
            "FROM documents), "
            "c AS (SELECT doc_id, source, (wx // 100) + "
            "(CASE WHEN (doc_id * 2654435761) % 4294967296 < "
            "((wx % 100) * 4294967296) // 100 THEN 1 ELSE 0 END) AS n FROM w) "
            "SELECT doc_id, source, "
            "unnest(generate_series(0, (n-1)::INT))::BIGINT AS copy_id "
            "FROM c WHERE n > 0"
        ),
        "line_dedup": (
            f"WITH pages AS (SELECT url, text FROM read_parquet('{corpus_glob}') "
            "WHERE text IS NOT NULL AND url NOT LIKE '%robots.txt' "
            "AND url NOT LIKE '%sitemap.xml'), "
            "lines AS (SELECT url, unnest(string_split(text, chr(10))) AS line, "
            "generate_subscripts(string_split(text, chr(10)), 1) AS ord FROM pages), "
            "ranked AS (SELECT url, line, ord, "
            "(line = '' OR row_number() OVER (PARTITION BY line ORDER BY url, ord) = 1) "
            "AS keep FROM lines) "
            "SELECT url, count(*)::BIGINT AS n_lines, "
            "sum(CASE WHEN keep THEN 0 ELSE 1 END)::BIGINT AS n_removed, "
            "string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY ord) AS clean_text "
            "FROM ranked GROUP BY url"
        ),
        "normalize_text": (
            r"WITH x AS (SELECT url, trim(regexp_replace(regexp_replace(lower(text), "
            r"'[0-9]', '0', 'g'), '[ \t\n\r\f\v]+', ' ', 'g'), ' ') AS norm_text "
            f"FROM read_parquet('{corpus_glob}') "
            "WHERE text IS NOT NULL AND url NOT LIKE '%robots.txt' "
            "AND url NOT LIKE '%sitemap.xml') "
            "SELECT url, norm_text, length(norm_text)::BIGINT AS n_chars FROM x"
        ),
        "chunk_documents": (
            r"WITH w AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS w "
            r"FROM documents), "
            r"c AS (SELECT doc_id, w, unnest(generate_series(0, "
            r"CASE WHEN len(w) = 0 THEN -1 ELSE (len(w)-1) // 48 END)) AS i FROM w) "
            r"SELECT doc_id, i::BIGINT AS chunk_id, "
            r"least(64, len(w) - i*48)::BIGINT AS n_tokens, "
            r"array_to_string(w[i*48+1 : i*48+64], ' ') AS chunk_text FROM c"
        ),
        "global_sample": (
            "SELECT doc_id FROM documents "
            "ORDER BY (doc_id * 2654435761) % 4294967296, doc_id LIMIT 100"
        ),
        "length_trim": (
            "WITH q AS (SELECT lang, quantile_disc(n_chars, 0.05) AS lo, "
            "quantile_disc(n_chars, 0.95) AS hi FROM documents GROUP BY lang) "
            "SELECT doc_id, d.lang, n_chars FROM documents d JOIN q ON d.lang = q.lang "
            "WHERE n_chars BETWEEN lo AND hi"
        ),
        "bm25_scores": (
            r"WITH toks AS (SELECT doc_id, list_transform("
            r"regexp_extract_all(text, '\S+'), x -> lower(x)) AS w FROM documents), "
            "dl AS (SELECT doc_id, len(w)::BIGINT AS dl FROM toks), "
            "stats AS (SELECT count(*)::BIGINT AS n, "
            "sum(dl)::DOUBLE / count(*) AS avgdl FROM dl), "
            "q AS (SELECT unnest(['sort', 'hash', 'join', 'scan', 'window']) AS term), "
            "tf AS (SELECT t.doc_id, q.term, "
            "len(list_filter(t.w, x -> x = q.term))::BIGINT AS tf "
            "FROM toks t CROSS JOIN q), "
            "df AS (SELECT term, sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END)::BIGINT AS df "
            "FROM tf GROUP BY term), "
            "scored AS (SELECT tf.doc_id, "
            "CAST(round(ln((s.n - df.df + 0.5) / (df.df + 0.5) + 1.0) * "
            "(tf.tf * (1.2 + 1.0)) "
            "/ (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / s.avgdl)) * 1000000) "
            "AS BIGINT) AS v "
            "FROM tf JOIN dl USING (doc_id) JOIN df USING (term) "
            "CROSS JOIN stats s WHERE tf.tf > 0) "
            "SELECT d.doc_id, coalesce(sum(v), 0)::BIGINT AS bm25_x1e6 "
            "FROM documents d LEFT JOIN scored sc ON d.doc_id = sc.doc_id "
            "GROUP BY d.doc_id"
        ),
        "token_entropy": (
            r"WITH toks AS (SELECT doc_id, unnest(list_transform("
            r"regexp_extract_all(text, '\S+'), x -> lower(x))) AS term FROM documents), "
            "n AS (SELECT doc_id, count(*)::BIGINT AS n FROM toks GROUP BY doc_id), "
            "c AS (SELECT doc_id, term, count(*)::BIGINT AS c FROM toks GROUP BY 1, 2), "
            "v AS (SELECT c.doc_id, CAST(round(-((c.c::DOUBLE / n.n) * "
            "ln(c.c::DOUBLE / n.n)) * 1000000000) AS BIGINT) AS v "
            "FROM c JOIN n USING (doc_id)), "
            "agg AS (SELECT doc_id, count(*)::BIGINT AS n_distinct, "
            "sum(v)::BIGINT AS h FROM v GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(n.n, 0)::BIGINT AS n_tokens, "
            "coalesce(a.n_distinct, 0)::BIGINT AS n_distinct, "
            "coalesce(a.h, 0)::BIGINT AS entropy_x1e9 "
            "FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id "
            "LEFT JOIN agg a ON d.doc_id = a.doc_id"
        ),
        "revenue_forecast": (
            "SELECT coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "CAST(round(l_discount*100) AS BIGINT)), 0)::BIGINT AS revenue_x10000, "
            "count(*)::BIGINT AS n_rows FROM lineitem "
            "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
            "AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 3 AND 6 AND l_quantity < 24"
        ),
        "shipping_priority": (
            "WITH o AS (SELECT o_orderkey, o_orderdate FROM orders "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-06-01'), "
            "l AS (SELECT l_orderkey, CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)) AS rev "
            "FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-06-01'), "
            "g AS (SELECT l_orderkey, epoch_us(o_orderdate)::BIGINT AS o_orderdate_us, "
            "sum(rev)::BIGINT AS revenue_x10000 FROM l JOIN o ON l_orderkey = o_orderkey "
            "GROUP BY 1, 2) "
            "SELECT l_orderkey, o_orderdate_us, revenue_x10000 FROM g "
            "ORDER BY revenue_x10000 DESC, l_orderkey LIMIT 10"
        ),
        "funnel_counts": (
            "WITH v AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events "
            "WHERE event_type='view' GROUP BY 1), "
            "s AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "JOIN v ON e.user_id = v.user_id WHERE e.event_type='signup' "
            "AND epoch_us(e.ts) >= v.t AND epoch_us(e.ts) < v.t + 86400000000 GROUP BY 1), "
            "p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e "
            "JOIN s ON e.user_id = s.user_id WHERE e.event_type='purchase' "
            "AND epoch_us(e.ts) >= s.t AND epoch_us(e.ts) < s.t + 86400000000 GROUP BY 1) "
            "SELECT stage, n_users::BIGINT AS n_users FROM (VALUES "
            "('view', (SELECT count(*) FROM v)), "
            "('signup', (SELECT count(*) FROM s)), "
            "('purchase', (SELECT count(*) FROM p))) AS f(stage, n_users)"
        ),
        "retention_cohorts": (
            "WITH d AS (SELECT DISTINCT user_id, epoch_us(ts)//86400000000 AS day "
            "FROM events), "
            "f AS (SELECT user_id, min(day) AS cohort FROM d GROUP BY 1) "
            "SELECT (f.cohort*86400)::BIGINT AS cohort_day_s, "
            "(d.day - f.cohort)::BIGINT AS day_offset, count(*)::BIGINT AS n_users "
            "FROM d JOIN f USING (user_id) GROUP BY 1, 2"
        ),
        "order_priority_check": (
            "SELECT o_orderpriority, count(*)::BIGINT AS n_orders FROM orders o "
            "WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45) "
            "GROUP BY 1"
        ),
        "customer_distribution": (
            "SELECT c_count, count(*)::BIGINT AS n_custs FROM ("
            "SELECT c.c_custkey, count(o.o_custkey)::BIGINT AS c_count "
            "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
            "GROUP BY 1) GROUP BY 1"
        ),
        "regional_revenue": (
            "SELECT n_name, count(*)::BIGINT AS n_items, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT AS revenue_x10000 "
            "FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey "
            "JOIN nation n ON s.s_nationkey = n.n_nationkey "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "WHERE r.r_name = 'ASIA' GROUP BY 1"
        ),
        "heavy_hitters": (
            r"WITH toks AS (SELECT doc_id, "
            r"unnest(regexp_extract_all(lower(text), '\S+')) AS term, "
            r"generate_subscripts(regexp_extract_all(lower(text), '\S+'), 1) AS pos "
            r"FROM documents), "
            r"tri AS (SELECT a.term || ' ' || b.term || ' ' || c.term AS gram "
            r"FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 "
            r"JOIN toks c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2), "
            r"cnt AS (SELECT gram, count(*)::BIGINT AS n FROM tri GROUP BY 1), "
            r"tot AS (SELECT sum(n)::BIGINT AS t FROM cnt) "
            r"SELECT gram, n FROM cnt, tot WHERE n * 5000 >= t"
        ),
        "best_line_per_order": (
            "WITH r AS (SELECT l_orderkey, l_linenumber, "
            "CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)) AS revenue_x10000, "
            "row_number() OVER (PARTITION BY l_orderkey ORDER BY "
            "CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)) DESC, l_linenumber) "
            "AS rn FROM lineitem) "
            "SELECT l_orderkey, l_linenumber::BIGINT AS l_linenumber, "
            "revenue_x10000 FROM r WHERE rn = 1"
        ),
        "session_stats": (
            "WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "AS prev FROM events), "
            "s AS (SELECT user_id, ts_us, sum(CASE WHEN prev IS NULL OR "
            "ts_us - prev > 1800000000 THEN 1 ELSE 0 END) OVER ("
            "PARTITION BY user_id ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS grp "
            "FROM e), "
            "sess AS (SELECT user_id, grp, count(*)::BIGINT AS n_events, "
            "(max(ts_us) - min(ts_us)) // 1000000 AS dur_s FROM s GROUP BY 1, 2) "
            "SELECT count(*)::BIGINT AS n_sessions, "
            "quantile_disc(n_events, 0.5)::BIGINT AS p50_events, "
            "quantile_disc(n_events, 0.99)::BIGINT AS p99_events, "
            "quantile_disc(dur_s, 0.5)::BIGINT AS p50_duration_s, "
            "quantile_disc(dur_s, 0.99)::BIGINT AS p99_duration_s FROM sess"
        ),
        "props_stats": (
            # json_type gate pins BOTH sides to integer-TYPED JSON values —
            # the engine's isinstance(v, int) excludes "7"/3.5/true the same
            "WITH x AS (SELECT event_type, "
            "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events "
            "WHERE json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')) "
            "SELECT event_type, count(*)::BIGINT AS n_events, "
            "sum(k)::BIGINT AS k_sum, min(k)::BIGINT AS k_min, "
            "max(k)::BIGINT AS k_max, count(DISTINCT k)::BIGINT AS n_distinct_k "
            "FROM x GROUP BY 1"
        ),
        "event_transitions": (
            "WITH o AS (SELECT user_id, event_type, lead(event_type) OVER ("
            "PARTITION BY user_id ORDER BY ts, event_id) AS nxt FROM events) "
            "SELECT event_type AS prev_type, nxt AS next_type, "
            "count(*)::BIGINT AS n FROM o WHERE nxt IS NOT NULL GROUP BY 1, 2"
        ),
        "rolling_active_users": (
            "WITH d AS (SELECT DISTINCT user_id, "
            "epoch_us(ts)//86400000000 AS day FROM events), "
            "days AS (SELECT DISTINCT day FROM d) "
            "SELECT (day*86400)::BIGINT AS day_s, "
            "(SELECT count(DISTINCT user_id) FROM d x "
            "WHERE x.day = days.day)::BIGINT AS dau, "
            "(SELECT count(DISTINCT user_id) FROM d y "
            "WHERE y.day BETWEEN days.day - 6 AND days.day)::BIGINT AS wau "
            "FROM days"
        ),
        "promo_revenue": (
            "SELECT (year(l_shipdate)*100 + month(l_shipdate))::BIGINT AS ym, "
            "sum(CASE WHEN p_type = 'PROMO' THEN "
            "CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)) ELSE 0 END)::BIGINT "
            "AS promo_revenue_x10000, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT "
            "AS total_revenue_x10000 "
            "FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey GROUP BY 1"
        ),
        "small_qty_revenue": (
            "WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#23'), "
            "st AS (SELECT l_partkey, "
            "sum(CAST(round(l_quantity*100) AS BIGINT)) AS s, count(*)::BIGINT AS n "
            "FROM lineitem JOIN bp ON l_partkey = p_partkey GROUP BY 1) "
            "SELECT count(*)::BIGINT AS n_items, "
            "coalesce(sum(CAST(round(l_extendedprice*100) AS BIGINT)), 0)::BIGINT "
            "AS revenue_cents "
            "FROM lineitem l JOIN st ON l.l_partkey = st.l_partkey "
            "WHERE CAST(round(l.l_quantity*100) AS BIGINT) * 5 * st.n < st.s"
        ),
        "large_orders": (
            "WITH w AS (SELECT l_orderkey, "
            "sum(CAST(round(l_quantity*100) AS BIGINT)) AS q "
            "FROM lineitem GROUP BY 1 HAVING q > 30000) "
            "SELECT c.c_name, o.o_custkey::BIGINT AS o_custkey, "
            "o.o_orderkey::BIGINT AS o_orderkey, "
            "CAST(epoch(o.o_orderdate) AS BIGINT) AS o_orderdate_s, "
            "CAST(round(o.o_totalprice*100) AS BIGINT) AS o_totalprice_cents, "
            "w.q::BIGINT AS total_qty_x100 "
            "FROM orders o JOIN w ON o.o_orderkey = w.l_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey"
        ),
        "top_returned_customers": (
            "WITH rev AS (SELECT o.o_custkey AS c_custkey, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT))) AS revenue_x10000 "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "WHERE l.l_returnflag = 'R' AND o.o_orderdate >= '1996-01-01' "
            "AND o.o_orderdate < '1997-01-01' GROUP BY 1) "
            "SELECT r.c_custkey::BIGINT AS c_custkey, c.c_name, n.n_name, "
            "r.revenue_x10000::BIGINT AS revenue_x10000, "
            "CAST(round(c.c_acctbal*100) AS BIGINT) AS c_acctbal_cents "
            "FROM rev r JOIN customer c ON c.c_custkey = r.c_custkey "
            "JOIN nation n ON n.n_nationkey = c.c_nationkey "
            "ORDER BY r.revenue_x10000 DESC, r.c_custkey ASC LIMIT 20"
        ),
        "dormant_customers": (
            "WITH g AS (SELECT sum(CAST(round(c_acctbal*100) AS BIGINT)) AS s, "
            "count(*)::BIGINT AS n FROM customer "
            "WHERE CAST(round(c_acctbal*100) AS BIGINT) > 0) "
            "SELECT c_mktsegment, count(*)::BIGINT AS n_custs, "
            "sum(CAST(round(c_acctbal*100) AS BIGINT))::BIGINT "
            "AS total_acctbal_cents "
            "FROM customer c, g "
            "WHERE CAST(round(c_acctbal*100) AS BIGINT) * g.n > g.s "
            "AND NOT EXISTS (SELECT 1 FROM orders o "
            "WHERE o.o_custkey = c.c_custkey AND o.o_orderdate >= '2000-01-01') "
            "GROUP BY 1"
        ),
        "top_supplier": (
            "WITH r AS (SELECT l_suppkey AS s_suppkey, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT))) AS total_revenue_x10000 "
            "FROM lineitem WHERE l_shipdate >= '1996-01-01' "
            "AND l_shipdate < '1996-04-01' GROUP BY 1) "
            "SELECT r.s_suppkey::BIGINT AS s_suppkey, s.s_name, "
            "r.total_revenue_x10000::BIGINT AS total_revenue_x10000 "
            "FROM r JOIN supplier s ON s.s_suppkey = r.s_suppkey "
            "WHERE r.total_revenue_x10000 = "
            "(SELECT max(total_revenue_x10000) FROM r)"
        ),
        "nation_trade_volume": (
            "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "CAST(year(l_shipdate) AS BIGINT) AS ship_year, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT)))::BIGINT "
            "AS revenue_x10000 "
            "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "JOIN customer c ON c.c_custkey = o.o_custkey "
            "JOIN nation cn ON cn.n_nationkey = c.c_nationkey "
            "JOIN supplier s ON s.s_suppkey = l.l_suppkey "
            "JOIN nation sn ON sn.n_nationkey = s.s_nationkey "
            "GROUP BY 1, 2, 3"
        ),
        "brand_revenue_share": (
            "WITH br AS (SELECT p_brand, "
            "sum(CAST(round(l_extendedprice*100) AS BIGINT) * "
            "(100 - CAST(round(l_discount*100) AS BIGINT))) AS revenue_x10000 "
            "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1), "
            "t AS (SELECT sum(revenue_x10000) AS tot FROM br) "
            "SELECT p_brand, revenue_x10000::BIGINT AS revenue_x10000, "
            "((revenue_x10000 * 10000) // t.tot)::BIGINT AS share_bp "
            "FROM br, t WHERE (revenue_x10000 * 10000) // t.tot > 300"
        ),
        "supplier_part_counts": (
            "SELECT p_brand, (p_size // 10)::BIGINT AS size_band, "
            "count(DISTINCT l_suppkey)::BIGINT AS supplier_cnt "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
            "GROUP BY 1, 2"
        ),
        "interarrival_quantiles": (
            "WITH d AS (SELECT event_type, "
            "epoch_us(ts) - lag(epoch_us(ts)) OVER "
            "(PARTITION BY user_id, event_type ORDER BY ts, event_id) AS dt_us "
            "FROM events), "
            "g AS (SELECT event_type, dt_us::BIGINT AS dt_us FROM d "
            "WHERE dt_us IS NOT NULL) "
            "SELECT event_type, count(*)::BIGINT AS n_gaps, "
            "quantile_disc(dt_us, 0.5)::BIGINT AS p50, "
            "quantile_disc(dt_us, 0.9)::BIGINT AS p90 "
            "FROM g GROUP BY 1"
        ),
        "zipf_slope": (
            r"WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), "
            r"'\S+')) AS term FROM documents), "
            "c AS (SELECT term, count(*)::BIGINT AS n FROM toks GROUP BY 1 "
            "ORDER BY n DESC, term ASC LIMIT 1000), "
            "r AS (SELECT n, row_number() OVER "
            "(ORDER BY n DESC, term ASC) AS rk FROM c) "
            "SELECT count(*)::BIGINT AS n_terms, round("
            "(count(*) * sum(ln(rk) * ln(n)) - sum(ln(rk)) * sum(ln(n))) / "
            "(count(*) * sum(ln(rk) * ln(rk)) - sum(ln(rk)) * sum(ln(rk))), 6) "
            "AS slope_r6 FROM r"
        ),
        "token_budget_trim": (
            r"WITH t AS (SELECT doc_id, source, "
            r"length(regexp_extract_all(coalesce(text, ''), '\S+'))::BIGINT AS tok "
            r"FROM documents), "
            "c AS (SELECT doc_id, source, tok, sum(tok) OVER "
            "(PARTITION BY source ORDER BY doc_id) AS cum FROM t) "
            "SELECT source, count(*)::BIGINT AS n_docs_kept, "
            "sum(tok)::BIGINT AS n_tokens_kept, "
            "max(doc_id)::BIGINT AS last_doc_id "
            "FROM c WHERE cum <= 5000 GROUP BY 1"
        ),
        "event_trigrams": (
            "WITH o AS (SELECT event_type AS t0, "
            "lead(event_type, 1) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS t1, "
            "lead(event_type, 2) OVER "
            "(PARTITION BY user_id ORDER BY ts, event_id) AS t2 FROM events) "
            "SELECT t0 || '>' || t1 || '>' || t2 AS trigram, "
            "count(*)::BIGINT AS n FROM o "
            "WHERE t1 IS NOT NULL AND t2 IS NOT NULL "
            "GROUP BY 1 ORDER BY n DESC, trigram ASC LIMIT 20"
        ),
        "latest_shipper_orders": (
            "WITH l AS (SELECT l_orderkey, l_suppkey, "
            "max(epoch_us(l_shipdate)) AS ship FROM lineitem GROUP BY 1, 2), "
            "r AS (SELECT l_orderkey, l_suppkey, "
            "row_number() OVER (PARTITION BY l_orderkey "
            "ORDER BY ship DESC, l_suppkey DESC) AS rn, "
            "count(*) OVER (PARTITION BY l_orderkey) AS nsupp FROM l) "
            "SELECT s.s_suppkey::BIGINT AS s_suppkey, s.s_name, "
            "count(*)::BIGINT AS n_orders "
            "FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey "
            "WHERE rn = 1 AND nsupp >= 2 GROUP BY 1, 2"
        ),
        "host_reciprocity": (
            f"WITH e AS (SELECT DISTINCT src_host AS s, dst_host AS d "
            f"FROM read_parquet('{golden_path('sf0.01', 'link_graph')}') "
            f"WHERE src_host <> dst_host) "
            f"SELECT (SELECT count(*) FROM e)::BIGINT AS n_directed, "
            f"(SELECT count(*) FROM e a JOIN e b "
            f"ON a.s = b.d AND a.d = b.s AND a.s < a.d)::BIGINT "
            f"AS n_bidirectional"
        ),
        "daily_revenue_anomaly": (
            "WITH d AS (SELECT CAST(epoch(o_orderdate) AS BIGINT) // 86400 "
            "AS day, sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents "
            "FROM orders GROUP BY 1), "
            "w AS (SELECT a.day, a.cents, "
            "(SELECT coalesce(sum(b.cents), 0) FROM d b "
            "WHERE b.day >= a.day - 7 AND b.day < a.day) AS trail FROM d a) "
            "SELECT (day * 86400)::BIGINT AS day_s, cents::BIGINT "
            "AS revenue_cents, trail::BIGINT AS trailing_cents, "
            "((cents * 10000) // trail)::BIGINT AS ratio_bp "
            "FROM w WHERE trail > 0"
        ),
        "host_cocitation": (
            f"WITH e AS (SELECT DISTINCT src_host AS s, dst_host AS d "
            f"FROM read_parquet('{golden_path('sf0.01', 'link_graph')}') "
            f"WHERE src_host <> dst_host), "
            f"ok AS (SELECT d FROM e GROUP BY d HAVING count(*) <= 256 "
            f"AND count(*) >= 2) "
            f"SELECT a.s AS host_a, b.s AS host_b, count(*)::BIGINT AS shared "
            f"FROM e a JOIN e b ON a.d = b.d AND a.s < b.s "
            f"JOIN ok ON ok.d = a.d GROUP BY 1, 2 "
            f"ORDER BY shared DESC, host_a ASC, host_b ASC LIMIT 50"
        ),
        "host_triangles": (
            f"WITH e0 AS (SELECT DISTINCT least(src_host, dst_host) AS x, "
            f"greatest(src_host, dst_host) AS y "
            f"FROM read_parquet('{golden_path('sf0.01', 'link_graph')}') "
            f"WHERE src_host <> dst_host) "
            f"SELECT (SELECT count(*) FROM "
            f"(SELECT x AS h FROM e0 UNION SELECT y FROM e0))::BIGINT AS n_hosts, "
            f"(SELECT count(*) FROM e0)::BIGINT AS n_edges, "
            f"(SELECT count(*) FROM e0 e1 "
            f"JOIN e0 e2 ON e2.x = e1.x AND e2.y > e1.y "
            f"JOIN e0 e3 ON e3.x = e1.y AND e3.y = e2.y)::BIGINT AS n_triangles"
        ),
        "embedding_near_dup": (
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 9) AS cos_sim "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
            "WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 9) >= 0.4"
        ),
        "top_k_similarity": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe FROM embeddings "
            "ORDER BY vec_id LIMIT 5), "
            "sims AS (SELECT q.query_id - (SELECT min(query_id) FROM q) AS query_id, e.vec_id, "
            "round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 9) AS sim "
            "FROM embeddings e CROSS JOIN q), "
            "ranked AS (SELECT query_id, vec_id, "
            "row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank "
            "FROM sims) "
            "SELECT query_id, vec_id, rank FROM ranked WHERE rank <= 10"
        ),
    }
    # the fused-write tier lands the identical rows, read back from disk
    oracles["line_dedup_partitioned"] = oracles["line_dedup"]
    # composed oracle: the per-source keep report wraps the gopher gate SQL
    oracles["quality_by_source"] = (
        f"WITH g AS ({oracles['gopher_quality']}) "
        "SELECT d.source, count(*)::BIGINT AS n_docs, "
        "sum(CASE WHEN g.keep THEN 1 ELSE 0 END)::BIGINT AS n_keep "
        "FROM g JOIN documents d USING (doc_id) GROUP BY 1"
    )
    return oracles
