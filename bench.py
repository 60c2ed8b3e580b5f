#!/usr/bin/env python
"""Benchmark harness.

Headline: full multi-host crawl (pages/sec + frontier ops/sec) over the
deterministic synthetic web corpus derived for $GRAFT_SF_DIR's scale, plus
per-operator timings over the sf tables.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "pages_per_sec": ...,
   "frontier_ops_per_sec": ...}

--scaling: runs the same crawl in two fresh processes at num_cpus=N and 4N
(default 2 and 8 — see BASELINE.md scaling-protocol analysis)
and reports both throughputs + scaling efficiency (BASELINE.md criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def run_bench() -> dict:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_name = os.path.basename(os.path.normpath(sf_dir))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)

    import numpy as np

    from spider_ray.config import CrawlConfig, CrawlJob
    from spider_ray.fixtures import SCALE_PARAMS, ensure_scale, seed_of
    from spider_ray.pipelines.crawl import RayCrawler

    corpus = ensure_scale(sf_name)
    n_hosts = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])[0]

    # warm the OS page cache (measure compute + shuffle, not first disk read)
    import glob

    for f in glob.glob(os.path.join(corpus, "*", "*.parquet")):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass

    queries: dict[str, float] = {}

    # untimed Ray Data warmup (first-pipeline startup otherwise lands in the
    # headline number)
    import ray.data

    ray.data.range(64).map_batches(lambda b: b, batch_format="pyarrow").count()

    # --- headline: full crawl of every host at once -------------------------
    job = CrawlJob(tuple(seed_of(k) for k in range(n_hosts)), CrawlConfig(normalize=True))
    t0 = time.perf_counter()
    crawler = RayCrawler(job, corpus, keep_pages=False, collect_seen=False)
    res = crawler.run()
    crawl_sec = time.perf_counter() - t0
    pages = len(res.visited)
    queries["crawl_full"] = round(crawl_sec, 3)

    if os.environ.get("BENCH_CRAWL_ONLY") == "1":
        result = {
            "metric": "crawl_full_sec", "value": round(crawl_sec, 3), "unit": "sec",
            "queries": queries, "sf": sf_name, "num_cpus": num_cpus,
            "pages_crawled": pages,
            "pages_per_sec": round(pages / crawl_sec, 1),
            "frontier_ops": crawler.frontier_ops,
            "frontier_ops_per_sec": round(crawler.frontier_ops / crawl_sec, 1),
        }
        ray.shutdown()
        return result

    # --- parse-only throughput over the entire corpus ----------------------
    import pyarrow as pa

    from spider_ray.stages.parse import ParsePages

    t0 = time.perf_counter()
    import ray.data

    ds = ray.data.read_parquet(corpus, columns=["url", "html", "status"])
    parsed = ds.map_batches(ParsePages(job), batch_format="pyarrow", batch_size=256)
    n_parsed = parsed.count()
    queries["parse_corpus"] = round(time.perf_counter() - t0, 3)

    # --- scrape markdown transform over the entire corpus ------------------
    from spider_ray.markdown import transform_corpus

    t0 = time.perf_counter()
    transform_corpus(corpus, "markdown").count()
    queries["scrape_markdown"] = round(time.perf_counter() - t0, 3)

    # --- host link-graph + PageRank over the entire corpus -----------------
    from spider_ray.ops.linkgraph import host_pagerank

    t0 = time.perf_counter()
    host_pagerank(corpus, iters=10).count()
    queries["host_pagerank"] = round(time.perf_counter() - t0, 3)

    # --- training-data ops over the sf tables ------------------------------
    from spider_ray.ops.dedup import exact_dedup_counts, minhash_lsh_candidates
    from spider_ray.ops.similarity import brute_force_top_k
    from spider_ray.ops.textstats import TokenCounter

    docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))
    t0 = time.perf_counter()
    exact_dedup_counts(docs).count()
    queries["exact_dedup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs.map_batches(TokenCounter(), batch_format="pyarrow").count()
    queries["token_stats"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    minhash_lsh_candidates(docs, num_perm=128, n_bands=16).count()
    queries["minhash_lsh"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dedup import simhash_signatures
    from spider_ray.ops.textstats import Fingerprinter, LangId

    t0 = time.perf_counter()
    simhash_signatures(docs).count()
    queries["simhash"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs.map_batches(LangId(), batch_format="pyarrow").count()
    queries["lang_id"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs.map_batches(Fingerprinter(), batch_format="pyarrow").count()
    queries["fingerprints"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import QualityScorer

    t0 = time.perf_counter()
    docs.map_batches(QualityScorer(), batch_format="pyarrow").count()
    queries["quality_scores"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dedup import near_dup_clusters, near_dup_clusters_labelprop

    t0 = time.perf_counter()
    near_dup_clusters(docs, threshold=0.5)
    queries["near_dup_clusters"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    near_dup_clusters_labelprop(docs, threshold=0.5).count()
    queries["near_dup_clusters_lp"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dedup import simhash_near_dup

    t0 = time.perf_counter()
    simhash_near_dup(docs, max_hamming=3).count()
    queries["simhash_near_dup"] = round(time.perf_counter() - t0, 3)

    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    qvecs = np.array([r["embedding"] for r in emb.sort("vec_id").limit(8).take_all()],
                     dtype=np.float64)
    t0 = time.perf_counter()
    brute_force_top_k(emb, qvecs, k=10)
    queries["top_k_similarity"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.similarity import cosine_near_dup

    t0 = time.perf_counter()
    cosine_near_dup(emb, threshold=0.4).count()
    queries["embedding_near_dup"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.similarity import lsh_top_k

    t0 = time.perf_counter()
    lsh_top_k(emb, qvecs, k=10, n_planes=8)
    queries["lsh_ann"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.similarity import pq_top_k

    t0 = time.perf_counter()
    pq_top_k(emb, qvecs[:5], k=10, m=4, nbits=4)
    queries["pq_ann"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.similarity import knn_graph

    t0 = time.perf_counter()
    knn_graph(emb, k=5).count()
    queries["knn_graph"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.ngrams import bigram_topk
    from spider_ray.ops.packing import pack_sequences
    from spider_ray.ops.sampling import stratified_sample
    from spider_ray.ops.textclean import GopherQuality, PiiScrubber, plant_pii

    t0 = time.perf_counter()
    docs.map_batches(plant_pii, batch_format="pyarrow").map_batches(
        PiiScrubber(), batch_format="pyarrow"
    ).count()
    queries["pii_scrub"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    docs.map_batches(GopherQuality(), batch_format="pyarrow").count()
    queries["gopher_quality"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    stratified_sample(docs, {"en": 0.5, "de": 0.1, "es": 0.1, "fr": 0.1, "zh": 0.1}).count()
    queries["stratified_sample"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import shard_shuffle

    t0 = time.perf_counter()
    shard_shuffle(docs, n_shards=8).count()
    queries["shard_shuffle"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    bigram_topk(docs, k=100).count()
    queries["bigram_topk"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    pack_sequences(docs, budget=256, n_parts=64).count()
    queries["sequence_packing"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import host_cap

    t0 = time.perf_counter()
    host_cap(corpus, cap=5).count()
    queries["host_cap"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dsir import dsir_weights

    t0 = time.perf_counter()
    dsir_weights(docs).count()
    queries["dsir_weights"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.cluster import embedding_pca

    emb_pca = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.perf_counter()
    embedding_pca(emb_pca).num_rows
    queries["embedding_pca"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import host_hits

    t0 = time.perf_counter()
    host_hits(corpus).count()
    queries["host_hits"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import top_backlinks

    t0 = time.perf_counter()
    top_backlinks(corpus, k=100)
    queries["top_backlinks"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.robotsaudit import robots_audit

    t0 = time.perf_counter()
    robots_audit(corpus).count()
    queries["robots_audit"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import url_features

    t0 = time.perf_counter()
    url_features(corpus).count()
    queries["url_features"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import lang_confusion

    t0 = time.perf_counter()
    lang_confusion(docs).count()
    queries["lang_confusion"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dedup import near_dup_canonical

    t0 = time.perf_counter()
    near_dup_canonical(docs, threshold=0.5)
    queries["near_dup_canonical"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.behavior import top_users_per_day

    ev_tu = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    t0 = time.perf_counter()
    top_users_per_day(ev_tu, k=3).count()
    queries["top_users_per_day"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.behavior import value_outliers

    ev_vo = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    )
    t0 = time.perf_counter()
    value_outliers(ev_vo).count()
    queries["value_outliers"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import host_lang_mix

    t0 = time.perf_counter()
    host_lang_mix(corpus).count()
    queries["host_lang_mix"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sketch import kmv_users_per_day

    ev_kd = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "user_id"]
    )
    t0 = time.perf_counter()
    kmv_users_per_day(ev_kd, k=64).count()
    queries["kmv_users_per_day"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import pricing_summary

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"],
    )
    t0 = time.perf_counter()
    pricing_summary(li).count()
    queries["pricing_summary"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import order_priority_revenue

    li_join = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    ords = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderpriority"]
    )
    t0 = time.perf_counter()
    order_priority_revenue(li_join, ords, num_partitions=16).count()
    queries["order_revenue"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.curate import curate_corpus

    t0 = time.perf_counter()
    curate_corpus(docs, {"en": 0.5, "de": 0.1, "es": 0.1, "fr": 0.1, "zh": 0.1}).count()
    queries["curate_corpus"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.tfidf import tfidf_top_terms

    t0 = time.perf_counter()
    tfidf_top_terms(docs, k=5, concurrency=8).count()
    queries["tfidf_top_terms"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.windows import sessionize, tumbling_window_counts

    events_tw = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    t0 = time.perf_counter()
    tumbling_window_counts(events_tw, width_s=3600).count()
    queries["tumbling_events"] = round(time.perf_counter() - t0, 3)

    events_se = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "user_id"]
    )
    t0 = time.perf_counter()
    sessionize(events_se, gap_s=1800).count()
    queries["sessionize"] = round(time.perf_counter() - t0, 3)

    # --- corpus-stats / sketch ops (round-2 additions) ---
    from spider_ray.ops.corpusstats import (
        decontaminate,
        group_quantiles,
        posting_lists,
        top_terms_per_group,
    )
    from spider_ray.ops.sketch import kmv_distinct
    from spider_ray.ops.windows import concurrent_sessions, rolling_user_sums

    t0 = time.perf_counter()
    group_quantiles(docs, group_col="lang", value_col="n_chars")
    queries["lang_quantiles"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    top_terms_per_group(docs, group_col="lang", k=10).count()
    queries["top_terms_per_lang"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    posting_lists(docs, max_ids=100).count()
    queries["posting_lists"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    decontaminate(docs, n=3, bench_mod=97).count()
    queries["decontaminate"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.corpusstats import repetition_stats

    t0 = time.perf_counter()
    repetition_stats(docs).count()
    queries["repetition_stats"] = round(time.perf_counter() - t0, 3)

    events_kmv = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    t0 = time.perf_counter()
    kmv_distinct(events_kmv, group_col="event_type", key_col="user_id", k=64).count()
    queries["distinct_users_kmv"] = round(time.perf_counter() - t0, 3)

    events_rw = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))
    t0 = time.perf_counter()
    rolling_user_sums(events_rw, window_rows=3).count()
    queries["rolling_user_sums"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    concurrent_sessions(events_rw, gap_s=1800, width_s=3600).count()
    queries["concurrent_sessions"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.windows import sliding_window_counts

    events_sw = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    t0 = time.perf_counter()
    sliding_window_counts(events_sw, width_s=3600, step_s=900).count()
    queries["sliding_events"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.spans import dup_ngram_spans, remove_dup_spans

    t0 = time.perf_counter()
    dup_ngram_spans(docs).count()
    queries["dup_ngram_spans"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    remove_dup_spans(docs).count()
    queries["remove_dup_spans"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.cluster import kmeans_assign, semdedup

    emb_ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t0 = time.perf_counter()
    kmeans_assign(emb_ds).count()
    queries["kmeans_clusters"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    semdedup(emb_ds).count()
    queries["semdedup"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.cluster import label_centroids

    t0 = time.perf_counter()
    label_centroids(emb_ds).count()
    queries["label_centroids"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.features import user_features

    ev_uf = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "event_type", "value", "ts"],
    )
    t0 = time.perf_counter()
    user_features(ev_uf).count()
    queries["user_features"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import heuristic_filter, unigram_logprob

    t0 = time.perf_counter()
    unigram_logprob(docs).count()
    queries["unigram_logprob"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import bigram_logprob

    t0 = time.perf_counter()
    bigram_logprob(docs).count()
    queries["bigram_logprob"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import perplexity_buckets

    t0 = time.perf_counter()
    perplexity_buckets(docs).count()
    queries["perplexity_buckets"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    heuristic_filter(docs).count()
    queries["heuristic_filter"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import revenue_forecast, shipping_priority

    li_q6 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    t0 = time.perf_counter()
    revenue_forecast(li_q6)
    queries["revenue_forecast"] = round(time.perf_counter() - t0, 3)

    li_q3 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    orders_q3 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    cust_q3 = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    t0 = time.perf_counter()
    shipping_priority(li_q3, orders_q3, cust_q3).count()
    queries["shipping_priority"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.intervals import interval_join_counts

    ev_ij = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "event_type", "value"],
    )
    t0 = time.perf_counter()
    interval_join_counts(ev_ij, window_s=3600).count()
    queries["interval_join"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import events_rollup

    ev_ro = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type", "value"]
    )
    t0 = time.perf_counter()
    events_rollup(ev_ro).count()
    queries["events_rollup"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import source_mix

    docs_mix = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "source"]
    )
    t0 = time.perf_counter()
    source_mix(docs_mix, {"src0": 250, "src1": 0, "src2": 130, "src3": 300}).count()
    queries["source_mix"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import temperature_mix

    t0 = time.perf_counter()
    temperature_mix(docs_mix, alpha=0.5, budget=5000).count()
    queries["temperature_mix"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import weighted_sample_k

    t0 = time.perf_counter()
    weighted_sample_k(docs, k=100)
    queries["weighted_sample"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.corpusstats import source_overlap

    t0 = time.perf_counter()
    source_overlap(docs, n=3).count()
    queries["source_overlap"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.dedup import near_dup_against_corpus

    t0 = time.perf_counter()
    near_dup_against_corpus(docs, threshold=0.5).count()
    queries["near_dup_incremental"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.corpusstats import token_percentiles

    t0 = time.perf_counter()
    token_percentiles(docs).count()
    queries["token_percentiles"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linededup import global_line_dedup, normalize_pages

    t0 = time.perf_counter()
    global_line_dedup(corpus).count()
    queries["line_dedup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    normalize_pages(corpus).count()
    queries["normalize_text"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.chunking import chunk_documents

    t0 = time.perf_counter()
    chunk_documents(docs, chunk_tokens=64, stride=48).count()
    queries["chunk_documents"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import global_sample_k

    t0 = time.perf_counter()
    global_sample_k(docs, k=100).count()
    queries["global_sample"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.corpusstats import length_trim

    t0 = time.perf_counter()
    length_trim(docs).count()
    queries["length_trim"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.bm25 import bm25_scores

    t0 = time.perf_counter()
    bm25_scores(docs, ("sort", "hash", "join", "scan", "window")).count()
    queries["bm25_scores"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.entropy import token_entropy

    t0 = time.perf_counter()
    token_entropy(docs).count()
    queries["token_entropy"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.anchors import anchor_text_terms

    t0 = time.perf_counter()
    anchor_text_terms(corpus, k=10).count()
    queries["anchor_terms"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.behavior import funnel_counts, retention_cohorts

    ev_fn = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    t0 = time.perf_counter()
    funnel_counts(ev_fn).count()
    queries["funnel_counts"] = round(time.perf_counter() - t0, 3)

    ev_rt = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    t0 = time.perf_counter()
    retention_cohorts(ev_rt).count()
    queries["retention_cohorts"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import (
        customer_order_distribution,
        order_priority_check,
        regional_revenue,
        supplier_nation_dims,
    )

    orders_q4 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li_q4 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )
    t0 = time.perf_counter()
    order_priority_check(orders_q4, li_q4).count()
    queries["order_priority_check"] = round(time.perf_counter() - t0, 3)

    cust_q13 = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"]
    )
    orders_q13 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_custkey"]
    )
    t0 = time.perf_counter()
    customer_order_distribution(cust_q13, orders_q13).count()
    queries["customer_distribution"] = round(time.perf_counter() - t0, 3)

    li_q5 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    regional_revenue(li_q5, supplier_nation_dims(sf_dir, region="ASIA")).count()
    queries["regional_revenue"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.heavyhitters import heavy_hitter_ngrams

    t0 = time.perf_counter()
    heavy_hitter_ngrams(docs, n=3, inv_phi=5000, capacity=8192).count()
    queries["heavy_hitters"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.behavior import event_transitions, rolling_active_users

    ev_tr = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    t0 = time.perf_counter()
    event_transitions(ev_tr).count()
    queries["event_transitions"] = round(time.perf_counter() - t0, 3)

    ev_ra = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "ts"]
    )
    t0 = time.perf_counter()
    rolling_active_users(ev_ra).count()
    queries["rolling_active_users"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import part_promo_dims, promo_revenue

    li_q14 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    promo_revenue(li_q14, part_promo_dims(sf_dir)).count()
    queries["promo_revenue"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.semistruct import props_stats

    ev_ps = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
    )
    t0 = time.perf_counter()
    props_stats(ev_ps).count()
    queries["props_stats"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.windows import session_stats

    ev_ss = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id"],
    )
    t0 = time.perf_counter()
    session_stats(ev_ss)
    queries["session_stats"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import best_line_per_order

    li_bl = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    best_line_per_order(li_bl).count()
    queries["best_line_per_order"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textclean import quality_by_source

    docs_qs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    t0 = time.perf_counter()
    quality_by_source(docs_qs).count()
    queries["quality_by_source"] = round(time.perf_counter() - t0, 3)

    # --- second TPC-H batch (tpch2.py) -------------------------------------
    from spider_ray.ops.tpch2 import (
        brand_partkeys,
        brand_revenue_share,
        customer_names,
        customer_nation_dims,
        customer_nation_map,
        dormant_customers,
        large_orders,
        nation_trade_volume,
        negative_balance_suppliers,
        part_brand_map,
        part_class_map,
        small_qty_revenue,
        supplier_names,
        supplier_nation_map,
        supplier_part_counts,
        top_returned_customers,
        top_supplier,
    )

    li_q17 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    )
    t0 = time.perf_counter()
    small_qty_revenue(li_q17, brand_partkeys(sf_dir)).count()
    queries["small_qty_revenue"] = round(time.perf_counter() - t0, 3)

    li_q18 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_quantity"],
    )
    ord_q18 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    t0 = time.perf_counter()
    large_orders(li_q18, ord_q18, customer_names(sf_dir)).count()
    queries["large_orders"] = round(time.perf_counter() - t0, 3)

    li_q10 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )
    ord_q10 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )
    t0 = time.perf_counter()
    top_returned_customers(li_q10, ord_q10, customer_nation_dims(sf_dir)).count()
    queries["top_returned_customers"] = round(time.perf_counter() - t0, 3)

    cust_q22 = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment", "c_acctbal"],
    )
    ord_q22 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_orderdate"],
    )
    t0 = time.perf_counter()
    dormant_customers(cust_q22, ord_q22).count()
    queries["dormant_customers"] = round(time.perf_counter() - t0, 3)

    li_q15 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    top_supplier(li_q15, supplier_names(sf_dir)).count()
    queries["top_supplier"] = round(time.perf_counter() - t0, 3)

    li_q7 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
                 "l_discount"],
    )
    ord_q7 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    t0 = time.perf_counter()
    nation_trade_volume(
        li_q7, ord_q7, customer_nation_map(sf_dir), supplier_nation_map(sf_dir)
    ).count()
    queries["nation_trade_volume"] = round(time.perf_counter() - t0, 3)

    li_q11 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    brand_revenue_share(li_q11, part_brand_map(sf_dir)).count()
    queries["brand_revenue_share"] = round(time.perf_counter() - t0, 3)

    li_q16 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    )
    t0 = time.perf_counter()
    supplier_part_counts(
        li_q16, part_class_map(sf_dir), negative_balance_suppliers(sf_dir)
    ).count()
    queries["supplier_part_counts"] = round(time.perf_counter() - t0, 3)

    # --- round-3 analytic ops ----------------------------------------------
    from spider_ray.ops.windows import interarrival_quantiles

    ev_ia = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    t0 = time.perf_counter()
    interarrival_quantiles(ev_ia).count()
    queries["interarrival_quantiles"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.ngrams import zipf_slope

    t0 = time.perf_counter()
    zipf_slope(docs).count()
    queries["zipf_slope"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import host_triangles

    t0 = time.perf_counter()
    host_triangles(corpus).count()
    queries["host_triangles"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.cluster import kcenter_coreset

    emb_kc = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    t0 = time.perf_counter()
    kcenter_coreset(emb_kc).count()
    queries["kcenter_coreset"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.tpch2 import latest_shipper_orders

    li_q21 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_suppkey", "l_shipdate"],
    )
    t0 = time.perf_counter()
    latest_shipper_orders(li_q21, supplier_names(sf_dir)).count()
    queries["latest_shipper_orders"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import host_reciprocity

    t0 = time.perf_counter()
    host_reciprocity(corpus).count()
    queries["host_reciprocity"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.sampling import token_budget_trim

    docs_tb = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "source", "text"],
    )
    t0 = time.perf_counter()
    token_budget_trim(docs_tb).count()
    queries["token_budget_trim"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.behavior import event_trigrams

    ev_tg = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    t0 = time.perf_counter()
    event_trigrams(ev_tg).count()
    queries["event_trigrams"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import host_kcore, host_ppr

    t0 = time.perf_counter()
    host_kcore(corpus).count()
    queries["host_kcore"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    host_ppr(corpus).count()
    queries["host_ppr"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.linkgraph import host_cocitation

    t0 = time.perf_counter()
    host_cocitation(corpus).count()
    queries["host_cocitation"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.relational import daily_revenue_anomaly

    ord_dra = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )
    t0 = time.perf_counter()
    daily_revenue_anomaly(ord_dra).count()
    queries["daily_revenue_anomaly"] = round(time.perf_counter() - t0, 3)

    # --- round-4 additions --------------------------------------------------
    import shutil

    from spider_ray.pipelines.incremental import incremental_curation

    inc_out = "/tmp/spider_ray_scratch/bench_inc"
    shutil.rmtree(inc_out, ignore_errors=True)
    t0 = time.perf_counter()
    incremental_curation(docs, inc_out).count()
    queries["incremental_curation"] = round(time.perf_counter() - t0, 3)

    from spider_ray.sinks.warc import warc_export_roundtrip

    # one-host scope: the roundtrip is IO-proportional to corpus bytes by
    # design (it writes every payload twice); the bench times the sink
    # machinery, not 40 s of /tmp traffic for the whole sf0.1 corpus
    t0 = time.perf_counter()
    warc_export_roundtrip(
        corpus, "/tmp/spider_ray_scratch/bench_warc",
        url_prefix="https://www.site0.example/",
    ).count()
    queries["warc_roundtrip"] = round(time.perf_counter() - t0, 3)

    # cogroup scale paths timed next to their broadcast twins above
    t0 = time.perf_counter()
    tfidf_top_terms(docs, k=5, mode="cogroup").count()
    queries["tfidf_cogroup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    unigram_logprob(docs, mode="cogroup").count()
    queries["unigram_logprob_cogroup"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    robots_audit(corpus, mode="cogroup").count()
    queries["robots_audit_cogroup"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.textstats import bpe_token_counts

    t0 = time.perf_counter()
    bpe_token_counts(docs).count()
    queries["bpe_token_counts"] = round(time.perf_counter() - t0, 3)

    from spider_ray.ops.tpch2 import (
        bracket_revenue,
        late_shipment_priority,
        part_size_brand,
    )

    li_q12 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_shipdate"],
    )
    ord_q12 = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    t0 = time.perf_counter()
    late_shipment_priority(li_q12, ord_q12).count()
    queries["late_shipment_priority"] = round(time.perf_counter() - t0, 3)

    li_q19 = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    t0 = time.perf_counter()
    bracket_revenue(li_q19, part_size_brand(sf_dir)).count()
    queries["bracket_revenue"] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "crawl_full_sec",
        "value": round(crawl_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_name,
        "num_cpus": num_cpus,
        "pages_crawled": pages,
        "pages_parsed": n_parsed,
        "pages_per_sec": round(pages / crawl_sec, 1),
        "frontier_ops": crawler.frontier_ops,
        "frontier_ops_per_sec": round(crawler.frontier_ops / crawl_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run_once(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), BENCH_CRAWL_ONLY="1")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Ambient VM noise on this box is ±25-40% (documented in BASELINE.md) and
    # drifts on a minutes scale, so lo/hi reps run INTERLEAVED as (lo, hi)
    # pairs — both levels sample the same noise windows — and the reported
    # efficiency is best-of-K per level.  Per-rep walls are emitted so the
    # spread is visible instead of hidden behind a single ratio.
    lo, hi = int(os.environ.get("SCALE_LO", "2")), int(os.environ.get("SCALE_HI", "8"))
    reps = int(os.environ.get("SCALE_REPS", "2"))
    lo_runs, hi_runs, pair_effs = [], [], []
    for _ in range(reps):
        r_lo, r_hi = run_once(lo), run_once(hi)
        lo_runs.append(r_lo)
        hi_runs.append(r_hi)
        pair_effs.append(round((r_lo["value"] / r_hi["value"]) / (hi / lo), 3))
    r_lo = min(lo_runs, key=lambda r: r["value"])
    r_hi = min(hi_runs, key=lambda r: r["value"])
    t_lo, t_hi = r_lo["value"], r_hi["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": t_lo,
        "sec_hi": t_hi,
        "sec_lo_reps": [r["value"] for r in lo_runs],
        "sec_hi_reps": [r["value"] for r in hi_runs],
        "pairwise_efficiency": pair_effs,
        "pages_per_sec_lo": r_lo["pages_per_sec"],
        "pages_per_sec_hi": r_hi["pages_per_sec"],
        "frontier_ops_per_sec_lo": r_lo["frontier_ops_per_sec"],
        "frontier_ops_per_sec_hi": r_hi["frontier_ops_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": r_hi["sf"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
