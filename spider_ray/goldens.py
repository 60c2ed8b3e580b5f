"""Golden-parquet oracles for the non-SQL-expressible driver queries.

The driver's correctness gate runs each ``queries()`` entry AND its
``oracle_sql()`` SQL side-by-side and compares rows+schema+value-hash.
Crawl pipelines and the sketch/statistics ops are iterative/stateful and not
directly SQL-expressible, so for each of them this module materializes a
GOLDEN Parquet computed by an *independent sequential implementation*:

* crawl queries   — the pure-Python reference-semantics oracle
  (:func:`spider_ray.oracle.crawl_oracle`, sequential, single process; the
  distributed Ray engine under test never touches this path);
* minhash/simhash/lang_id/fingerprints — plain-loop sequential
  recomputations in this file (no Ray, no shared operator code beyond the
  stable hash + parameter constants that define the algorithm);
* multimodal_decode — expected metadata recomputed from the fake-codec
  payload SPEC (generator parameters), not by running the decode stage.

``oracle_sql()`` then exposes ``SELECT … FROM read_parquet(golden)`` so
DuckDB performs an exact comparison.  Goldens live next to the fixture
corpus under ``/tmp/spider_ray_fixtures/{sf}/golden`` and are re-derived
whenever the version marker mismatches.
"""

from __future__ import annotations

import glob
import json
import os
import re
from collections import Counter, deque

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .hashing import stable_hash_str

GOLDEN_VERSION = 39

TESTDATA_BASE = "/root/testdata"


def golden_dir(sf_name: str) -> str:
    from .fixtures import FIXTURE_BASE

    return os.path.join(FIXTURE_BASE, sf_name, "golden")


def golden_path(sf_name: str, query: str) -> str:
    return os.path.join(golden_dir(sf_name), f"{query}.parquet")


# ---------------------------------------------------------------------------
# crawl query specs — SHARED with __ray_entry__ so query and golden always
# run the identical (config, seeds) job
# ---------------------------------------------------------------------------


def crawl_specs() -> dict[str, tuple]:
    """Seed entries are either ints (``fixtures.seed_of`` hosts) or literal
    seed URLs (the seed-redirect scenario host).  Entries may carry a 4th
    element: a module-level queue provider (mid-crawl injection)."""
    from .config import CrawlConfig
    from .fixtures import redirseed_seed

    return {
        "crawl_plain": (CrawlConfig(), (0,), "visited"),
        "crawl_pages": (CrawlConfig(), (0,), "pages"),
        "crawl_budget": (CrawlConfig().with_limit(50), (0,), "visited"),
        "crawl_robots": (CrawlConfig(respect_robots_txt=True), (0,), "visited"),
        "crawl_dedup": (CrawlConfig(normalize=True), (0,), "visited"),
        "crawl_multihost": (
            CrawlConfig(delay_ms=100, round_robin=True),
            (0, 1, 2, 3),
            "visited",
        ),
        "crawl_streaming": (CrawlConfig(normalize=True), (0, 1), "perhost"),
        # redirect semantics (redirect.py): default Loose follows the
        # fixture's chain/loop/off-scope/SSRF rows; Strict stops off-host;
        # the redirseed crawl exercises the seed-redirect selector rebuild
        "crawl_redirect_strict": (
            CrawlConfig(redirect_policy="strict"),
            (0,),
            "pages",
        ),
        "crawl_seed_redirect": (CrawlConfig(), (redirseed_seed(),), "pages"),
        # path-prefix budgets (website.rs:2051-2121): cumulative segment
        # counters decremented at admission, plus the wildcard page budget
        "crawl_path_budget": (
            CrawlConfig(budget=(("sec0", 5), ("sec1", 3), ("*", 60))),
            (0,),
            "visited",
        ),
        # subdomain scoping (page.rs:2966-2991): sub.site0.example pages
        # stay in scope when subdomains=True
        "crawl_subdomains": (CrawlConfig(subdomains=True), (0,), "visited"),
        # extra_links merged into the first frontier generation
        # (website.rs:7810-7812); one real cross-section page + one miss
        "crawl_extra_links": (
            CrawlConfig(
                extra_links=(
                    "https://www.site0.example/sec1/page0",
                    "https://www.site0.example/injected/missing",
                )
            ),
            (0,),
            "visited",
        ),
        # mid-crawl queue injection (channel_queue, website.rs:7528-7562):
        # the sitemap-orphan page injected after wave 0 — budgetless but
        # through the rest of the admission chain
        "crawl_queue": (
            CrawlConfig().with_limit(60),
            (0,),
            "visited",
            _hooks().queue_site0_orphan,
        ),
        # retry budget (configuration.rs:462, loop website.rs:4205-4253):
        # with retry=1 the flaky-once row succeeds on its second attempt
        # (and exposes its leaf link); flaky-always stays 503
        "crawl_retry": (CrawlConfig(retry=1), (0,), "pages"),
        # sitemap chain (website.rs:6975, 12408+): sitemap-discovered pages
        # admitted through the normal chain, links NOT expanded — includes
        # the orphan page reachable only via the sitemap
        "crawl_sitemap": (CrawlConfig(ignore_sitemap=False), (0,), "visited"),
        # sitemap AUTODISCOVERY (website.rs:12510-12546): the autosm host has
        # no /sitemap.xml; its homepage <link rel="sitemap"> points at the
        # non-conventional path whose urlset carries the orphan
        "crawl_sitemap_auto": (
            CrawlConfig(ignore_sitemap=False),
            (_autosm_seed(),),
            "visited",
        ),
        # regex filter mode (lib.rs:431-439 RegexSet): blacklist patterns
        # matched unanchored against the full URL
        "crawl_regex_filters": (
            CrawlConfig(blacklist=(r"/sec[12]/", r"/dup/"), filter_mode="regex"),
            (0,),
            "visited",
        ),
        # content gates: only_html Content-Type block (default-on; the
        # fixture's /download/* pdf+zip rows) and max_page_bytes truncation
        # (2 KiB cap truncates most leaf pages — links parsed from partial
        # bodies, truncated flag set)
        "crawl_content_gate": (
            CrawlConfig(max_page_bytes=2048),
            (0,),
            "pages",
        ),
        # user-extension hooks (§2.11): link rewrite at dispatch + post-fetch
        # page suppression (blocked_crawl, links not expanded)
        "crawl_hooks": (
            CrawlConfig(
                normalize=True,
                on_link_find=_hooks().rewrite_dup_a_to_leaf,
                on_should_crawl=_hooks().skip_section3,
            ),
            (0,),
            "pages",
        ),
    }


def _hooks():
    from .functions import hooks

    return hooks


def _autosm_seed() -> str:
    from .fixtures import autosm_seed

    return autosm_seed()


def visited_table(admitted_order: list[tuple[int, int, str]]) -> pa.Table:
    return pa.table(
        {
            "wave": pa.array([w for w, _, _ in admitted_order], pa.int32()),
            "seq": pa.array([s for _, s, _ in admitted_order], pa.int32()),
            "url": pa.array([u for _, _, u in admitted_order], pa.string()),
        }
    )


def perhost_table(admitted_order: list[tuple[int, int, str]]) -> pa.Table:
    """Per-host admission sequences — the invariant the streaming-admission
    engine preserves (its cross-host interleave is per-shard deterministic,
    not globally canonical; SURVEY.md §7.3)."""
    from .urlnorm import url_host

    counters: dict[str, int] = {}
    hosts, seqs, urls = [], [], []
    for _, _, u in admitted_order:
        h = url_host(u)
        n = counters.get(h, 0)
        counters[h] = n + 1
        hosts.append(h)
        seqs.append(n)
        urls.append(u)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "host_seq": pa.array(seqs, pa.int32()),
            "url": pa.array(urls, pa.string()),
        }
    )


def pages_table_from_oracle(pages: list[dict]) -> pa.Table:
    from .urlnorm import url_host

    return pa.table(
        {
            "url": pa.array([p["url"] for p in pages], pa.string()),
            "host": pa.array([url_host(p["url"]) for p in pages], pa.string()),
            "status_code": pa.array([p["status_code"] for p in pages], pa.int32()),
            "signature": pa.array([p["signature"] for p in pages], pa.uint64()),
            "title": pa.array([p["title"] for p in pages], pa.string()),
            "description": pa.array([p["description"] for p in pages], pa.string()),
            "og_image": pa.array([p["og_image"] for p in pages], pa.string()),
            "text": pa.array([p["text"] for p in pages], pa.string()),
            "final_redirect_destination": pa.array(
                [p.get("final_redirect_destination") for p in pages], pa.string()
            ),
            "blocked_crawl": pa.array(
                [bool(p.get("blocked_crawl")) for p in pages], pa.bool_()
            ),
            "truncated": pa.array([bool(p.get("truncated")) for p in pages], pa.bool_()),
            "wave": pa.array([p["wave"] for p in pages], pa.int32()),
        }
    )


def _build_crawl_goldens(sf_name: str, out: dict[str, pa.Table]) -> None:
    from .config import CrawlJob
    from .fixtures import SCALE_PARAMS, build_corpus, corpus_as_dict, seed_of
    from .oracle import crawl_oracle

    n_hosts, pph, _, page_weight = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])
    rows = build_corpus(n_hosts=n_hosts, pages_per_host=pph, seed=42, page_weight=page_weight)
    corpus = corpus_as_dict(rows)
    for name, spec in crawl_specs().items():
        cfg, seed_ks, shape = spec[:3]
        provider = spec[3] if len(spec) > 3 else None
        job = CrawlJob(
            tuple(seed_of(k) if isinstance(k, int) else k for k in seed_ks), cfg
        )
        res = crawl_oracle(job, corpus, queue_provider=provider)
        if shape == "visited":
            out[name] = visited_table(res.admitted_order)
        elif shape == "perhost":
            out[name] = perhost_table(res.admitted_order)
        elif shape == "pages":
            out[name] = pages_table_from_oracle(res.pages)
        if name == "crawl_pages":
            out["recrawl_diff"] = seq_recrawl_diff(res.pages)


def recrawl_prior_spec(url: str, signature: int | None) -> tuple[bool, int] | None:
    """The synthetic-prior derivation SPEC shared by the recrawl query and
    its golden: bucket = stable_hash("recrawl:"+url) % 4 → 0 omit (fresh page
    becomes *new*), 1 signature+1 (*changed*), 2/3 keep (*unchanged*);
    plus 3 fabricated /gone/ urls not in any crawl (*gone*)."""
    b = stable_hash_str("recrawl:" + url) % 4
    if b == 0:
        return None
    s = signature or 0
    return (b == 1, (s + 1) & 0xFFFFFFFFFFFFFFFF if b == 1 else s)


def seq_recrawl_diff(oracle_pages: list[dict]) -> pa.Table:
    """Independent recompute of the re-crawl diff classes over the oracle
    crawl's pages: plain dict membership + signature compare (the engine
    path is a broadcast map_batches over the distributed fresh pages)."""
    prior: dict[str, int] = {}
    for p in oracle_pages:
        spec = recrawl_prior_spec(p["url"], p.get("signature"))
        if spec is not None:
            prior[p["url"]] = spec[1]
    for i in range(3):
        prior[f"https://www.site0.example/gone/p{i}"] = i
    urls, classes = [], []
    fresh = {p["url"]: (p.get("signature") or 0) for p in oracle_pages}
    for u, s in fresh.items():
        urls.append(u)
        if u not in prior:
            classes.append("new")
        elif prior[u] == s:
            classes.append("unchanged")
        else:
            classes.append("changed")
    for u in sorted(prior):
        if u not in fresh:
            urls.append(u)
            classes.append("gone")
    return pa.table(
        {"url": pa.array(urls, pa.string()), "change": pa.array(classes, pa.string())}
    )


# ---------------------------------------------------------------------------
# sequential recomputations of the training-data ops
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"\w+", re.UNICODE)
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int = 3) -> set[int]:
    """Word-shingle hash set (the MinHash feature spec: ``k``-word shingles,
    deduplicated, stable-hashed, masked to the Mersenne field)."""
    words = _WORD_RE.findall((text or "").lower())
    if len(words) < k:
        shings = {" ".join(words)} if words else {""}
    else:
        shings = {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}
    return {stable_hash_str(s) & _MERSENNE for s in shings}


def seq_minhash_pairs(
    ids: list[int],
    texts: list[str],
    threshold: float = 0.5,
    num_perm: int = 128,
    n_bands: int = 16,
    shingle_size: int = 3,
    seed: int = 1337,
    max_bucket: int = 256,
    with_scores: bool = False,
) -> pa.Table:
    """Sequential MinHash+LSH near-dup pairs: signature → band buckets →
    candidate pairs → exact-Jaccard verify.  One process, plain dicts.
    ``with_scores`` adds the exact n-gram-Jaccard value per verified pair
    (the ``ngram_jaccard`` golden).

    Oversized-bucket spec (mirrors ``ops.dedup.bucket_pairs``): a bucket
    larger than ``max_bucket`` is chunked into consecutive runs of the
    ascending id list; all pairs within each chunk plus one (bucket min,
    chunk first) chain pair per later chunk."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    rows_per_band = num_perm // n_bands
    shingle_sets: dict[int, set[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = {}
    for doc_id, text in zip(ids, texts):
        sh = _shingle_hashes(text, shingle_size)
        shingle_sets[doc_id] = sh
        if sh:
            x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
            sig = ((a[:, None] * x[None, :] + b[:, None]) % _MERSENNE).min(axis=1).astype(np.uint64)
        else:
            sig = np.zeros(num_perm, dtype=np.uint64)
        for band in range(n_bands):
            band_bytes = sig[band * rows_per_band : (band + 1) * rows_per_band].tobytes()
            key = (band, stable_hash_str(band_bytes.hex()))
            buckets.setdefault(key, []).append(doc_id)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        ms = sorted(set(members))
        for start in range(0, len(ms), max_bucket):
            chunk = ms[start : start + max_bucket]
            if start > 0:
                cand.add((ms[0], chunk[0]))
            for i in range(len(chunk)):
                for j in range(i + 1, len(chunk)):
                    cand.add((chunk[i], chunk[j]))
    out_a, out_b, out_j = [], [], []
    for da, db in sorted(cand):
        sa, sb = shingle_sets[da], shingle_sets[db]
        jac = 1.0 if not sa and not sb else len(sa & sb) / max(1, len(sa | sb))
        if jac >= threshold:
            out_a.append(da)
            out_b.append(db)
            out_j.append(jac)
    cols = {"doc_a": pa.array(out_a, pa.int64()), "doc_b": pa.array(out_b, pa.int64())}
    if with_scores:
        cols["jaccard"] = pa.array(out_j, pa.float64())
    return pa.table(cols)


def seq_simhash64(text: str) -> int:
    """Independent expression of the 64-bit SimHash spec.  Bit layout note:
    the accumulator index ``i`` corresponds to bit ``8*(i//8) + 7 - i%8`` of
    the word hash (little-endian bytes unpacked MSB-first)."""
    words = set(_WORD_RE.findall((text or "").lower()))
    if not words:
        return 0
    acc = [0] * 64
    for w in words:
        h = stable_hash_str(w)
        for i in range(64):
            byte, j = divmod(i, 8)
            bit = (h >> (8 * byte + 7 - j)) & 1
            acc[i] += 1 if bit else -1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << i
    return out


def seq_simhash_near_dup(
    ids: list[int],
    texts: list[str],
    max_hamming: int = 3,
    max_bucket: int = 256,
) -> pa.Table:
    """Sequential SimHash near-dup pairs: 4×16-bit band buckets → in-bucket
    pairs (same oversized-bucket chunk/chain spec as the MinHash golden) →
    XOR-popcount verify ≤ ``max_hamming`` → cross-band dedup.  Plain dicts
    and loops, independent of ``ops.dedup.simhash_near_dup``."""
    sig_of = {d: seq_simhash64(t) for d, t in zip(ids, texts)}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d in ids:
        s = sig_of[d]
        for band in range(4):
            buckets.setdefault((band, (s >> (16 * band)) & 0xFFFF), []).append(d)
    seen: set[tuple[int, int]] = set()
    out_a, out_b, out_h = [], [], []
    for members in buckets.values():
        ms = sorted(set(members))
        cand: list[tuple[int, int]] = []
        for start in range(0, len(ms), max_bucket):
            chunk = ms[start : start + max_bucket]
            if start > 0:
                cand.append((ms[0], chunk[0]))
            for i in range(len(chunk)):
                for j in range(i + 1, len(chunk)):
                    cand.append((chunk[i], chunk[j]))
        for da, db in cand:
            if (da, db) in seen:
                continue
            h = bin(sig_of[da] ^ sig_of[db]).count("1")
            if h <= max_hamming:
                seen.add((da, db))
                out_a.append(da)
                out_b.append(db)
                out_h.append(h)
    return pa.table(
        {
            "doc_a": pa.array(out_a, pa.int64()),
            "doc_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )


def seq_lang_counts(texts: list[str]) -> pa.Table:
    from .ops.textstats import STOPWORDS

    def predict(text: str) -> str:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return "und"
        best_lang, best = None, 0
        for lang in sorted(STOPWORDS):
            s = sum(w in STOPWORDS[lang] for w in words)
            if s > best:
                best, best_lang = s, lang
        return best_lang if best > 0 else "und"

    counts = Counter(predict(t) for t in texts)
    langs = sorted(counts)
    return pa.table(
        {
            "lang_pred": pa.array(langs, pa.string()),
            "n": pa.array([counts[lang] for lang in langs], pa.int64()),
        }
    )


def seq_fingerprint_count(text: str, k: int = 8, window: int = 16) -> int:
    """Winnowing fingerprint count, sequential with a monotonic deque
    (O(n) sliding-window minimum; dedup of consecutive equal minima)."""
    t = text or ""
    if len(t) < k:
        return 1 if t else 0
    grams = [stable_hash_str(t[i : i + k]) for i in range(len(t) - k + 1)]
    if len(grams) <= window:
        return 1
    dq: deque[int] = deque()  # indices, increasing values
    count, last = 0, None
    for i, g in enumerate(grams):
        while dq and grams[dq[-1]] >= g:
            dq.pop()
        dq.append(i)
        if dq[0] <= i - window:
            dq.popleft()
        if i >= window - 1:
            m = grams[dq[0]]
            if m != last:
                count += 1
                last = m
    return count


def seq_fingerprints(ids: list[int], texts: list[str]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "doc_hash": pa.array([stable_hash_str(t or "") for t in texts], pa.uint64()),
            "n_fingerprints": pa.array(
                [seq_fingerprint_count(t) for t in texts], pa.int64()
            ),
        }
    )


_PUNCT_CHARS = frozenset(
    chr(c) for r in ((33, 47), (58, 64), (91, 96), (123, 126)) for c in range(r[0], r[1] + 1)
)


def seq_quality(ids: list[int], texts: list[str]) -> pa.Table:
    """Independent quality-metric recompute: punctuation counted by char-set
    membership (not the regex), stopwords via the en table."""
    from .ops.textstats import STOPWORDS

    stop_en = STOPWORDS["en"]
    n_chars, punct, stop, mwl = [], [], [], []
    for t in texts:
        t = t or ""
        n_chars.append(len(t))
        n_p = sum(c in _PUNCT_CHARS for c in t)
        punct.append(n_p / max(1, len(t)))
        words = _WORD_RE.findall(t.lower())
        stop.append(sum(w in stop_en for w in words) / max(1, len(words)))
        mwl.append(sum(len(w) for w in words) / max(1, len(words)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "punct_ratio": pa.array(punct, pa.float64()),
            "stopword_ratio": pa.array(stop, pa.float64()),
            "mean_word_len": pa.array(mwl, pa.float64()),
        }
    )


def seq_sequence_packing(
    ids: list[int], texts: list[str], budget: int = 256, n_parts: int = 8
) -> pa.Table:
    """Independent sequential recompute of the pinned packing spec
    (``ops/packing.py``): per ``doc_id % n_parts`` stream, in doc_id order,
    greedy-append while the running total fits, oversized docs alone."""
    import re

    tok = re.compile(r"\S+")
    per: dict[int, list[tuple[int, int]]] = {}
    for i, t in sorted(zip(ids, texts)):
        per.setdefault(i % n_parts, []).append((i, len(tok.findall(t or ""))))
    cols = {"doc_id": [], "part": [], "bin_id": [], "n_tokens": []}
    for p in sorted(per):
        cur_bin, cur_tot = 0, 0
        for i, nt in per[p]:
            if cur_tot > 0 and cur_tot + nt > budget:
                cur_bin += 1
                cur_tot = 0
            cols["doc_id"].append(i)
            cols["part"].append(p)
            cols["bin_id"].append(cur_bin)
            cols["n_tokens"].append(nt)
            cur_tot += nt
    return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})


def seq_tfidf(ids: list[int], texts: list[str], k: int = 5) -> pa.Table:
    """Independent sequential recompute of the pinned tf·idf spec
    (``ops/tfidf.py``): df over distinct lowercased \\S+ tokens,
    ``idf = ln((1+N)/(1+df)) + 1``, top-k per doc by (score desc, term asc),
    score rounded to 9."""
    import math
    import re
    from collections import Counter

    tok = re.compile(r"\S+")
    toks_per_doc = [tok.findall((t or "").lower()) for t in texts]
    df: Counter = Counter()
    for toks in toks_per_doc:
        df.update(set(toks))
    n = len(ids)
    cols = {"doc_id": [], "term": [], "rank": [], "score": []}
    for i, toks in zip(ids, toks_per_doc):
        tf = Counter(toks)
        scored = sorted(
            ((t, c * (math.log((1 + n) / (1 + df[t])) + 1.0)) for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        for r, (term, score) in enumerate(scored, start=1):
            cols["doc_id"].append(i)
            cols["term"].append(term)
            cols["rank"].append(r)
            cols["score"].append(round(score, 9))
    return pa.table(
        {
            "doc_id": pa.array(cols["doc_id"], pa.int64()),
            "term": pa.array(cols["term"], pa.string()),
            "rank": pa.array(cols["rank"], pa.int64()),
            "score": pa.array(cols["score"], pa.float64()),
        }
    )


def seq_near_dup_clusters(ids: list[int], texts: list[str], threshold: float = 0.5) -> pa.Table:
    """Independent connected components: iterative min-label propagation over
    the sequential pair list until fixpoint (no union-find)."""
    pairs_tbl = seq_minhash_pairs(ids, texts, threshold=threshold)
    pairs = list(
        zip(pairs_tbl.column("doc_a").to_pylist(), pairs_tbl.column("doc_b").to_pylist())
    )
    label = {d: d for pair in pairs for d in pair}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    members = sorted(label)
    return pa.table(
        {
            "doc_id": pa.array(members, pa.int64()),
            "cluster_id": pa.array([label[m] for m in members], pa.int64()),
        }
    )


def seq_lsh_ann(sf_dir: str, k: int = 10, n_planes: int = 8, seed: int = 7) -> pa.Table:
    """Independent LSH-ANN recompute: hyperplanes from the pinned
    RandomState(seed) spec, sign-bit buckets, query buckets from the 5
    lowest vec_ids, exact cosine top-k over the pruned candidate set with
    the (−round(sim,9), vec_id) tie-break."""
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_ids = np.asarray(emb.column("vec_id"))
    order = np.argsort(vec_ids)
    vec_ids = vec_ids[order]
    mat = np.asarray(
        emb.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(emb.num_rows, -1)[order]
    planes = np.random.RandomState(seed).standard_normal((n_planes, mat.shape[1]))
    signs = (mat @ planes.T) > 0
    buckets = (signs * (1 << np.arange(n_planes))).sum(axis=1)
    qrows = np.arange(5)  # 5 lowest vec_ids (sorted order)
    qbuckets = set(buckets[qrows].tolist())
    keep = np.isin(buckets, list(qbuckets))
    cand_ids, cand = vec_ids[keep], mat[keep]
    qm = mat[qrows]
    qn = qm / np.maximum(np.linalg.norm(qm, axis=1, keepdims=True), 1e-12)
    cn = cand / np.maximum(np.linalg.norm(cand, axis=1, keepdims=True), 1e-12)
    sims = cn @ qn.T
    out_q, out_id, out_rank = [], [], []
    for qi in range(len(qrows)):
        key = np.lexsort((cand_ids, -np.round(sims[:, qi], 9)))
        for rank, row in enumerate(key[:k], 1):
            out_q.append(qi)
            out_id.append(int(cand_ids[row]))
            out_rank.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


def seq_ivf_ann(sf_dir: str, k: int = 10, n_cells: int = 16, nprobe: int = 4) -> pa.Table:
    """Independent IVF-ANN recompute: centroids = embeddings of the n_cells
    vec_ids with the smallest Knuth hash ``(id·2654435761) mod 2³²`` (ties
    by id; ascending-id centroid order), cell assignment =
    argmax(round(cos,9)) (first-max → lowest cell), queries = 5 lowest
    vec_ids probing their nprobe best cells, exact cosine top-k over the
    probed union with the (−round(sim,9), vec_id) tie-break."""
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_ids = np.asarray(emb.column("vec_id"))
    order = np.argsort(vec_ids)
    vec_ids = vec_ids[order]
    mat = np.asarray(
        emb.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(emb.num_rows, -1)[order]
    n = len(vec_ids)
    h = (vec_ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    sel_rows = np.sort(np.lexsort((vec_ids, h))[: min(n_cells, n)])
    cents = mat[sel_rows]
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    cells = np.argmax(np.round(mn @ cents.T, 9), axis=1)
    qrows = np.arange(5)
    qn = mn[qrows]
    qsims = np.round(qn @ cents.T, 9)
    probed: set[int] = set()
    actual_cells = cents.shape[0]
    for qi in range(len(qrows)):
        probed.update(np.lexsort((np.arange(actual_cells), -qsims[qi]))[:nprobe].tolist())
    keep = np.isin(cells, sorted(probed))
    cand_ids, cn = vec_ids[keep], mn[keep]
    sims = cn @ qn.T
    out_q, out_id, out_rank = [], [], []
    for qi in range(len(qrows)):
        key = np.lexsort((cand_ids, -np.round(sims[:, qi], 9)))
        for rank, row in enumerate(key[:k], 1):
            out_q.append(qi)
            out_id.append(int(cand_ids[row]))
            out_rank.append(rank)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
        }
    )


def seq_curate(
    ids: list[int], texts: list[str], langs: list[str],
    rates: dict[str, float] | None = None, threshold: float = 0.5,
) -> pa.Table:
    """Independent sequential recompute of the curation chain
    (``ops/curate.py`` spec): Gopher keep (integer rules) → exact dedup by
    RAW text (dict, not hash) → near-dup drop via seq_minhash_pairs +
    min-label propagation over the exact survivors → Knuth-hash per-lang
    sample → whitespace token counts."""
    import re

    rates = rates or {"en": 0.5, "de": 0.1, "es": 0.1, "fr": 0.1, "zh": 0.1}
    tok = re.compile(r"\S+")
    stop = {"the", "a", "of", "to", "and", "in", "is", "that", "for", "on"}

    def keep_quality(t: str) -> bool:
        words = tok.findall(t or "")
        w, c = len(words), sum(len(x) for x in words)
        s = sum(1 for x in words if x.lower() in stop)
        return (
            50 <= w <= 100_000 and 3 * w <= c <= 10 * w and s >= 2 and 100 * s >= 6 * w
        )

    kept = [(i, t, l) for i, t, l in zip(ids, texts, langs) if keep_quality(t)]
    first_by_text: dict[str, int] = {}
    for i, t, _ in sorted(kept):
        first_by_text.setdefault(t, i)
    winners = set(first_by_text.values())
    exact = [(i, t, l) for i, t, l in kept if i in winners]

    pairs_tbl = seq_minhash_pairs(
        [i for i, _, _ in exact], [t for _, t, _ in exact], threshold=threshold
    )
    pairs = list(
        zip(pairs_tbl.column("doc_a").to_pylist(), pairs_tbl.column("doc_b").to_pylist())
    )
    label = {d: d for pair in pairs for d in pair}
    changed = True
    while changed:
        changed = False
        for a, b in pairs:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    drop = {d for d, c in label.items() if d != c}

    out = {"doc_id": [], "lang": [], "n_tokens": []}
    for i, t, l in exact:
        if i in drop:
            continue
        lim = int(rates.get(l, 0) * (1 << 32))
        if (i * 2654435761) % (1 << 32) >= lim:
            continue
        out["doc_id"].append(i)
        out["lang"].append(l)
        out["n_tokens"].append(len(tok.findall(t or "")))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "lang": pa.array(out["lang"], pa.string()),
            "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        }
    )


def seq_needs_js(sf_name: str) -> pa.Table:
    """Independent needs_js recompute: same pattern tables
    (page.rs:1840-1877 — they ARE the spec) but matched with one compiled
    regex alternation instead of the engine's per-pattern substring loop."""
    import re

    from .fixtures import ensure_scale

    pats = [
        ".innerHTML", ".outerHTML", "document.write(", "document.createElement(",
        "appendChild(", "history.pushState", "history.replaceState",
        "location.replace(", "location.assign(", "fetch(", "XMLHttpRequest",
        'id="__next"', 'id="___gatsby"', 'id="__nuxt"', 'id="app"', 'id="root"',
        "data-reactroot", "ng-version",
    ]
    rx = re.compile("|".join(re.escape(p) for p in pats))
    corpus_dir = ensure_scale(sf_name)
    urls, flags = [], []
    for path in sorted(
        glob.glob(os.path.join(corpus_dir, "*", "*.parquet"))
        or glob.glob(os.path.join(corpus_dir, "*.parquet"))
    ):
        t = pq.read_table(path, columns=["url", "html"])
        for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            txt = (h or b"").decode("utf-8", "replace") if isinstance(h, (bytes, bytearray)) else (h or "")
            urls.append(u)
            flags.append(rx.search(txt) is not None)
    order = sorted(range(len(urls)), key=lambda i: urls[i])
    return pa.table(
        {
            "url": pa.array([urls[i] for i in order], pa.string()),
            "needs_js": pa.array([flags[i] for i in order], pa.bool_()),
        }
    )


def seq_anchor_terms(sf_name: str, k: int = 10) -> pa.Table:
    """Sequential recompute of the anchor-text aggregation: plain page
    loop over the corpus applying the pinned per-page extractor
    (``ops/anchors.page_anchor_terms`` — pinned by its own unit tables in
    tests/test_chunk_bm25_sample.py / test_ops), one Python Counter fold,
    per-target (n DESC, term) top-k — no Ray, no combiner, no shuffle."""
    from collections import Counter

    from .fixtures import ensure_scale
    from .ops.anchors import page_anchor_terms

    corpus_dir = ensure_scale(sf_name)
    counts: Counter = Counter()
    for path in sorted(
        glob.glob(os.path.join(corpus_dir, "*", "*.parquet"))
        or glob.glob(os.path.join(corpus_dir, "*.parquet"))
    ):
        t = pq.read_table(path, columns=["url", "html"])
        for u, h in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
            if isinstance(h, (bytes, bytearray)):
                h = h.decode("utf-8", "replace")
            counts.update(page_anchor_terms(u, h))
    per_target: dict[str, list[tuple[str, int]]] = {}
    for (target, term), n in counts.items():
        per_target.setdefault(target, []).append((term, n))
    targets, terms, ns, ranks = [], [], [], []
    for target in sorted(per_target):
        pairs = sorted(per_target[target], key=lambda p: (-p[1], p[0]))[:k]
        for rank, (term, n) in enumerate(pairs, 1):
            targets.append(target)
            terms.append(term)
            ns.append(n)
            ranks.append(rank)
    return pa.table(
        {
            "target": pa.array(targets, pa.string()),
            "term": pa.array(terms, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "rank": pa.array(ranks, pa.int64()),
        }
    )


def seq_scrape_transform(sf_name: str, return_format: str) -> pa.Table:
    """Sequential recompute of the scrape content transform over the fixture
    corpus: plain page-by-page loop (no Ray) applying the pinned converter
    spec (``markdown.transform_html``) to every 200-status html page —
    verifies the distributed transform plumbing (pruned read, visited
    filter, actor-pool stage, batching/encoding); the converter itself is
    pinned by its own 1:1 unit tables (tests/test_markdown.py)."""
    from .fixtures import ensure_scale
    from .markdown import transform_html

    corpus_dir = ensure_scale(sf_name)
    urls, contents = [], []
    for path in sorted(
        glob.glob(os.path.join(corpus_dir, "*", "*.parquet"))
        or glob.glob(os.path.join(corpus_dir, "*.parquet"))
    ):
        t = pq.read_table(path, columns=["url", "html", "status"])
        for u, h, s in zip(
            t.column("url").to_pylist(),
            t.column("html").to_pylist(),
            t.column("status").to_pylist(),
        ):
            if s != 200 or u.endswith("robots.txt") or u.endswith("sitemap.xml"):
                continue
            urls.append(u)
            contents.append(transform_html(h or b"", return_format))
    order = sorted(range(len(urls)), key=lambda i: urls[i])
    return pa.table(
        {
            "url": pa.array([urls[i] for i in order], pa.string()),
            "content": pa.array([contents[i] for i in order], pa.string()),
        }
    )


def seq_multimodal_audio(n_items: int = 48) -> pa.Table:
    """Expected audio metadata straight from the fake-codec payload SPEC
    (``FAKEAUD:{sr}:{n}:`` + int16 PCM from RandomState(id ^ 0xA0D10))."""
    ids, srs, counts, durs, rms = [], [], [], [], []
    for i in range(n_items):
        sr = 8000 + (i % 4) * 4000
        n = 1000 + i * 37
        samples = np.random.RandomState(i ^ 0xA0D10).randint(
            -(1 << 14), 1 << 14, size=n, dtype=np.int16
        )
        ids.append(i)
        srs.append(sr)
        counts.append(n)
        durs.append(n / sr)
        rms.append(float(np.sqrt(np.mean(samples.astype(np.float64) ** 2))))
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "sample_rate": pa.array(srs, pa.int32()),
            "n_samples": pa.array(counts, pa.int64()),
            "duration_s": pa.array(durs, pa.float64()),
            "rms": pa.array(rms, pa.float64()),
        }
    )


def seq_multimodal_frames(n_videos: int = 24, stride: int = 2) -> pa.Table:
    """Expected frame-sample + decode metadata straight from the fake-video
    payload SPEC (video i = frames j∈[0, 3+i%5) of ``fake_image(i*100+j,
    8+(i+j)%8, 4+(i+j)%4)`` in the length-prefixed FAKEVID container; every
    ``stride``-th frame kept)."""
    ids, fidx, widths, heights, lumas = [], [], [], [], []
    for i in range(n_videos):
        n_frames = 3 + i % 5
        for j in range(0, n_frames, stride):
            w, h = 8 + (i + j) % 8, 4 + (i + j) % 4
            px = np.random.RandomState(i * 100 + j).randint(0, 256, size=w * h, dtype=np.uint8)
            ids.append(i)
            fidx.append(j)
            widths.append(w)
            heights.append(h)
            lumas.append(float(px.mean()) if px.size else 0.0)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(fidx, pa.int32()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "mean_luma": pa.array(lumas, pa.float64()),
        }
    )


def seq_multimodal_decode(n_items: int = 64) -> pa.Table:
    """Expected image metadata straight from the fake-codec payload SPEC
    (header ``FAKEIMG:{w}x{h}:`` + w*h uint8 pixels from RandomState(id))."""
    ids, widths, heights, sizes, lumas = [], [], [], [], []
    for i in range(n_items):
        w, h = 8 + i % 8, 4 + i % 4
        px = np.random.RandomState(i).randint(0, 256, size=w * h, dtype=np.uint8)
        ids.append(i)
        widths.append(w)
        heights.append(h)
        sizes.append(len(f"FAKEIMG:{w}x{h}:".encode()) + w * h)
        lumas.append(float(px.mean()) if px.size else 0.0)
    return pa.table(
        {
            "item_id": pa.array(ids, pa.int64()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "n_bytes": pa.array(sizes, pa.int64()),
            "mean_luma": pa.array(lumas, pa.float64()),
        }
    )


def seq_link_graph(sf_name: str) -> pa.Table:
    """Sequential host-pair edge extraction over the fixture corpus.

    Independent of the distributed path: uses the single-purpose
    ``htmlparse.extract_links_and_meta`` (not the fused single-pass parser)
    page-by-page in a plain loop; link semantics are defined identically
    (anchors, per-page first-seen dedup, external_domains="*")."""
    from collections import Counter as _Counter

    from .fixtures import SCALE_PARAMS, build_corpus
    from .htmlparse import extract_links_and_meta
    from .ops.linkgraph import _page_root
    from .scope import get_page_selectors
    from .urlnorm import url_host_port

    n_hosts, pph, _, page_weight = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])
    rows = build_corpus(n_hosts=n_hosts, pages_per_host=pph, seed=42, page_weight=page_weight)
    counts: _Counter = _Counter()
    for r in sorted(rows, key=lambda r: r["url"]):
        url = r["url"]
        if r["status"] != 200 or not r["html"]:
            continue
        if url.endswith("robots.txt") or url.endswith("sitemap.xml"):
            continue
        html = r["html"]
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", "replace")
        h, p = url_host_port(url)
        src = f"{h}:{p}" if p is not None else h
        ex = extract_links_and_meta(
            html,
            url,
            _page_root(url),
            get_page_selectors(url, False, False),
            external_domains=frozenset({"*"}),
        )
        for link in ex.links:
            dh, dp = url_host_port(link)
            dst = f"{dh}:{dp}" if dp is not None else dh
            counts[(src, dst)] += 1
    pairs = sorted(counts.items())
    return pa.table(
        {
            "src_host": pa.array([s for (s, _), _ in pairs], pa.string()),
            "dst_host": pa.array([d for (_, d), _ in pairs], pa.string()),
            "n_links": pa.array([c for _, c in pairs], pa.int64()),
        }
    )


def seq_top_backlinks(sf_name: str, k: int = 100) -> pa.Table:
    """Sequential top-k backlinked URLs (plain loop over the corpus spec
    with the single-purpose extractor, like ``seq_link_graph``; count unit
    = linking page, per-page first-seen dedup; order (n desc, url asc))."""
    from collections import Counter as _Counter

    from .fixtures import SCALE_PARAMS, build_corpus
    from .htmlparse import extract_links_and_meta
    from .ops.linkgraph import _page_root
    from .scope import get_page_selectors

    n_hosts, pph, _, page_weight = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])
    rows = build_corpus(n_hosts=n_hosts, pages_per_host=pph, seed=42, page_weight=page_weight)
    counts: _Counter = _Counter()
    for r in sorted(rows, key=lambda r: r["url"]):
        url = r["url"]
        if r["status"] != 200 or not r["html"]:
            continue
        if url.endswith("robots.txt") or url.endswith("sitemap.xml"):
            continue
        html = r["html"]
        if isinstance(html, (bytes, bytearray)):
            html = html.decode("utf-8", "replace")
        ex = extract_links_and_meta(
            html,
            url,
            _page_root(url),
            get_page_selectors(url, False, False),
            external_domains=frozenset({"*"}),
        )
        counts.update(ex.links)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "url": pa.array([u for u, _ in top], pa.string()),
            "n_backlinks": pa.array([c for _, c in top], pa.int64()),
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        }
    )


def seq_robots_audit(sf_name: str) -> pa.Table:
    """Sequential robots-compliance audit (plain loop over the corpus spec).
    Shares ``robots.RobotFileParser`` with the engine the way the crawl
    oracle does — the parser IS the pinned decision-table semantic
    (1:1-ported from parser.rs and pinned by tests/test_robots.py), not
    operator plumbing; everything else here is an independent dict loop."""
    from .fixtures import SCALE_PARAMS, build_corpus
    from .ops.robotsaudit import AUDIT_AGENT, _decode
    from .robots import RobotFileParser

    n_hosts, pph, _, page_weight = SCALE_PARAMS.get(sf_name, SCALE_PARAMS["unit"])
    rows = build_corpus(n_hosts=n_hosts, pages_per_host=pph, seed=42, page_weight=page_weight)
    robots: dict[str, RobotFileParser] = {}
    for r in rows:
        if r["url"].endswith("robots.txt"):
            host = r["url"].split("://", 1)[1].split("/", 1)[0]
            p = RobotFileParser()
            p.read_status(r["status"], _decode(r["html"]))
            robots[host] = p
    n_pages: dict[str, int] = {}
    n_dis: dict[str, int] = {}
    for r in rows:
        url = r["url"]
        if r["status"] != 200 or url.endswith("robots.txt") or url.endswith("sitemap.xml"):
            continue
        host = url.split("://", 1)[1].split("/", 1)[0]
        n_pages[host] = n_pages.get(host, 0) + 1
        p = robots.get(host)
        if p is not None and not p.can_fetch(AUDIT_AGENT, url):
            n_dis[host] = n_dis.get(host, 0) + 1
    hosts = sorted(n_pages)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "n_pages": pa.array([n_pages[h] for h in hosts], pa.int64()),
            "n_disallowed": pa.array([n_dis.get(h, 0) for h in hosts], pa.int64()),
        }
    )


def seq_lang_confusion(ids_unused, texts, langs) -> pa.Table:
    """Sequential (lang, predicted) confusion counts — same plain-loop
    predictor as ``seq_lang_counts``."""
    from .ops.textstats import STOPWORDS

    def predict(text: str) -> str:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return "und"
        best_lang, best = None, 0
        for lang in sorted(STOPWORDS):
            s = sum(w in STOPWORDS[lang] for w in words)
            if s > best:
                best, best_lang = s, lang
        return best_lang if best > 0 else "und"

    counts = Counter((lang, predict(t)) for lang, t in zip(langs, texts))
    keys = sorted(counts)
    return pa.table(
        {
            "lang": pa.array([k[0] for k in keys], pa.string()),
            "lang_pred": pa.array([k[1] for k in keys], pa.string()),
            "n": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )


def seq_host_degrees(edges: pa.Table) -> pa.Table:
    """Degree rollup from the sequential edge table (dict loop)."""
    stats: dict[str, list[int]] = {}  # host -> [out_deg, in_deg, out_links, in_links]
    for s, d, n in zip(
        edges.column("src_host").to_pylist(),
        edges.column("dst_host").to_pylist(),
        edges.column("n_links").to_pylist(),
    ):
        st = stats.setdefault(s, [0, 0, 0, 0])
        st[0] += 1
        st[2] += n
        st = stats.setdefault(d, [0, 0, 0, 0])
        st[1] += 1
        st[3] += n
    hosts = sorted(stats)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "out_degree": pa.array([stats[h][0] for h in hosts], pa.int64()),
            "in_degree": pa.array([stats[h][1] for h in hosts], pa.int64()),
            "out_links": pa.array([stats[h][2] for h in hosts], pa.int64()),
            "in_links": pa.array([stats[h][3] for h in hosts], pa.int64()),
        }
    )


def seq_host_components(edges: pa.Table) -> pa.Table:
    """Connected components of the undirected host graph by plain
    union-find; component id = min host string in the component.  The
    independent sequential twin of ``ops/linkgraph.host_components``
    (label-propagation min converges to exactly this labeling)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(
        edges.column("src_host").to_pylist(), edges.column("dst_host").to_pylist()
    ):
        for h in (s, d):
            if h not in parent:
                parent[h] = h
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rd] = rs
    comp_min: dict[str, str] = {}
    roots = {h: find(h) for h in parent}
    for h, r in roots.items():
        if r not in comp_min or h < comp_min[r]:
            comp_min[r] = h
    hosts = sorted(parent)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "component": pa.array([comp_min[roots[h]] for h in hosts], pa.string()),
        }
    )


def seq_host_pagerank(edges: pa.Table, damping: float = 0.85, iters: int = 10) -> pa.Table:
    """Plain-loop PageRank with the pinned accumulation order (ascending
    (dst, src) edge order; ascending-host dangling sum; float64 throughout;
    final round to 12 decimals) — bit-compatible with the op spec in
    ``ops/linkgraph.py`` by construction of the order, not shared code."""
    pair_list = sorted(
        zip(edges.column("src_host").to_pylist(), edges.column("dst_host").to_pylist())
    )
    hosts = sorted({h for e in pair_list for h in e})
    n = len(hosts)
    out_deg: dict[str, int] = {h: 0 for h in hosts}
    for s, _ in pair_list:
        out_deg[s] += 1
    dangling_hosts = [h for h in hosts if out_deg[h] == 0]
    by_dst_src = sorted(pair_list, key=lambda e: (e[1], e[0]))
    r = {h: 1.0 / n for h in hosts}
    base = (1.0 - damping) / n
    for _ in range(iters):
        contrib = {h: 0.0 for h in hosts}
        for s, d in by_dst_src:
            contrib[d] += r[s] / out_deg[s]
        dangling = sum(r[h] for h in dangling_hosts)
        r = {h: base + damping * (contrib[h] + dangling / n) for h in hosts}
    ranks = np.round(np.array([r[h] for h in hosts], dtype=np.float64), 12)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "pagerank": pa.array(ranks, pa.float64()),
        }
    )


def seq_host_kcore(edges: pa.Table) -> pa.Table:
    """INDEPENDENT k-core implementation (dict-based min-degree peeling —
    core numbers are graph-theoretically unique, so any correct algorithm
    is an oracle for the kernel's vectorized peel)."""
    pairs = {
        tuple(sorted((s, d)))
        for s, d in zip(edges.column("src_host").to_pylist(),
                        edges.column("dst_host").to_pylist())
        if s != d
    }
    adj: dict[str, set] = {}
    for x, y in pairs:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    deg = {h: len(nb) for h, nb in adj.items()}
    core: dict[str, int] = {}
    alive = set(adj)
    k = 0
    while alive:
        # Matula–Beck: peel the min-degree vertex; its core number is the
        # running max of min-degrees seen so far
        h = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[h])
        core[h] = k
        alive.remove(h)
        for nb in adj[h]:
            if nb in alive:
                deg[nb] -= 1
    hosts = sorted(core)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "core": pa.array([int(core[h]) for h in hosts], pa.int64()),
        }
    )


def seq_host_ppr(edges: pa.Table, damping: float = 0.85, iters: int = 10) -> pa.Table:
    """Plain-loop personalized PageRank with the pinned accumulation order
    (mirrors seq_host_pagerank; teleport + dangling mass to the seed = the
    lexicographically smallest host that has an outgoing edge)."""
    pair_list = sorted(
        zip(edges.column("src_host").to_pylist(), edges.column("dst_host").to_pylist())
    )
    hosts = sorted({h for e in pair_list for h in e})
    out_deg: dict[str, int] = {h: 0 for h in hosts}
    for s, _ in pair_list:
        out_deg[s] += 1
    dangling_hosts = [h for h in hosts if out_deg[h] == 0]
    by_dst_src = sorted(pair_list, key=lambda e: (e[1], e[0]))
    seed = min(s for s, _ in pair_list) if pair_list else hosts[0]
    e_vec = {h: (1.0 if h == seed else 0.0) for h in hosts}
    r = dict(e_vec)
    for _ in range(iters):
        contrib = {h: 0.0 for h in hosts}
        for s, d in by_dst_src:
            contrib[d] += r[s] / out_deg[s]
        dangling = sum(r[h] for h in dangling_hosts)
        r = {
            h: (1.0 - damping) * e_vec[h]
            + damping * (contrib[h] + dangling * e_vec[h])
            for h in hosts
        }
    vals = np.round(np.array([r[h] for h in hosts], dtype=np.float64), 12)
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "ppr": pa.array(vals, pa.float64()),
        }
    )


def _build_ops_goldens(sf_dir: str, out: dict[str, pa.Table]) -> None:
    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = docs.column("doc_id").to_pylist()
    texts = docs.column("text").to_pylist()
    out["minhash_pairs"] = seq_minhash_pairs(ids, texts, threshold=0.5)
    out["ngram_jaccard"] = seq_minhash_pairs(
        ids, texts, threshold=0.5, with_scores=True
    )
    out["sequence_packing"] = seq_sequence_packing(ids, texts)
    out["tfidf_top_terms"] = seq_tfidf(ids, texts)
    langs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["lang"]
    ).column("lang").to_pylist()
    out["curate_corpus"] = seq_curate(ids, texts, langs)
    out["near_dup_clusters"] = seq_near_dup_clusters(ids, texts, threshold=0.5)
    out["quality_scores"] = seq_quality(ids, texts)
    out["dup_ngram_spans"] = seq_dup_ngram_spans(ids, texts)
    out["remove_dup_spans"] = seq_remove_dup_spans(ids, texts)
    if os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        out["lsh_ann"] = seq_lsh_ann(sf_dir)
        out["ivf_ann"] = seq_ivf_ann(sf_dir)
        out["kmeans_clusters"] = seq_kmeans_clusters(sf_dir)
        out["embedding_pca"] = seq_embedding_pca(sf_dir)
        out["semdedup"] = seq_semdedup(sf_dir)
        out["kcenter_coreset"] = seq_kcenter(sf_dir)
        out["pq_ann"] = seq_pq_ann(sf_dir)
    out["simhash"] = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "simhash": pa.array([seq_simhash64(t) for t in texts], pa.uint64()),
        }
    )
    out["simhash_near_dup"] = seq_simhash_near_dup(ids, texts, max_hamming=3)
    out["dsir_weights"] = seq_dsir_weights(ids, texts, langs)
    out["lang_confusion"] = seq_lang_confusion(ids, texts, langs)
    out["lang_id"] = seq_lang_counts(texts)
    out["fingerprints"] = seq_fingerprints(ids, texts)
    out["multimodal_decode"] = seq_multimodal_decode(64)
    out["multimodal_audio"] = seq_multimodal_audio(48)
    out["multimodal_frames"] = seq_multimodal_frames(24)


def seq_dsir_weights(ids, texts, langs, target_lang: str = "en",
                     n_buckets: int = 10_000) -> pa.Table:
    """Sequential DSIR importance weights (Xie et al. 2023 hashed-n-gram
    model; spec pinned in ``ops/dsir.py``'s docstring).  One Python
    process, plain Counter loops — no Ray, no shared operator code beyond
    the token regex, the stable hash and the constants."""
    import math
    from collections import Counter

    tok_re = re.compile(r"\S+")

    def buckets_of(text):
        toks = [t.lower() for t in tok_re.findall(text or "")]
        grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
        return [stable_hash_str(g) % n_buckets for g in grams]

    per_doc = [buckets_of(t) for t in texts]
    raw_c: Counter = Counter()
    tgt_c: Counter = Counter()
    for lang, bks in zip(langs, per_doc):
        raw_c.update(bks)
        if lang == target_lang:
            tgt_c.update(bks)
    r_tot = sum(raw_c.values())
    t_tot = sum(tgt_c.values())

    def lr(b):
        x = 1e6 * (
            math.log((tgt_c.get(b, 0) + 1) / (t_tot + n_buckets))
            - math.log((raw_c.get(b, 0) + 1) / (r_tot + n_buckets))
        )
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    lr_map = {b: lr(b) for b in range(n_buckets)}
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_feats": pa.array([len(b) for b in per_doc], pa.int64()),
            "dsir_logw_x1e6": pa.array(
                [sum(lr_map[b] for b in bks) for bks in per_doc], pa.int64()
            ),
        }
    )


def seq_dup_ngram_spans(
    ids: list[int], texts: list[str], k: int = 8, min_count: int = 2
) -> pa.Table:
    """Sequential recompute of the duplicate n-gram span spec
    (ops/spans.py): lowercase \\S+ tokens, k-token gram hashes, grams with
    total corpus count >= min_count, per-doc merged [start, end) spans."""
    tok_re = re.compile(r"\S+")
    doc_grams: list[np.ndarray] = []
    counts: Counter = Counter()
    for t in texts:
        toks = tok_re.findall((t or "").lower())
        g = np.array(
            [stable_hash_str(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)],
            dtype=np.uint64,
        )
        doc_grams.append(g)
        counts.update(g.tolist())
    out_id, out_s, out_e = [], [], []
    for doc_id, g in zip(ids, doc_grams):
        spans: list[list[int]] = []
        for i, h in enumerate(g.tolist()):
            if counts[h] < min_count:
                continue
            s, e = i, i + k
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], e)
            else:
                spans.append([s, e])
        for s, e in spans:
            out_id.append(doc_id)
            out_s.append(s)
            out_e.append(e)
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "span_start": pa.array(out_s, pa.int64()),
            "span_end": pa.array(out_e, pa.int64()),
        }
    )


def seq_remove_dup_spans(
    ids: list[int], texts: list[str], k: int = 8, min_count: int = 2
) -> pa.Table:
    """Sequential recompute of symmetric duplicate-span removal: lowercase
    \\S+ tokens, corpus-duplicated k-gram spans dropped, survivors
    re-joined with single spaces."""
    spans = seq_dup_ngram_spans(ids, texts, k=k, min_count=min_count)
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for doc_id, s, e in zip(
        spans.column("doc_id").to_pylist(),
        spans.column("span_start").to_pylist(),
        spans.column("span_end").to_pylist(),
    ):
        by_doc.setdefault(doc_id, []).append((s, e))
    tok_re = re.compile(r"\S+")
    out_id, out_text, out_n, out_rm = [], [], [], []
    for doc_id, t in zip(ids, texts):
        toks = tok_re.findall((t or "").lower())
        drop = np.zeros(len(toks), dtype=bool)
        for s, e in by_doc.get(doc_id, ()):
            drop[s:e] = True
        out_id.append(doc_id)
        out_text.append(" ".join(tok for tok, d in zip(toks, drop) if not d))
        out_n.append(len(toks))
        out_rm.append(int(drop.sum()))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "clean_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
            "n_removed": pa.array(out_rm, pa.int64()),
        }
    )


def _seq_kmeans_centroids(
    ids: np.ndarray, m: np.ndarray, k: int, iters: int
) -> np.ndarray:
    """Sequential Lloyd fit per the ops/cluster.py pinned spec: unit rows,
    (knuth_hash, id)-sampled init ordered by id, round-9 argmax assignment,
    int64-quantized (x1e6, half away from zero) centroid sums."""
    hv = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    pick = np.lexsort((ids, hv))[:k]
    centroids = m[pick][np.argsort(ids[pick], kind="stable")]
    for _ in range(iters):
        a = np.argmax(np.round(m @ centroids.T, 9), axis=1)
        q = (np.sign(m) * np.floor(np.abs(m) * 1e6 + 0.5)).astype(np.int64)
        sums = np.zeros((k, m.shape[1]), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        np.add.at(sums, a, q)
        np.add.at(cnt, a, 1)
        nonempty = cnt > 0
        new = centroids.copy()
        new[nonempty] = (sums[nonempty] / 1e6) / cnt[nonempty, None]
        centroids = new / np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
    return centroids


def _read_unit_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(emb.column("vec_id"), dtype=np.int64)
    flat = np.asarray(emb.column("embedding").combine_chunks().flatten(), dtype=np.float64)
    m = flat.reshape(len(ids), -1)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    return ids, m


def seq_pq_ann(sf_dir: str, k: int = 10, m: int = 4, nbits: int = 4) -> pa.Table:
    """Independent PQ-ADC recompute (ops/similarity.pq_top_k pinned spec):
    codebook rows = the 2^nbits Knuth-min vec_ids' unit rows (ascending-id
    order), codebook_j = contiguous subspace slice (not renormalized),
    codes by first-min argmin of round(lane-wise ||x_j - c||^2, 9), ADC
    distance = integer sum of round(d2, 9)*1e9 per subspace, queries = the
    5 lowest vec_ids, top-k by (adist asc, vec_id asc)."""
    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vec_ids = np.asarray(emb.column("vec_id"))
    order = np.argsort(vec_ids)
    vec_ids = vec_ids[order]
    mat = np.asarray(
        emb.column("embedding").combine_chunks().flatten(), dtype=np.float64
    ).reshape(emb.num_rows, -1)[order]
    mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    n = len(vec_ids)
    n_codes = 1 << nbits
    h = (vec_ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    sel_rows = np.sort(np.lexsort((vec_ids, h))[: min(n_codes, n)])
    cents = mat[sel_rows]
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    d = cents.shape[1]
    sub = d // m
    qn = mn[:5]
    adc = np.zeros((qn.shape[0], m, cents.shape[0]), dtype=np.int64)
    dist = np.zeros((n, qn.shape[0]), dtype=np.int64)
    for j in range(m):
        lo, hi = j * sub, (j + 1) * sub
        cj = cents[:, lo:hi]
        qd2 = np.round(np.sum((qn[:, lo:hi][:, None, :] - cj[None, :, :]) ** 2,
                              axis=2), 9)
        adc[:, j, :] = np.rint(qd2 * 1e9).astype(np.int64)
        vd2 = np.round(np.sum((mn[:, lo:hi][:, None, :] - cj[None, :, :]) ** 2,
                              axis=2), 9)
        codes = np.argmin(vd2, axis=1)
        dist += adc[:, j, :][:, codes].T
    out_q, out_id, out_rank, out_d = [], [], [], []
    for qi in range(qn.shape[0]):
        sel = np.lexsort((vec_ids, dist[:, qi]))[:k]
        for rank, row in enumerate(sel, 1):
            out_q.append(qi)
            out_id.append(int(vec_ids[row]))
            out_rank.append(rank)
            out_d.append(int(dist[row, qi]))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "rank": pa.array(out_rank, pa.int64()),
            "adist_x1e9": pa.array(out_d, pa.int64()),
        }
    )


def seq_kcenter(sf_dir: str, k: int = 8) -> pa.Table:
    """Sequential greedy k-center (farthest-point) spec — the exact oracle
    for ``ops/cluster.kcenter_coreset``: unit vectors in float64, first
    center = smallest vec_id, each round picks the point with the SMALLEST
    round-9 cosine to its nearest chosen center (ties by smaller id)."""
    ids, m = _read_unit_embeddings(sf_dir)
    order = np.argsort(ids, kind="stable")
    ids, m = ids[order], m[order]
    if len(ids) == 0:
        return pa.table({"sel_order": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64())})
    centers = [0]
    for _ in range(1, min(k, len(ids))):
        sims = np.round(m @ m[centers].T, 9).max(axis=1)
        sims[centers] = np.inf  # never re-pick a center
        j = int(np.argmin(sims))  # first index == smallest id (ids sorted)
        centers.append(j)
    return pa.table(
        {
            "sel_order": pa.array(range(len(centers)), pa.int64()),
            "vec_id": pa.array(ids[centers], pa.int64()),
        }
    )

def seq_embedding_pca(sf_dir: str, top_k: int = 4) -> pa.Table:
    """Sequential PCA under the pinned integer-moment spec of
    ``ops/cluster.embedding_pca``: because the folded moments are integer
    sums of ``round(x·1e3)`` quantities, ANY partitioning gives the same
    S and C bits — this one-pass recompute is the exact oracle."""
    _, m = _read_unit_embeddings(sf_dir)
    qp = 1_000.0
    q = (np.sign(m) * np.floor(np.abs(m) * qp + 0.5)).astype(np.int64)
    n, d = q.shape
    s = q.sum(axis=0)
    c = q.T @ q
    cov = (c / (qp * qp) - np.outer(s, s) / (qp * qp * n)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals, kind="stable")[:top_k]
    comps, dims, loads, eigs = [], [], [], []
    for rank, j in enumerate(order):
        v = evecs[:, j]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.extend([rank] * d)
        dims.extend(range(d))
        loads.extend(np.round(v, 9).tolist())
        eigs.extend([round(float(evals[j]), 9)] * d)
    return pa.table(
        {
            "component": pa.array(comps, pa.int64()),
            "dim": pa.array(dims, pa.int64()),
            "loading": pa.array(loads, pa.float64()),
            "eigenvalue": pa.array(eigs, pa.float64()),
        }
    )


def seq_host_hits(edges: pa.Table, iters: int = 10) -> pa.Table:
    """Plain-loop HITS with the pinned orders of ``ops/linkgraph._hits_kernel``
    (authority pass in ascending (dst, src) edge order, hub pass in
    ascending (src, dst); L2 norms via ``math.fsum`` of the squares —
    correctly rounded, so order-free; round-12 output) — bit-compatible
    by construction of the orders, not shared code."""
    import math

    pair_list = sorted(
        zip(edges.column("src_host").to_pylist(), edges.column("dst_host").to_pylist())
    )
    hosts = sorted({h for e in pair_list for h in e})
    by_dst_src = sorted(pair_list, key=lambda e: (e[1], e[0]))
    hub = {h: 1.0 for h in hosts}
    auth = {h: 1.0 for h in hosts}
    for _ in range(iters):
        auth = {h: 0.0 for h in hosts}
        for s, d in by_dst_src:
            auth[d] += hub[s]
        norm = math.sqrt(math.fsum(v * v for v in auth.values()))
        if norm > 0:
            auth = {h: v / norm for h, v in auth.items()}
        hub = {h: 0.0 for h in hosts}
        for s, d in pair_list:  # ascending (src, dst)
            hub[s] += auth[d]
        norm = math.sqrt(math.fsum(v * v for v in hub.values()))
        if norm > 0:
            hub = {h: v / norm for h, v in hub.items()}
    return pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "hub": pa.array(
                np.round(np.array([hub[h] for h in hosts], dtype=np.float64), 12),
                pa.float64(),
            ),
            "authority": pa.array(
                np.round(np.array([auth[h] for h in hosts], dtype=np.float64), 12),
                pa.float64(),
            ),
        }
    )


def seq_kmeans_clusters(sf_dir: str, k: int = 8, iters: int = 4) -> pa.Table:
    ids, m = _read_unit_embeddings(sf_dir)
    centroids = _seq_kmeans_centroids(ids, m, k, iters)
    a = np.argmax(np.round(m @ centroids.T, 9), axis=1)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64()),
        }
    )


def seq_semdedup(sf_dir: str, k: int = 8, iters: int = 4, tau: float = 0.45) -> pa.Table:
    """Greedy within-cluster semantic dedup (SemDeDup) sequential spec."""
    ids, m = _read_unit_embeddings(sf_dir)
    centroids = _seq_kmeans_centroids(ids, m, k, iters)
    a = np.argmax(np.round(m @ centroids.T, 9), axis=1)
    out_id, out_cl, out_keep = [], [], []
    for cl in range(k):
        rows = np.nonzero(a == cl)[0]
        rows = rows[np.argsort(ids[rows], kind="stable")]
        kept: list[int] = []
        for r in rows:
            dup = bool(kept) and bool(
                np.any(np.round(m[kept] @ m[r], 9) >= tau)
            )
            out_id.append(int(ids[r]))
            out_cl.append(cl)
            out_keep.append(not dup)
            if not dup:
                kept.append(r)
    return pa.table(
        {
            "vec_id": pa.array(out_id, pa.int64()),
            "cluster": pa.array(out_cl, pa.int64()),
            "keep": pa.array(out_keep, pa.bool_()),
        }
    )


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------

GOLDEN_QUERIES = (
    "crawl_plain",
    "crawl_pages",
    "crawl_budget",
    "crawl_robots",
    "crawl_dedup",
    "crawl_multihost",
    "crawl_streaming",
    "crawl_redirect_strict",
    "crawl_seed_redirect",
    "crawl_hooks",
    "crawl_content_gate",
    "crawl_regex_filters",
    "crawl_path_budget",
    "crawl_subdomains",
    "crawl_extra_links",
    "crawl_sitemap",
    "crawl_sitemap_auto",
    "crawl_retry",
    "crawl_queue",
    "recrawl_diff",
    "minhash_pairs",
    "ngram_jaccard",
    "sequence_packing",
    "tfidf_top_terms",
    "curate_corpus",
    "near_dup_clusters",
    "quality_scores",
    "lsh_ann",
    "ivf_ann",
    "kmeans_clusters",
    "embedding_pca",
    "semdedup",
    "kcenter_coreset",
    "pq_ann",
    "dup_ngram_spans",
    "remove_dup_spans",
    "simhash",
    "simhash_near_dup",
    "dsir_weights",
    "lang_confusion",
    "lang_id",
    "fingerprints",
    "multimodal_decode",
    "multimodal_audio",
    "multimodal_frames",
    "link_graph",
    "needs_js",
    "host_degrees",
    "host_pagerank",
    "host_hits",
    "top_backlinks",
    "robots_audit",
    "host_components",
    "host_kcore",
    "host_ppr",
    "scrape_markdown",
    "scrape_commonmark",
    "scrape_xml",
    "anchor_terms",
)


def ensure_goldens(sf_name: str, sf_dir: str | None = None) -> str:
    """Idempotently materialize every golden for ``sf_name``; returns the
    golden directory.  ``sf_dir`` is the testdata dir holding
    ``documents.parquet`` (defaults to ``/root/testdata/{sf_name}``)."""
    from .fixtures import GENERATOR_VERSION

    if sf_dir is None:
        sf_dir = os.path.join(TESTDATA_BASE, sf_name)
    gdir = golden_dir(sf_name)
    marker = os.path.join(gdir, "_golden_manifest.json")
    stamp = {
        "golden_version": GOLDEN_VERSION,
        "gen_version": GENERATOR_VERSION,
        "sf": sf_name,
        "sf_dir": sf_dir,
    }
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f) == stamp:
                return gdir
    os.makedirs(gdir, exist_ok=True)
    tables: dict[str, pa.Table] = {}
    _build_crawl_goldens(sf_name, tables)
    lg = seq_link_graph(sf_name)
    tables["link_graph"] = lg
    tables["needs_js"] = seq_needs_js(sf_name)
    tables["scrape_markdown"] = seq_scrape_transform(sf_name, "markdown")
    tables["scrape_commonmark"] = seq_scrape_transform(sf_name, "commonmark")
    tables["scrape_xml"] = seq_scrape_transform(sf_name, "xml")
    tables["anchor_terms"] = seq_anchor_terms(sf_name)
    tables["host_degrees"] = seq_host_degrees(lg)
    tables["host_pagerank"] = seq_host_pagerank(lg)
    tables["host_hits"] = seq_host_hits(lg)
    tables["top_backlinks"] = seq_top_backlinks(sf_name)
    tables["robots_audit"] = seq_robots_audit(sf_name)
    tables["host_components"] = seq_host_components(lg)
    tables["host_kcore"] = seq_host_kcore(lg)
    tables["host_ppr"] = seq_host_ppr(lg)
    if os.path.exists(os.path.join(sf_dir, "documents.parquet")):
        _build_ops_goldens(sf_dir, tables)
    else:  # no documents table at this scale — multimodal is still derivable
        tables["multimodal_decode"] = seq_multimodal_decode(64)
        tables["multimodal_audio"] = seq_multimodal_audio(48)
        tables["multimodal_frames"] = seq_multimodal_frames(24)
    for name, tbl in tables.items():
        pq.write_table(tbl, golden_path(sf_name, name))
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stamp, f)
    os.replace(tmp, marker)
    return gdir


def golden_sql(sf_name: str) -> dict[str, str]:
    """DuckDB oracle SQL for every goldened query."""
    out = {}
    for name in GOLDEN_QUERIES:
        out[name] = f"SELECT * FROM read_parquet('{golden_path(sf_name, name)}')"
    return out
