"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting.  All vectorized-per-batch ``map_batches`` stages
(compiled regexes + stopword tables built once per actor)."""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

from ..hashing import stable_hash_str

_TOKEN_RE = re.compile(r"\S+")
_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[!-/:-@\[-`{-~]")

# Small per-language stopword tables (n-gram-free heuristic language ID).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for", "was", "on", "with"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que", "pour", "dans", "du"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von", "mit", "für"},
    "es": {"el", "la", "los", "las", "de", "y", "un", "una", "es", "que", "por", "para", "con"},
}


class TokenCounter:
    """Whitespace tokens + BPE-ish word-piece count.

    ``n_tokens``: count of ``\\S+`` runs (SQL-expressible oracle);
    ``n_words``: count of ``\\w+`` runs; ``n_chars``: len(text)."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n_tokens = [len(_TOKEN_RE.findall(t or "")) for t in texts]
        n_words = [len(_WORD_RE.findall(t or "")) for t in texts]
        n_chars = [len(t or "") for t in texts]
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )


class QualityScorer:
    """Heuristic quality metrics: length, punctuation ratio, stopword ratio,
    mean word length, alpha ratio."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column
        self.stop_en = STOPWORDS["en"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        n = len(texts)
        n_chars = np.empty(n, dtype=np.int64)
        punct_ratio = np.empty(n, dtype=np.float64)
        stop_ratio = np.empty(n, dtype=np.float64)
        mean_word_len = np.empty(n, dtype=np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            punct_ratio[i] = len(_PUNCT_RE.findall(t)) / max(1, len(t))
            words = _WORD_RE.findall(t.lower())
            stop_ratio[i] = sum(w in self.stop_en for w in words) / max(1, len(words))
            mean_word_len[i] = sum(map(len, words)) / max(1, len(words))
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "n_chars": pa.array(n_chars, pa.int64()),
                "punct_ratio": pa.array(punct_ratio, pa.float64()),
                "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                "mean_word_len": pa.array(mean_word_len, pa.float64()),
            }
        )


class LangId:
    """Stopword-voting language identifier (en/fr/de/es; 'und' when no
    evidence).  Deterministic tie-break: lexicographic language code."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    def predict(self, text: str) -> str:
        words = _WORD_RE.findall((text or "").lower())
        if not words:
            return "und"
        scores = {
            lang: sum(w in table for w in words) for lang, table in STOPWORDS.items()
        }
        best = max(scores.values())
        if best == 0:
            return "und"
        return min(lang for lang, s in scores.items() if s == best)

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.predict(t) for t in batch.column(self.text_column).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )


class Fingerprinter:
    """Rolling-hash document fingerprint: winnowed set of k-gram hashes
    (min-sampled), plus a whole-document stable hash."""

    def __init__(self, k: int = 8, window: int = 16, text_column: str = "text",
                 id_column: str = "doc_id"):
        self.k = k
        self.window = window
        self.text_column = text_column
        self.id_column = id_column

    def fingerprint(self, text: str) -> list[int]:
        t = text or ""
        if len(t) < self.k:
            return [stable_hash_str(t)] if t else []
        grams = np.fromiter(
            (stable_hash_str(t[i : i + self.k]) for i in range(len(t) - self.k + 1)),
            dtype=np.uint64,
        )
        w = self.window
        if len(grams) <= w:
            return [int(grams.min())]
        # winnowing: min of each sliding window, deduped in order
        mins = np.lib.stride_tricks.sliding_window_view(grams, w).min(axis=1)
        out, last = [], None
        for m in mins:
            if m != last:
                out.append(int(m))
                last = m
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_column).to_pylist()
        fps = [self.fingerprint(t) for t in texts]
        doc_hash = [stable_hash_str(t or "") for t in texts]
        return pa.table(
            {
                "doc_id": batch.column(self.id_column),
                "doc_hash": pa.array(doc_hash, pa.uint64()),
                "fingerprint": pa.array(fps, pa.list_(pa.uint64())),
            }
        )


# ---------------------------------------------------------------------------
# corpus unigram language model -> per-doc log-prob (perplexity-proxy score)
# ---------------------------------------------------------------------------


def unigram_logprob(ds, text_column: str = "text", id_column: str = "doc_id",
                    concurrency: int = 4):
    """Per-doc unigram log-probability — the standard perplexity-proxy
    quality score (CCNet/RefinedWeb filter on LM perplexity, reduced to the
    order-0 model so the oracle is exact SQL).

    Pinned spec: tokens are lowercase ``\\S+`` runs; a term seen ``c``
    times in a corpus of ``N`` tokens scores
    ``lp(term) = round(ln(c / N) * 1e6)`` (half away from zero, int64);
    a doc's score is the int64 sum of its tokens' ``lp``.

    Shape: one ``map_batches`` emits per-batch partial term counts, a
    ``groupby(term)`` folds them, and the scoring pass broadcasts ONLY the
    repeated terms (count >= 2): a lookup miss is exactly count 1 with
    ``lp = round(ln(1/N) * 1e6)`` — the same hapax-elision trick as
    ``tfidf.py``, so the broadcast dict is bounded by the repeated-term
    vocabulary, not the corpus vocabulary.
    """
    import math

    import ray
    import pyarrow.compute as pc

    def term_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch.column(text_column).to_pylist():
            c.update(tok.lower() for tok in _TOKEN_RE.findall(t or ""))
        return pa.table(
            {
                "term": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(term_partials, batch_format="pyarrow")
        .groupby("term")
        .sum("n")
        .materialize()
    )
    total = int(counts.sum("sum(n)"))
    repeated = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("sum(n)"), 2)),
        batch_format="pyarrow",
    ).take_all()

    def _lp(c: int) -> int:
        x = math.log(c / total) * 1e6
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    lp_map = {r["term"]: _lp(r["sum(n)"]) for r in repeated}
    hapax_lp = _lp(1)
    lp_ref = ray.put(lp_map)

    class Scorer:
        def __init__(self):
            self.lp = ray.get(lp_ref) if not isinstance(lp_ref, dict) else lp_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            lp = self.lp
            ids, n_toks, sums = [], [], []
            for doc_id, t in zip(
                batch.column(id_column).to_pylist(),
                batch.column(text_column).to_pylist(),
            ):
                toks = [tok.lower() for tok in _TOKEN_RE.findall(t or "")]
                ids.append(doc_id)
                n_toks.append(len(toks))
                sums.append(sum(lp.get(tok, hapax_lp) for tok in toks))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_tokens": pa.array(n_toks, pa.int64()),
                    "sum_logp_x1e6": pa.array(sums, pa.int64()),
                }
            )

    return ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )


class HeuristicFilter:
    """C4-style document-level heuristic filter, integer-exact.

    Per doc over lowercase ``\\S+`` tokens: ``n_words``, ``n_distinct``,
    ``max_tf`` (count of the most frequent term); keep iff
    ``10 <= n_words <= 100000`` (C4 length gate), ``2*n_distinct >=
    n_words`` (repetition gate: a doc may not be half one-word padding)
    and ``8*max_tf <= n_words`` (no single term above 12.5%).  Pure
    per-doc map — no shuffle at any scale."""

    def __init__(self, text_column: str = "text", id_column: str = "doc_id"):
        self.text_column = text_column
        self.id_column = id_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, n_words, n_distinct, max_tf, keep = [], [], [], [], []
        for doc_id, t in zip(
            batch.column(self.id_column).to_pylist(),
            batch.column(self.text_column).to_pylist(),
        ):
            c = Counter(tok.lower() for tok in _TOKEN_RE.findall(t or ""))
            nw = sum(c.values())
            nd = len(c)
            mx = max(c.values()) if c else 0
            ids.append(doc_id)
            n_words.append(nw)
            n_distinct.append(nd)
            max_tf.append(mx)
            keep.append(10 <= nw <= 100000 and 2 * nd >= nw and 8 * mx <= nw)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_distinct": pa.array(n_distinct, pa.int64()),
                "max_tf": pa.array(max_tf, pa.int64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )


def heuristic_filter(ds, text_column: str = "text", id_column: str = "doc_id"):
    """(doc_id, n_words, n_distinct, max_tf, keep) per document."""
    return ds.map_batches(
        HeuristicFilter(text_column=text_column, id_column=id_column),
        batch_format="pyarrow",
    )


def bigram_logprob(ds, text_column: str = "text", id_column: str = "doc_id",
                   concurrency: int = 4):
    """Per-doc order-1 (bigram) conditional log-probability — one step
    closer to real LM perplexity than ``unigram_logprob``, still with an
    exact SQL oracle.

    Pinned spec: tokens are lowercase ``\\S+`` runs; each position i >= 2
    scores ``lp = round(ln(c(w_{i-1} w_i) / c(w_{i-1})) * 1e6)`` (half
    away from zero, int64); a doc's score is the int64 sum plus the
    bigram count.

    Scale: ONE tagged shuffle folds bigram and unigram counts together;
    the scoring broadcast keeps only repeated items (count >= 2) — a
    bigram miss is exactly count 1 (``lp = round(ln(1/c(prev)) * 1e6)``)
    and a unigram miss is exactly count 1 (then its bigram count is also
    1, so ``lp = 0``) — the hapax-elision trick, both dicts bounded by
    the repeated vocabulary."""
    import math

    import ray
    import pyarrow.compute as pc

    SEP = " "

    def count_partials(batch: pa.Table) -> pa.Table:
        from collections import Counter

        uni: Counter = Counter()
        bi: Counter = Counter()
        for t in batch.column(text_column).to_pylist():
            toks = [tok.lower() for tok in _TOKEN_RE.findall(t or "")]
            uni.update(toks)
            bi.update(
                toks[i - 1] + SEP + toks[i] for i in range(1, len(toks))
            )
        keys = list(uni.keys()) + list(bi.keys())
        kinds = [0] * len(uni) + [1] * len(bi)
        ns = list(uni.values()) + list(bi.values())
        return pa.table(
            {
                "kind": pa.array(kinds, pa.int8()),
                "key": pa.array(keys, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    counts = (
        ds.map_batches(count_partials, batch_format="pyarrow")
        .groupby(["kind", "key"])
        .sum("n")
    )
    repeated = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("sum(n)"), 2)),
        batch_format="pyarrow",
    ).take_all()
    uni_map = {r["key"]: r["sum(n)"] for r in repeated if r["kind"] == 0}
    bi_map = {r["key"]: r["sum(n)"] for r in repeated if r["kind"] == 1}
    refs = ray.put((uni_map, bi_map))

    class Scorer:
        def __init__(self):
            self.uni, self.bi = ray.get(refs)

        def __call__(self, batch: pa.Table) -> pa.Table:
            uni, bi = self.uni, self.bi
            ids, n_bi, sums = [], [], []
            for doc_id, t in zip(
                batch.column(id_column).to_pylist(),
                batch.column(text_column).to_pylist(),
            ):
                toks = [tok.lower() for tok in _TOKEN_RE.findall(t or "")]
                s = 0
                for i in range(1, len(toks)):
                    cu = uni.get(toks[i - 1], 1)
                    cb = bi.get(toks[i - 1] + SEP + toks[i], 1)
                    x = math.log(cb / cu) * 1e6
                    s += int(math.copysign(math.floor(abs(x) + 0.5), x))
                ids.append(doc_id)
                n_bi.append(max(len(toks) - 1, 0))
                sums.append(s)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "n_bigrams": pa.array(n_bi, pa.int64()),
                    "sum_logp_x1e6": pa.array(sums, pa.int64()),
                }
            )

    return ds.map_batches(
        Scorer, batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5
    )


def url_features(corpus_dir: str):
    """``(url, url_len, n_slash, n_query_params, n_digits)`` per corpus
    page — the URL-shape signals behind FineWeb/C4-style URL filtering
    (deep paths, parameter-heavy or digit-heavy URLs correlate with
    boilerplate/spam).  Pure Arrow kernels, zero parse, columns pruned to
    ``url`` at the read; the SQL oracle computes the identical integers.

    * ``url_len``        — character length;
    * ``n_slash``        — '/' occurrences (path depth + 2 scheme slashes);
    * ``n_query_params`` — 0 without '?', else '&' count + 1;
    * ``n_digits``       — decimal-digit characters.
    """
    import pyarrow.compute as pc
    import ray.data

    pages = ray.data.read_parquet(corpus_dir, columns=["url"])

    def feats(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        has_q = pc.cast(
            pc.greater(pc.count_substring(urls, "?"), 0), pa.int64()
        )
        n_amp = pc.cast(pc.count_substring(urls, "&"), pa.int64())
        stripped = pc.replace_substring_regex(urls, pattern="[0-9]", replacement="")
        return pa.table(
            {
                "url": urls,
                "url_len": pc.cast(pc.utf8_length(urls), pa.int64()),
                "n_slash": pc.cast(pc.count_substring(urls, "/"), pa.int64()),
                "n_query_params": pc.add(
                    pc.multiply(n_amp, has_q), has_q
                ),
                "n_digits": pc.subtract(
                    pc.cast(pc.utf8_length(urls), pa.int64()),
                    pc.cast(pc.utf8_length(stripped), pa.int64()),
                ),
            }
        )

    return pages.map_batches(feats, batch_format="pyarrow")


def lang_confusion(ds, lang_column: str = "lang", text_column: str = "text"):
    """``(lang, lang_pred, n)`` confusion matrix of the metadata language
    label vs the stopword-voting ``LangId`` heuristic — the standard
    calibration readout before trusting a cheap classifier at corpus
    scale.  Per-batch (lang, pred) Counter combiner → one tiny groupby
    (≤ |langs|² rows) regardless of corpus size."""
    from collections import Counter

    lid = LangId()

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for lang, text in zip(
            batch.column(lang_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            c[(lang, lid.predict(text))] += 1
        keys = list(c.keys())
        return pa.table(
            {
                "lang": pa.array([k[0] for k in keys], pa.string()),
                "lang_pred": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    import pyarrow.compute as pc

    agg = (
        ds.select_columns([lang_column, text_column])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .sum("n")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "lang_pred": b.column("lang_pred"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def host_lang_mix(corpus_dir: str):
    """``(host, lang, n_pages)`` — per-host language mix of the held
    corpus (the crawl-steering readout: which hosts yield which
    languages).  Pruned two-column read, per-batch C++ ``group_by``
    combiner, one slim (host, lang) fold — page html never read."""
    import pyarrow.compute as pc
    import ray.data

    from .textclean import _hosts_of

    pages = ray.data.read_parquet(corpus_dir, columns=["url", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"host": _hosts_of(batch.column("url")), "lang": batch.column("lang")}
        )
        return (
            t.group_by(["host", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["host", "lang", "n_pages"])
        )

    agg = (
        pages.map_batches(partial, batch_format="pyarrow")
        .groupby(["host", "lang"])
        .sum("n_pages")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "host": b.column("host"),
                "lang": b.column("lang"),
                "n_pages": pc.cast(b.column("sum(n_pages)"), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
