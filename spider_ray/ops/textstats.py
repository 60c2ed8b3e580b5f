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
