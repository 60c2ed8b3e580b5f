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
