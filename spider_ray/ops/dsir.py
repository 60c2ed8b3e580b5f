"""DSIR-style importance weights for targeted data selection.

Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): score every raw-pool document by how much more likely
its hashed n-gram features are under a TARGET distribution than under the
raw-pool distribution, then resample by weight.  This module computes the
per-document log importance weights — the expensive distributed part; the
final draw composes with the deterministic samplers in ``ops/sampling``.

Pinned spec (the sequential golden in ``goldens.seq_dsir_weights``
re-implements exactly this; shared pieces are only the token regex, the
stable hash and the constants, per the goldens ground rules):

* tokens: lowercase ``\\S+`` runs (the corpus token spec of
  ``ops/textstats``);
* features: every unigram and every adjacent bigram (``"tok1 tok2"``),
  hashed into ``B_BUCKETS = 10_000`` buckets with
  ``stable_hash_str(gram) % B``  (the paper's hashed n-gram model);
* bucket distributions: add-1-smoothed counts over the TARGET docs
  (``lang == target_lang``) and over ALL docs (the raw pool);
* per-bucket log ratio, quantized so sums are order-free int64 arithmetic
  (the ``unigram_logprob`` trick):
  ``lr[b] = round(1e6 * (ln((t[b]+1)/(t_tot+B)) - ln((r[b]+1)/(r_tot+B))))``
  with round = half away from zero;
* per-doc weight = int64 sum of ``lr[bucket]`` over the doc's feature
  occurrences (multiset — order irrelevant by construction).

Ray Data shape (two passes, both bounded):

1. count pass — ``map_batches`` emits per-batch DENSE bucket-count
   partials as sparse (bucket, raw_n, tgt_n) rows (≤ B rows per batch,
   B fixed at 10⁴), folded by one ``groupby(bucket)`` whose output is at
   most B rows — the shuffle is O(B × batches) 24-byte rows no matter the
   corpus size, and the driver holds one 10⁴-entry table;
2. score pass — the quantized log-ratio vector (80 KB) is ``ray.put``
   once and every scoring actor reads it from the object store; scoring
   is embarrassingly parallel ``map_batches``.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..hashing import stable_hash_str
from .textstats import _TOKEN_RE

B_BUCKETS = 10_000


def doc_buckets(text: str | None) -> list[int]:
    """A document's hashed feature-bucket occurrences (unigrams then
    bigrams; a multiset — consumers must be order-insensitive)."""
    toks = [tok.lower() for tok in _TOKEN_RE.findall(text or "")]
    grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
    return [stable_hash_str(g) % B_BUCKETS for g in grams]


def quantize_lr(t_n: int, t_tot: int, r_n: int, r_tot: int) -> int:
    """Per-bucket quantized log importance ratio (see module docstring)."""
    x = 1e6 * (
        math.log((t_n + 1) / (t_tot + B_BUCKETS))
        - math.log((r_n + 1) / (r_tot + B_BUCKETS))
    )
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def dsir_weights(ds, target_lang: str = "en", text_column: str = "text",
                 id_column: str = "doc_id", lang_column: str = "lang"):
    """``(doc_id, n_feats, dsir_logw_x1e6)`` per document — the DSIR log
    importance weight of every raw-pool doc toward the ``target_lang``
    slice, as an exact int64 (see module docstring for the pinned spec and
    the two-pass bounded-shuffle shape)."""
    import ray
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        raw = np.zeros(B_BUCKETS, dtype=np.int64)
        tgt = np.zeros(B_BUCKETS, dtype=np.int64)
        for lang, text in zip(
            batch.column(lang_column).to_pylist(),
            batch.column(text_column).to_pylist(),
        ):
            bks = doc_buckets(text)
            if not bks:
                continue
            bc = np.bincount(bks, minlength=B_BUCKETS)
            raw += bc
            if lang == target_lang:
                tgt += bc
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw_n": pa.array(raw[nz], pa.int64()),
                "tgt_n": pa.array(tgt[nz], pa.int64()),
            }
        )

    counts = (
        ds.select_columns([lang_column, text_column])
        .map_batches(partials, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("raw_n"), Sum("tgt_n"))
        .take_all()
    )
    raw_cnt = np.zeros(B_BUCKETS, dtype=np.int64)
    tgt_cnt = np.zeros(B_BUCKETS, dtype=np.int64)
    for r in counts:
        raw_cnt[r["bucket"]] = r["sum(raw_n)"]
        tgt_cnt[r["bucket"]] = r["sum(tgt_n)"]
    r_tot = int(raw_cnt.sum())
    t_tot = int(tgt_cnt.sum())
    lr = np.fromiter(
        (
            quantize_lr(int(tgt_cnt[b]), t_tot, int(raw_cnt[b]), r_tot)
            for b in range(B_BUCKETS)
        ),
        dtype=np.int64,
        count=B_BUCKETS,
    )
    lr_ref = ray.put(lr)

    class Scorer:
        def __init__(self):
            self.lr = ray.get(lr_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            lr = self.lr
            ids, n_feats, ws = [], [], []
            for doc_id, text in zip(
                batch.column(id_column).to_pylist(),
                batch.column(text_column).to_pylist(),
            ):
                bks = doc_buckets(text)
                ids.append(doc_id)
                n_feats.append(len(bks))
                ws.append(int(lr[bks].sum()) if bks else 0)
            return pa.table(
                {
                    id_column: pa.array(ids, pa.int64()),
                    "n_feats": pa.array(n_feats, pa.int64()),
                    "dsir_logw_x1e6": pa.array(ws, pa.int64()),
                }
            )

    from ..poolsize import autoscale_pool

    return ds.select_columns([id_column, text_column]).map_batches(
        Scorer, batch_format="pyarrow", concurrency=autoscale_pool(1)
    )
