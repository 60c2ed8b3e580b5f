"""Deterministic sampling for training-data curation.

A 100-TB corpus is down-sampled per stratum (language, source, quality
band) with *reproducible* membership: the keep decision is a pure function
of the row key, so re-runs, resumed runs and the SQL oracle all agree with
no RNG state to ship.  The hash is Knuth's multiplicative scheme
``(key * 2654435761) mod 2^32`` — trivially expressible in ANSI SQL, well
mixed for sequential ids, and independent of Python's seeded RNGs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KNUTH = 2654435761
MOD = 1 << 32


def _bucket(keys: np.ndarray) -> np.ndarray:
    return (keys.astype(np.uint64) * KNUTH) % MOD


def stratified_sample(ds, rates: dict[str, float], key_col: str = "doc_id",
                      stratum_col: str = "lang"):
    """Keep each row iff ``hash(key) < rate[stratum] * 2^32``; strata absent
    from ``rates`` are dropped.  Pure ``map_batches`` filter — no shuffle,
    no driver state; scales by construction."""
    thresholds = {s: int(r * MOD) for s, r in rates.items()}

    def keep(batch: pa.Table) -> pa.Table:
        h = _bucket(batch.column(key_col).to_numpy(zero_copy_only=False))
        strata = batch.column(stratum_col).to_pylist()
        lim = np.fromiter(
            (thresholds.get(s, 0) for s in strata), dtype=np.uint64, count=len(strata)
        )
        return batch.filter(pa.array(h < lim))

    return ds.map_batches(keep, batch_format="pyarrow")
