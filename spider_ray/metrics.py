"""Opt-in per-stage operator metrics — the observability surface a 100-TB
operator actually needs (VERDICT r3 #10; the catalog-op analogue of the
crawl's SURVEY §1.3 ``metrics`` schema).

Enable with ``SPIDER_RAY_METRICS=1``.  When enabled, instrumented batch
fns report one row per call — ``(op, stage, pid, rows_in, rows_out,
wall_us)`` — to a named collector actor (fire-and-forget ``.remote``, so
the hot path never blocks on the sink); the driver folds them with
:func:`collect`.  When disabled (the default), :func:`wrap` returns the
fn UNWRAPPED — zero overhead, no actor, no timers.

The collector is a single lightweight actor holding slim tuples: at any
corpus size the row count is O(batches), the same order as Ray's own
per-task bookkeeping.  For multi-day jobs, drain it periodically with
``collect(clear=True)`` and append to a Parquet sink.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa

_ACTOR_NAME = "spider_ray_metrics_sink"

# per-process cached handle: a named non-detached actor dies when every
# handle drops, so each process (driver AND reused workers) pins one for
# its lifetime; wrap() creates it from the DRIVER at pipeline-build time
# so short-lived worker tasks can never be the sole owner
_CACHED = None


def enabled() -> bool:
    return os.environ.get("SPIDER_RAY_METRICS") == "1"


def _sink():
    global _CACHED
    if _CACHED is not None:
        return _CACHED
    import ray

    @ray.remote(num_cpus=0)
    class MetricsSink:
        def __init__(self):
            self.rows: list[tuple] = []

        def add(self, rows):
            self.rows.extend(rows)

        def count(self) -> int:
            return len(self.rows)

        def drain(self, clear: bool):
            out = list(self.rows)
            if clear:
                self.rows = []
            return out

    _CACHED = MetricsSink.options(name=_ACTOR_NAME, get_if_exists=True).remote()
    return _CACHED


class _Instrumented:
    """Wraps a batch fn (or a callable-class INSTANCE) with per-call
    metric reporting.  Picklable: the sink handle is re-resolved lazily in
    the worker process."""

    def __init__(self, fn, op: str, stage: str):
        self.fn = fn
        self.op = op
        self.stage = stage
        self._handle = None
        # Ray Data reads fn.__name__ for display / wrapper naming
        self.__name__ = getattr(fn, "__name__", f"{op}:{stage}")

    def __call__(self, batch):
        t0 = time.perf_counter()
        out = self.fn(batch)
        wall_us = int((time.perf_counter() - t0) * 1e6)
        if self._handle is None:
            self._handle = _sink()
        self._handle.add.remote(
            [(self.op, self.stage, os.getpid(), getattr(batch, "num_rows", len(batch)),
              getattr(out, "num_rows", len(out)), wall_us)]
        )
        return out


def wrap(fn, op: str, stage: str):
    """Instrument ``fn`` when metrics are enabled; return it untouched
    otherwise (the disabled path adds nothing to the pipeline)."""
    if not enabled():
        return fn
    _sink()  # driver-side: pin the collector before any worker reports
    return _Instrumented(fn, op, stage)


def collect(clear: bool = False, settle_s: float = 2.0) -> pa.Table:
    """Driver-side fold of every reported row so far.

    Reporting is fire-and-forget, so rows from just-finished tasks may
    still be in flight when the pipeline returns; ``collect`` polls the
    scalar ``count()`` until it stops growing for one interval (bounded
    by ``settle_s``), then drains ONCE — the r4 version transferred the
    whole accumulated row list on every poll (O(rows × polls)
    serialization for what is a scalar check)."""
    import ray

    sink = _sink()
    prev = -1
    waited = 0.0
    while waited < settle_s:
        cur = ray.get(sink.count.remote())
        if cur == prev:
            break
        prev = cur
        time.sleep(0.2)
        waited += 0.2
    rows = ray.get(sink.drain.remote(clear))
    cols = list(zip(*rows)) if rows else [[], [], [], [], [], []]
    return pa.table(
        {
            "op": pa.array(cols[0], pa.string()),
            "stage": pa.array(cols[1], pa.string()),
            "pid": pa.array(cols[2], pa.int64()),
            "rows_in": pa.array(cols[3], pa.int64()),
            "rows_out": pa.array(cols[4], pa.int64()),
            "wall_us": pa.array(cols[5], pa.int64()),
        }
    )
