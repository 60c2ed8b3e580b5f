"""Scheduled re-crawls — the reference's cron feature re-expressed for a
batch corpus engine.

Reference semantics (the WHAT): ``Website::with_cron(cron_str, CronType)``
+ ``run_cron()`` re-run ``crawl()`` / ``scrape()`` on an ``async_job``
schedule (6-field cron with seconds), with website state persisting across
firings (``website.rs:1131-1140`` CronType, ``:13316-13319`` with_cron,
``:14689-14719`` Job impl).

Ray-native re-expression: a thin driver loop around the incremental
re-crawl primitive — each firing runs a fresh crawl, classifies every page
against the PREVIOUS cycle's signature checkpoint
(:func:`..pipelines.recrawl.recrawl_diff`: changed/unchanged/new/gone) and
atomically re-stamps the checkpoint, so every cycle is resumable and the
diff stream is the subscription-channel analogue.  The clock and sleeper
are injectable (tests drive two cycles with a fake clock and a corpus that
changes between firings); the cron parser is a deterministic 6-field
matcher (sec min hour dom mon dow — the async_job format, e.g.
``"1/5 * * * * *"``).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

_FIELD_RANGES = ((0, 59), (0, 59), (0, 23), (1, 31), (1, 12), (0, 6))


def _parse_field(spec: str, lo: int, hi: int) -> frozenset[int]:
    """One cron field → the set of matching values.  Supports ``*``,
    ``a``, ``a-b``, ``a/s`` (start/step), ``*/s`` and comma lists."""
    out: set[int] = set()
    for part in spec.split(","):
        step = 1
        rng = part
        has_step = "/" in part
        if has_step:
            rng, step_s = part.split("/", 1)
            step = int(step_s)
            if step <= 0:
                raise ValueError(f"cron step must be positive: {spec!r}")
        if rng in ("*", ""):
            start, end = lo, hi
        elif "-" in rng:
            a, b = rng.split("-", 1)
            start, end = int(a), int(b)
        else:
            start = int(rng)
            end = hi if has_step else start  # "a/s" = start a, step s, to max
        if not (lo <= start <= hi and lo <= end <= hi):
            raise ValueError(f"cron field out of range: {spec!r}")
        out.update(range(start, end + 1, step))
    return frozenset(out)


@dataclass(frozen=True)
class CronSchedule:
    """Parsed 6-field cron expression (seconds resolution)."""

    fields: tuple[frozenset[int], ...]
    expr: str

    @classmethod
    def parse(cls, expr: str) -> "CronSchedule":
        parts = expr.split()
        if len(parts) != 6:
            raise ValueError(
                f"cron expression needs 6 fields (sec min hour dom mon dow): {expr!r}"
            )
        return cls(
            tuple(
                _parse_field(p, lo, hi) for p, (lo, hi) in zip(parts, _FIELD_RANGES)
            ),
            expr,
        )

    def matches(self, t: time.struct_time) -> bool:
        sec, minute, hour, dom, mon, dow = self.fields
        return (
            t.tm_sec in sec
            and t.tm_min in minute
            and t.tm_hour in hour
            and t.tm_mday in dom
            and t.tm_mon in mon
            and (t.tm_wday + 1) % 7 in dow  # cron dow: 0=Sunday
        )

    def next_fire(self, after_epoch: float, max_scan_s: int = 366 * 86400) -> int:
        """First whole second strictly after ``after_epoch`` matching the
        schedule (UTC).  Linear scan at 1-second resolution, bounded at one
        year — a batch driver fires at most every few seconds, so the scan
        is microseconds for realistic expressions."""
        t = int(after_epoch) + 1
        for _ in range(max_scan_s):
            if self.matches(time.gmtime(t)):
                return t
            t += 1
        raise ValueError(f"no firing within a year for {self.expr!r}")


@dataclass
class CronCycle:
    cycle: int
    fired_at: int
    visited: int
    changed: int
    unchanged: int
    new: int
    gone: int
    diff: pa.Table = field(repr=False)


class CronRecrawler:
    """Run ``crawl`` (CronType::Crawl analogue; ``scrape`` = keep_pages with
    page rows, same loop) on a cron schedule, diffing each cycle against the
    previous cycle's signature checkpoint.

    ``state_dir`` holds ``signatures.parquet`` (url, signature of the last
    completed cycle, written atomically) and ``cron_state.json`` (cycle
    counter + last fire time), so a killed runner resumes its lineage.
    ``clock``/``sleeper`` are injectable for deterministic tests;
    ``corpus_provider(cycle) -> corpus_dir`` lets the corpus change between
    firings (the re-crawl scenario)."""

    def __init__(
        self,
        job,
        corpus_dir: str,
        cron_str: str,
        state_dir: str,
        clock=time.time,
        sleeper=time.sleep,
        corpus_provider=None,
        crawler_kwargs: dict | None = None,
    ):
        if not job.config.normalize:
            raise ValueError("cron re-crawl requires normalize=True (signatures)")
        self.job = job
        self.corpus_dir = corpus_dir
        self.schedule = CronSchedule.parse(cron_str)
        self.state_dir = state_dir
        self.clock = clock
        self.sleeper = sleeper
        self.corpus_provider = corpus_provider
        self.crawler_kwargs = crawler_kwargs or {}
        os.makedirs(state_dir, exist_ok=True)

    @property
    def _sig_path(self) -> str:
        return os.path.join(self.state_dir, "signatures.parquet")

    @property
    def _state_path(self) -> str:
        return os.path.join(self.state_dir, "cron_state.json")

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"cycle": 0, "last_fire": None}

    def _save_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    def _prior_signatures(self) -> pa.Table | None:
        if os.path.exists(self._sig_path):
            return pq.read_table(self._sig_path)
        return None

    def run_cycle(self, cycle: int, fired_at: int) -> CronCycle:
        import ray.data

        from .crawl import RayCrawler
        from .recrawl import recrawl_diff

        corpus = (
            self.corpus_provider(cycle) if self.corpus_provider else self.corpus_dir
        )
        res = RayCrawler(self.job, corpus, **self.crawler_kwargs).run()
        tbl = res.pages_table()
        # the checkpoint holds CONTENT pages only: a URL that turned 404
        # since the last cycle drops out of the fresh side and classifies
        # as "gone" (the reference's removed-page case), not "changed"
        tbl = tbl.filter(pa.compute.equal(tbl.column("status_code"), 200))
        fresh = pa.table(
            {
                "url": tbl.column("url"),
                "signature": tbl.column("signature").fill_null(0),
            }
        )
        prior = self._prior_signatures()
        counts = {"changed": 0, "unchanged": 0, "new": 0, "gone": 0}
        if prior is None:
            # first firing: everything is new
            diff = pa.table(
                {
                    "url": fresh.column("url"),
                    "change": pa.array(["new"] * fresh.num_rows, pa.string()),
                }
            )
            counts["new"] = fresh.num_rows
        else:
            diff_ds, gone = recrawl_diff(prior, ray.data.from_arrow(fresh))
            parts = [
                b for b in diff_ds.iter_batches(batch_format="pyarrow") if b.num_rows
            ]
            parts.append(
                pa.table(
                    {
                        "url": pa.array(gone, pa.string()),
                        "change": pa.array(["gone"] * len(gone), pa.string()),
                    }
                )
            )
            diff = pa.concat_tables(parts)
            for c in diff.column("change").to_pylist():
                counts[c] += 1
        # atomic checkpoint re-stamp: the NEXT cycle diffs against this one
        tmp = self._sig_path + ".tmp"
        pq.write_table(fresh, tmp)
        os.replace(tmp, self._sig_path)
        self._save_state({"cycle": cycle, "last_fire": fired_at})
        return CronCycle(
            cycle=cycle,
            fired_at=fired_at,
            visited=len(res.visited),
            diff=diff,
            **counts,
        )

    def run(self, max_cycles: int) -> list[CronCycle]:
        """Fire ``max_cycles`` times on the schedule (blocking between
        firings via the injected sleeper), resuming the cycle counter from
        ``state_dir``."""
        state = self._load_state()
        cycles: list[CronCycle] = []
        for _ in range(max_cycles):
            now = self.clock()
            fire_at = self.schedule.next_fire(now)
            if fire_at > now:
                self.sleeper(fire_at - now)
            state["cycle"] += 1
            cycles.append(self.run_cycle(state["cycle"], fire_at))
            state["last_fire"] = fire_at
        return cycles
