"""Pause / resume / shutdown control for a running crawl.

The reference's ``control`` feature threads a per-crawl handle through the
dispatch loop (``handle_process``, checked before every dispatch —
``website.rs:7891``): *pause* suspends dispatching until resumed, *shutdown*
stops the crawl while keeping everything collected so far.  In the wave
engine the natural (and deterministic) control point is the WAVE BARRIER:
the crawler calls :meth:`CrawlControl.checkpoint` after a wave completes and
its checkpoint is written — pause blocks there, shutdown ends the crawl with
``CrawlResult.stopped = True``.  A shutdown crawl with a ``ckpt_dir`` is
resumable with ``run(resume=True)`` (same machinery as crash recovery), which
re-expresses the reference's persisted-visited restart
(``set_disk_persistance`` + ``persist_links``, ``website.rs:1595,2466-2469``).

The state lives in a small named-able Ray actor so any process in the
cluster (CLI signal handler, another driver, a dashboard task) can flip it.
"""

from __future__ import annotations

import time

import ray


@ray.remote
class _ControlActor:
    def __init__(self) -> None:
        self._state = "run"  # "run" | "pause" | "shutdown"
        self._shutdown_at_wave: int | None = None

    def set_state(self, state: str) -> None:
        assert state in ("run", "pause", "shutdown")
        self._state = state

    def get_state(self) -> str:
        return self._state

    def set_shutdown_at_wave(self, wave: int) -> None:
        self._shutdown_at_wave = wave

    def notify_wave(self, wave: int) -> str:
        """Wave-barrier hook: programmed shutdown triggers once the crawl
        completes wave ``shutdown_at_wave``."""
        if self._shutdown_at_wave is not None and wave >= self._shutdown_at_wave:
            self._state = "shutdown"
        return self._state


class CrawlControl:
    """User-facing handle; pass as ``RayCrawler(..., control=...)``."""

    def __init__(self) -> None:
        self.actor = _ControlActor.remote()

    # -- user API -------------------------------------------------------------

    def pause(self) -> None:
        ray.get(self.actor.set_state.remote("pause"))

    def resume(self) -> None:
        ray.get(self.actor.set_state.remote("run"))

    def shutdown(self) -> None:
        ray.get(self.actor.set_state.remote("shutdown"))

    def request_shutdown(self) -> None:
        """Non-blocking shutdown request — safe from a signal handler, where
        the main thread is usually already inside a ``ray.get`` and a nested
        blocking call could hang the process."""
        self.actor.set_state.remote("shutdown")

    def shutdown_at_wave(self, wave: int) -> None:
        """Deterministic programmed shutdown (tests / budget-by-wave): stop
        after the crawl has completed wave ``wave``."""
        ray.get(self.actor.set_shutdown_at_wave.remote(wave))

    def state(self) -> str:
        return ray.get(self.actor.get_state.remote())

    # -- crawler-side hook ----------------------------------------------------

    def checkpoint(self, wave: int, poll_s: float = 0.05) -> str:
        """Called by the crawler at a wave barrier.  Blocks while paused;
        returns the effective state ("run" or "shutdown")."""
        st = ray.get(self.actor.notify_wave.remote(wave))
        while st == "pause":
            time.sleep(poll_s)
            st = ray.get(self.actor.get_state.remote())
        return st
