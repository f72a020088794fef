"""Training-liveness heartbeat (SURVEY.md §5 failure-detection TPU plan).

The reference's failure story is crash-save-on-exception
(``agents/base.py:148-154``); our agent preserves that
(``train/loop.py::run``).  But on this framework's target deployment the
accelerator is reached over a network transport, and a dropped transport
does NOT raise — it leaves the process blocked forever inside a device
readback, so crash-save never fires.  The liveness protocol:

- the agent touches a heartbeat file at init, every train/eval/test step,
  and at every checkpoint save (``Heartbeat.beat`` — throttled, so the
  cost is one ``os.replace`` every ``min_interval`` seconds at most);
- ``train/supervisor.py`` watches the file's mtime and kills + restarts
  the training process when it goes stale, resuming from the last
  checkpoint.

The heartbeat file path comes from the ``LIFTING_TPU_HEARTBEAT`` env var
(set by the supervisor); without it every call is a no-op, so
non-supervised runs pay nothing.
"""

from __future__ import annotations

import os
import time
from typing import Optional

ENV_VAR = "LIFTING_TPU_HEARTBEAT"


def heartbeat_path() -> Optional[str]:
    return os.environ.get(ENV_VAR) or None


class Heartbeat:
    """Throttled liveness file writer; no-op when no path is configured."""

    def __init__(self, path: Optional[str] = None,
                 min_interval: float = 2.0):
        self.path = path if path is not None else heartbeat_path()
        self.min_interval = float(min_interval)
        self._last = 0.0
        if self.path:
            d = os.path.dirname(self.path)
            if d:
                os.makedirs(d, exist_ok=True)
        # Deliberately NO beat here: the first beat must mark the first
        # completed step. An eager init beat would flip the supervisor
        # from its ``grace`` window (sized for imports + first XLA
        # compile, minutes on a tunneled accelerator) to the strict
        # steady-state ``timeout`` while the slowest legitimate quiet
        # phase — model init + first compile — is still ahead.

    def beat(self, force: bool = False) -> None:
        if not self.path:
            return
        now = time.time()
        if not force and (now - self._last) < self.min_interval:
            return
        self._last = now
        tmp = f"{self.path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            f.write(f"{now:.3f}\n")
        os.replace(tmp, self.path)  # atomic: watcher never sees a torn file


class HeartbeatLease:
    """Bounded background beater for long NON-resumable phases.

    The per-step beat protocol assumes progress is checkpointed between
    beats; the real-bitstream test phase is not — one image's round trip
    can legitimately exceed the supervisor timeout when it pays fresh
    coding-graph compiles on a contended 1-core host (observed round 5:
    the lam=2000 test was killed at 902 s and would have been re-killed on
    every restart). The lease beats every ``interval`` from a daemon
    thread while the phase runs, but stops itself after ``max_s`` — so a
    genuinely wedged phase (dropped tunnel inside a readback) still goes
    stale and gets restarted, just on a coarser clock.
    """

    def __init__(self, hb: "Heartbeat", interval: float = 60.0,
                 max_s: float = 2400.0):
        self._hb = hb
        self._interval = interval
        self._max_s = max_s
        self._stop = None

    def __enter__(self):
        import threading

        self._stop = threading.Event()
        stop = self._stop

        def _run():
            t0 = time.time()
            while not stop.is_set() and (time.time() - t0) < self._max_s:
                self._hb.beat(force=True)
                stop.wait(self._interval)

        if self._hb.path:
            threading.Thread(target=_run, daemon=True).start()
        return self

    def __exit__(self, *exc):
        if self._stop is not None:
            self._stop.set()
        return False


def age_seconds(path: str) -> Optional[float]:
    """Seconds since the last beat, or None if the file does not exist."""
    try:
        return max(0.0, time.time() - os.stat(path).st_mtime)
    except OSError:
        return None
