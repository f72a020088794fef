"""Liveness supervisor for long training runs (SURVEY.md §5: the TPU plan
extends the reference's crash-save-only failure handling with restart).

The reference never needed this: single local GPU, a crash raises and
``BaseAgent.run`` crash-saves (``agents/base.py:148-154``).  On a
network-attached accelerator a dropped transport instead hangs the process
silently — no exception, no crash-save, no progress.  The supervisor closes
that gap:

    python -m imagecompressionlearnedliftingandlearnedtreebasedmodels_tpu.train.supervisor \
        --timeout 600 -- python scripts/rd_sweep.py --preset flagship ... --resume

It runs the command as a child process group with ``LIFTING_TPU_HEARTBEAT``
pointing at a liveness file (see ``utils/heartbeat.py``), and

- restarts the child when the heartbeat goes stale for ``--timeout``
  seconds (the child is killed with SIGKILL — it is wedged in an
  uninterruptible RPC, SIGTERM would never be delivered);
- restarts the child when it exits nonzero (the agent crash-saved first);
- stops on exit code 0, or after ``--max-restarts`` consecutive
  non-productive attempts (an attempt that beat the heartbeat resets the
  counter, so week-long runs with occasional drops never exhaust it).

Restart safety is the checkpoint layer's job: the agent saves every
``save_every_epochs`` epochs and on crash, and restart commands must be
resumable (idempotent), e.g. ``rd_sweep.py --resume``.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import tempfile
import time
from typing import List, Optional

from ..utils import heartbeat as hb


def _kill_group(proc: subprocess.Popen) -> None:
    """SIGKILL the child's process group (started with its own session, so
    this can never touch the supervisor or unrelated processes)."""
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass
    try:
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        pass


def supervise(cmd: List[str], timeout: float = 600.0,
              grace: Optional[float] = None, max_restarts: int = 10,
              poll: float = 5.0, hb_path: Optional[str] = None,
              log=print) -> int:
    """Run ``cmd`` until it exits 0; kill+restart on stall or crash.

    ``timeout``: seconds without a heartbeat before the child is declared
    wedged. ``grace``: stall timeout while no beat has EVER been observed
    for the current attempt (covers imports + first XLA compile, which can
    legitimately exceed ``timeout``); defaults to ``max(timeout, 1800)``.
    Returns the final exit code (0 on success, nonzero when restarts are
    exhausted).
    """
    if grace is None:
        grace = max(timeout, 1800.0)
    if hb_path is None:
        fd, hb_path = tempfile.mkstemp(prefix="train_hb_")
        os.close(fd)
        os.unlink(hb_path)  # child (re)creates it on first beat

    env = dict(os.environ)
    env[hb.ENV_VAR] = hb_path

    restarts_left = max_restarts
    attempt = 0
    # Forward termination to the child group: without this, killing the
    # supervisor would orphan the training process, which keeps holding
    # the accelerator (the exact failure mode the supervisor exists to
    # prevent).  Installed only in the supervising (main) thread.
    current: dict = {"proc": None}

    def _terminate(signum, frame):
        proc = current["proc"]
        if proc is not None:
            _kill_group(proc)
        raise SystemExit(128 + signum)

    try:
        signal.signal(signal.SIGTERM, _terminate)
        signal.signal(signal.SIGINT, _terminate)
    except ValueError:
        pass  # not in the main thread (tests drive supervise() directly)
    while True:
        attempt += 1
        try:
            os.unlink(hb_path)
        except OSError:
            pass
        start = time.time()
        beat_seen = False
        log(f"[supervisor] attempt {attempt}: {' '.join(cmd)}")
        proc = subprocess.Popen(cmd, env=env, start_new_session=True)
        current["proc"] = proc
        stalled = False
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            age = hb.age_seconds(hb_path)
            if age is not None:
                beat_seen = True
            limit = timeout if beat_seen else grace
            waited = age if age is not None else time.time() - start
            if waited > limit:
                log(f"[supervisor] heartbeat stale ({waited:.0f}s > "
                    f"{limit:.0f}s) — killing wedged child pid {proc.pid}")
                _kill_group(proc)
                stalled = True
                rc = None
                break
            time.sleep(poll)
        if not stalled and rc == 0:
            log(f"[supervisor] child finished cleanly "
                f"(attempt {attempt})")
            return 0
        if beat_seen:
            restarts_left = max_restarts  # productive attempt: reset budget
        else:
            restarts_left -= 1
        why = "stalled" if stalled else f"exited rc={rc}"
        if restarts_left <= 0:
            log(f"[supervisor] child {why} and restart budget exhausted")
            return rc if (rc is not None and rc != 0) else 1
        log(f"[supervisor] child {why} — restarting "
            f"({restarts_left} non-productive restarts left)")
        time.sleep(min(poll, 5.0))


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        description="Restart-on-stall supervisor for training commands. "
                    "Usage: supervisor [opts] -- cmd arg...")
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="seconds without heartbeat => child is wedged")
    ap.add_argument("--grace", type=float, default=None,
                    help="stall timeout before the first beat "
                         "(default max(timeout, 1800))")
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--poll", type=float, default=5.0)
    ap.add_argument("--pidfile", type=str, default=None,
                    help="write the supervisor's pid here (convention: "
                         "/tmp/rd_sweep*.pid — bench.py stops such runs "
                         "before measuring, verifying /proc cmdline first)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- command to supervise")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: supervisor [opts] -- cmd ...)")
    if args.pidfile:
        with open(args.pidfile, "w") as fh:
            fh.write(str(os.getpid()))
    try:
        return supervise(cmd, timeout=args.timeout, grace=args.grace,
                         max_restarts=args.max_restarts, poll=args.poll)
    finally:
        if args.pidfile:
            try:
                os.remove(args.pidfile)
            except OSError:
                pass


if __name__ == "__main__":
    sys.exit(main())
