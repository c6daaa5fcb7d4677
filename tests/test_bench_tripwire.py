"""bench.py _ensure_idle_chip: the pre-measurement landing tripwire.

The driver runs bench.py at round end on the real chip; if the guarded
retrain is still live, the headline measures contention (the BENCH_r04
failure mode, docs/PERF.md). The tripwire must stop the relaunch loop by
explicit PID file, SIGTERM the trainer (whose handler checkpoints), and
no-op on stale/foreign PID files. Driven here with REAL processes and
signals — no mocks."""

import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _ensure_idle_chip


def _spawn(tag, trap_term=True, ready_file=None):
    """A real process whose cmdline contains `tag`. If `ready_file` is
    given, the child touches it once its signal disposition is installed
    (avoids racing the tripwire's SIGTERM against interpreter startup)."""
    if trap_term:
        handler = "signal.signal(signal.SIGTERM, lambda *a: sys.exit(0))"
    else:
        handler = "signal.signal(signal.SIGTERM, signal.SIG_IGN)"
    ready = (f"open({str(ready_file)!r}, 'w').close()" if ready_file
             else "pass")
    code = (f"import signal, sys, time\n{handler}\n{ready}\n"
            "time.sleep(120)\n")
    proc = subprocess.Popen([sys.executable, "-c", code, tag])
    if ready_file:
        # interpreter startup can take >10 s when the host is contended
        # (e.g. a live training run) — wait generously for the handler
        for _ in range(1200):
            if os.path.exists(ready_file):
                break
            time.sleep(0.1)
        else:
            raise RuntimeError("helper process never became ready")
    return proc


def test_lands_guard_and_trainer(tmp_path):
    guard = _spawn("train_guard_fake")
    child = _spawn("main.py", ready_file=str(tmp_path / "ready"))
    gf = tmp_path / "guard.pid"
    cf = tmp_path / "child.pid"
    gf.write_text(str(guard.pid))
    cf.write_text(str(child.pid))

    landed = _ensure_idle_chip(
        guard_files=((str(gf), "train_guard_fake"),),
        child_file=(str(cf), "main.py"),
        poll_s=0.2, max_polls=50, settle_s=0.1,
    )
    assert landed
    # guard was SIGKILLed, child exited cleanly via its SIGTERM handler
    assert guard.wait(timeout=10) == -signal.SIGKILL
    assert child.wait(timeout=10) == 0


def test_noop_on_dead_pids(tmp_path):
    proc = _spawn("main.py")
    proc.kill()
    proc.wait()
    cf = tmp_path / "child.pid"
    cf.write_text(str(proc.pid))
    t0 = time.time()
    landed = _ensure_idle_chip(
        guard_files=((str(tmp_path / "missing.pid"), "train_guard"),),
        child_file=(str(cf), "main.py"),
        poll_s=0.2, max_polls=5, settle_s=0.1,
    )
    assert not landed
    assert time.time() - t0 < 5.0  # no waiting when nothing is live


def test_noop_on_recycled_pid(tmp_path):
    """A PID file pointing at a live process with the WRONG cmdline must
    not be signalled (PID-recycling guard)."""
    foreign = _spawn("unrelated_process")
    cf = tmp_path / "child.pid"
    cf.write_text(str(foreign.pid))
    try:
        landed = _ensure_idle_chip(
            guard_files=(),
            child_file=(str(cf), "main.py"),
            poll_s=0.2, max_polls=5, settle_s=0.1,
        )
        assert not landed
        assert foreign.poll() is None  # untouched
    finally:
        foreign.kill()
        foreign.wait()


def test_hard_kill_fallback(tmp_path):
    """A trainer that ignores SIGTERM is SIGKILLed after the poll budget."""
    child = _spawn("main.py", trap_term=False,
                   ready_file=str(tmp_path / "ready"))
    cf = tmp_path / "child.pid"
    cf.write_text(str(child.pid))
    landed = _ensure_idle_chip(
        guard_files=(),
        child_file=(str(cf), "main.py"),
        poll_s=0.1, max_polls=3, settle_s=0.05,
    )
    assert landed
    assert child.wait(timeout=10) == -signal.SIGKILL
