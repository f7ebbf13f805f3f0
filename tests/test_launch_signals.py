"""Launcher process semantics (launch.py): exit-code propagation and
signal handling, without running a full training job.

Complements tests/test_preemption.py (which drives the SIGTERM ->
PreemptionHook -> checkpoint -> exit-0 lifecycle); here the child is
killed/fails early so the tests stay in the fast lane.
"""

import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO)
    return env


def _launch(tmp_path, cfg_path):
    return subprocess.Popen(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--task", "clip", "--cfg", str(cfg_path)],
        cwd=str(tmp_path), env=_env(),
        stdout=subprocess.DEVNULL, stderr=subprocess.STDOUT,
    )


def _child_pids(pid):
    try:
        with open(f"/proc/{pid}/task/{pid}/children") as f:
            return [int(p) for p in f.read().split()]
    except OSError:
        return []


def _wait_for_child(proc, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        kids = _child_pids(proc.pid)
        if kids:
            return kids[0]
        if proc.poll() is not None:
            raise AssertionError(
                f"launcher exited rc={proc.returncode} before spawning a child")
        time.sleep(0.05)
    raise AssertionError("launcher never spawned the trainer child")


def test_failing_child_exit_code_propagates(tmp_path):
    # nonexistent cfg -> the trainer raises during config load and exits 1;
    # the launcher must report the same code (not mask it as success)
    proc = _launch(tmp_path, tmp_path / "missing.yaml")
    rc = proc.wait(timeout=120)
    assert rc == 1


def test_signal_killed_child_reports_128_plus_sig(tmp_path):
    # SIGKILL the trainer (unhandled, like an OOM kill): Popen sees rc=-9;
    # the launcher must exit 137, not a truncated/negative byte
    proc = _launch(tmp_path, tmp_path / "missing.yaml")
    child = _wait_for_child(proc)
    os.kill(child, signal.SIGKILL)
    rc = proc.wait(timeout=60)
    assert rc == 128 + signal.SIGKILL


def test_launcher_ignores_sigint(tmp_path):
    # Ctrl+C delivery is the foreground group's job; a SIGINT aimed at the
    # launcher alone must not kill it (it keeps teeing until the child ends)
    proc = _launch(tmp_path, tmp_path / "missing.yaml")
    child = _wait_for_child(proc)
    time.sleep(0.3)  # let the launcher finish installing its handlers
    os.kill(proc.pid, signal.SIGINT)
    time.sleep(1.0)
    assert proc.poll() is None, "launcher died on SIGINT"
    os.kill(child, signal.SIGKILL)
    rc = proc.wait(timeout=60)
    assert rc == 128 + signal.SIGKILL
