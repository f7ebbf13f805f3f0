"""dryrun_multichip dispatch: the re-exec decision must never initialize
a non-CPU backend (a stalled TPU tunnel would hang the CPU-only
validation), and a CPU-pinned process with enough devices must run the
legs in-process."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_child_on_non_cpu_platform_fails_fast_without_backend_init():
    # A (mis-provisioned) child on a non-CPU platform must raise the
    # refusing-to-re-fork error immediately — NOT call jax.devices(),
    # which would block in tunneled-TPU backend init. Regression test for
    # the observed 15-minute zero-CPU hang. PYTHONPATH is overwritten to
    # REPO, which drops /root/.axon_site and thereby unregisters the axon
    # PJRT plugin — so a regressed jax.devices() call fails fast with
    # "Backend 'axon' is not in the list of known backends" instead of
    # hanging on the tunnel. (Appending per CLAUDE.md's TPU-run rule would
    # keep the plugin registered and make a regression genuinely attempt
    # tunnel contact.)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env["_GRAFT_DRYRUN_CHILD"] = "1"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=90,
    )
    assert proc.returncode != 0
    assert "refusing to re-fork" in proc.stderr


def test_cpu_pinned_process_runs_in_process(monkeypatch):
    # conftest pins an 8-device CPU mesh: dryrun_multichip must take the
    # in-process fast path (no subprocess). n_devices=2 keeps it to the
    # single dp leg.
    import __graft_entry__ as g

    def _no_spawn(*a, **k):
        raise AssertionError("dryrun re-exec'd despite a wide CPU backend")

    monkeypatch.setattr(subprocess, "run", _no_spawn)
    g.dryrun_multichip(2)


def test_parent_reexec_forces_virtual_cpu_mesh(monkeypatch):
    # A parent that is not CPU-pinned must re-exec with JAX_PLATFORMS=cpu
    # and the forced host-device count, regardless of XLA_FLAGS noise.
    import types

    import __graft_entry__ as g

    captured = {}

    class _Ok:
        returncode = 0

    def _capture(cmd, env=None, cwd=None, **k):
        captured["cmd"] = cmd
        captured["env"] = env
        return _Ok()

    monkeypatch.setattr(subprocess, "run", _capture)
    monkeypatch.delenv("_GRAFT_DRYRUN_CHILD", raising=False)
    monkeypatch.setenv("XLA_FLAGS",
                       "--xla_foo --xla_force_host_platform_device_count=1")
    # simulate a non-CPU pin (the real jax.config is pinned to cpu by the
    # test conftest and refuses setattr): the decision path only reads
    # jax.config.jax_platforms, so stub the module's jax reference
    monkeypatch.setattr(g, "jax", types.SimpleNamespace(
        config=types.SimpleNamespace(jax_platforms="axon")))
    g.dryrun_multichip(8)
    env = captured["env"]
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["_GRAFT_DRYRUN_CHILD"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=1" not in env["XLA_FLAGS"]
    assert "--xla_foo" in env["XLA_FLAGS"]
