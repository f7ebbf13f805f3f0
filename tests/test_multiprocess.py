"""Real multi-process smoke tests (2 CPU processes via jax.distributed):
the pod-eval gather path (RetrievalEvalHook -> process_allgather) and the
fail-loud init_distributed contract (round-1 VERDICT Weak #5 / Next #8)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO"])

from simseg_tpu.parallel.mesh import init_distributed
init_distributed()
assert jax.process_count() == 2, jax.process_count()
pid = jax.process_index()

import numpy as np
from types import SimpleNamespace
from simseg_tpu.core.train_hooks import RetrievalEvalHook
from simseg_tpu.utils.collections import AttrDict

# deterministic full dataset, split across the two processes like the pod
# data sharding does
rng = np.random.default_rng(0)
n, d = 8, 6
img = rng.normal(size=(n, d)).astype(np.float32)
txt = img + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
img /= np.linalg.norm(img, axis=1, keepdims=True)
txt /= np.linalg.norm(txt, axis=1, keepdims=True)
iid = np.arange(n)
cid = np.arange(n)
lo, hi = (0, n // 2) if pid == 0 else (n // 2, n)

cfg = AttrDict()
cfg.data = AttrDict()
cfg.data.single_eval = False   # pod eval: gather across processes

runner = SimpleNamespace(cfg=cfg, outputs={}, state=AttrDict())
hook = RetrievalEvalHook()
hook.before_val_epoch(runner)
runner.outputs = {
    "image_emb": img[lo:hi],
    "text_emb": txt[lo:hi],
    "image_id": iid[lo:hi],
    "caption_id": cid[lo:hi],
}
hook.after_val_step(runner)
hook.after_val_epoch(runner)

out = {k: float(v) for k, v in runner.state.retrieval_summary.items()}
print("SUMMARY:" + json.dumps({"pid": pid, "summary": out}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_retrieval_gather():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            REPO=REPO,
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rc={p.returncode}\n{out}\n{err}"

    summaries = []
    for out, _ in outs:
        line = [l for l in out.splitlines() if l.startswith("SUMMARY:")][0]
        summaries.append(json.loads(line[len("SUMMARY:"):]))
    # both processes computed the summary over the GATHERED (full) set
    assert summaries[0]["summary"] == summaries[1]["summary"]

    # matches the single-process computation over the full data
    from simseg_tpu.utils.retrieval import retrieval_summary

    rng = np.random.default_rng(0)
    n, d = 8, 6
    img = rng.normal(size=(n, d)).astype(np.float32)
    txt = img + 0.01 * rng.normal(size=(n, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    want = {k: float(v)
            for k, v in retrieval_summary(img, txt, np.arange(n),
                                          np.arange(n)).items()}
    assert summaries[0]["summary"] == want
    # near-identity embeddings: recall should be perfect
    assert want["rsum"] == 600.0


def test_init_distributed_fails_loudly_on_half_config():
    """COORDINATOR_ADDRESS with inconsistent NUM_PROCESSES/PROCESS_ID must
    raise, not silently fall back to single-process."""
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        COORDINATOR_ADDRESS="localhost:1",
        NUM_PROCESSES="2",
        REPO=REPO,
    )
    env.pop("PROCESS_ID", None)
    code = (
        "import os, sys, jax;"
        "jax.config.update('jax_platforms', 'cpu');"
        "sys.path.insert(0, os.environ['REPO']);"
        "from simseg_tpu.parallel.mesh import init_distributed;"
        "init_distributed()"
    )
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    assert "NUM_PROCESSES and PROCESS_ID" in r.stderr
    assert "Multi-host init requested" in r.stderr
