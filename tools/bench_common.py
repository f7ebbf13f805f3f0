"""Shared benchmarking helpers for the tools/ harnesses.

One audited implementation of the chained-scalar-accumulator timing loop
(the CLAUDE.md-mandated methodology: a scalar accumulator is threaded
through the iterations and fetched once per trial, so the numbers measure
completed device execution even on tunneled platforms where
``block_until_ready`` can return early) and of the analytic dense-matmul
flop model the MFU reports divide by.
"""

from __future__ import annotations

import time

import jax.numpy as jnp
import numpy as np


def timed_secs(fn, args, iters: int = 20, trials: int = 3) -> float:
    """Median seconds/iter; ``fn(*args, acc) -> new acc`` (f32 scalar)."""
    acc = jnp.zeros((), jnp.float32)
    float(fn(*args, acc))  # compile + warm
    secs = []
    for _ in range(trials):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = fn(*args, acc)
        float(acc)
        secs.append((time.perf_counter() - t0) / iters)
    return float(np.median(secs))


def timed_rate(fn, args, batch: int, iters: int = 20, trials: int = 3) -> float:
    """Median items/second for a per-call batch of ``batch``."""
    return batch / timed_secs(fn, args, iters=iters, trials=trials)


def tower_flops(t: int, d: int, depth: int, extra: float = 0.0) -> float:
    """Analytic transformer-tower forward flops: per block 4*T*D^2 MACs
    (qkv + proj) + 2*T^2*D (scores + context) + 8*T*D^2 (mlp); ``extra``
    adds patch-embed / projection MACs. Returns flops (2 per MAC)."""
    per_block = 12 * t * d * d + 2 * t * t * d
    return 2.0 * (depth * per_block + extra)
