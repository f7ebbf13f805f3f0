"""Streaming bilateral message passing as a Pallas TPU kernel.

The XLA path in ``ops/crf.py`` materializes the (N, N) bilateral kernel
matrix in HBM once per image (107 MB at N = 72x72) and re-reads it every
mean-field iteration — the decode pipeline's dominant HBM traffic. This
kernel streams it flash-attention-style: for each row tile it recomputes the
kernel tile in VMEM from the 5-d (position, color) features via one MXU
matmul + VPU exp, immediately multiplies by the value tile, and accumulates.
HBM traffic for the kernel matrix drops to zero; the exp is recomputed per
iteration, which is far cheaper than the saved bandwidth.

Computes ``out = K @ q`` with K[i,j] = exp(-0.5 * ||f_i - f_j||^2). The
caller appends a ones column to q to get the degree vector K@1 in the same
pass (used for symmetric normalization).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row tile (grid dim) and column tile (inner loop) sizes
_TILE_I = 512
_TILE_J = 512
# padded feature width (5 features: 2 pos + 3 rgb)
_F_PAD = 8


def _kernel(feat_i_ref, feat_all_ref, q_ref, out_ref):
    fi = feat_i_ref[:]  # (TI, F)
    x2i = jnp.sum(fi * fi, axis=-1, keepdims=True)  # (TI, 1)
    n_pad = feat_all_ref.shape[0]
    nj = n_pad // _TILE_J
    c = q_ref.shape[1]

    def body(j, acc):
        fj = feat_all_ref[pl.ds(j * _TILE_J, _TILE_J), :]  # (TJ, F)
        qj = q_ref[pl.ds(j * _TILE_J, _TILE_J), :]         # (TJ, C)
        x2j = jnp.sum(fj * fj, axis=-1)[None, :]           # (1, TJ)
        d2 = x2i + x2j - 2.0 * jnp.dot(
            fi, fj.T, preferred_element_type=jnp.float32
        )
        k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
        return acc + jnp.dot(k, qj, preferred_element_type=jnp.float32)

    out_ref[:] = jax.lax.fori_loop(
        0, nj, body, jnp.zeros((_TILE_I, c), jnp.float32)
    )


@partial(jax.jit, static_argnames=("interpret",))
def bilateral_matvec(feat: jnp.ndarray, q: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    """out[i] = sum_j exp(-0.5 ||feat_i - feat_j||^2) q[j].

    feat: (N, 5) scaled features; q: (N, C). Returns (N, C) float32.
    Padding rows are pushed far away in feature space so their kernel
    weight underflows to exactly 0.
    """
    n, f = feat.shape
    c = q.shape[1]
    n_pad = int(np.ceil(n / max(_TILE_I, _TILE_J)) * max(_TILE_I, _TILE_J))

    feat_p = jnp.full((n_pad, _F_PAD), 0.0, jnp.float32)
    feat_p = feat_p.at[:n, :f].set(feat.astype(jnp.float32))
    # send padding rows ~1e4 away -> d2 ~1e8 -> exp underflows to 0
    feat_p = feat_p.at[n:, 0].set(1e4)
    q_p = jnp.zeros((n_pad, c), jnp.float32).at[:n].set(q.astype(jnp.float32))

    grid = (n_pad // _TILE_I,)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE_I, _F_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, _F_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_I, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_pad * (_F_PAD + c),
            bytes_accessed=n_pad * (_F_PAD + 2 * c) * 4,
            transcendentals=n_pad * n_pad,
        ),
        interpret=interpret,
    )(feat_p, feat_p, q_p)
    return out[:n]


def _kernel_batched(feat_i_ref, feat_all_ref, q_ref, out_ref):
    """Same as _kernel with an explicit batch grid dimension (refs carry a
    leading length-1 batch block)."""
    fi = feat_i_ref[0]  # (TI, F)
    x2i = jnp.sum(fi * fi, axis=-1, keepdims=True)
    n_pad = feat_all_ref.shape[1]
    nj = n_pad // _TILE_J
    c = q_ref.shape[2]

    def body(j, acc):
        fj = feat_all_ref[0, pl.ds(j * _TILE_J, _TILE_J), :]
        qj = q_ref[0, pl.ds(j * _TILE_J, _TILE_J), :]
        x2j = jnp.sum(fj * fj, axis=-1)[None, :]
        d2 = x2i + x2j - 2.0 * jnp.dot(
            fi, fj.T, preferred_element_type=jnp.float32
        )
        k = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))
        return acc + jnp.dot(k, qj, preferred_element_type=jnp.float32)

    out_ref[0] = jax.lax.fori_loop(
        0, nj, body, jnp.zeros((_TILE_I, c), jnp.float32)
    )


@partial(jax.jit, static_argnames=("interpret",))
def bilateral_matvec_batched(feat: jnp.ndarray, q: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Batched ``out[b] = K_b @ q[b]``: feat (B, N, F), q (B, N, C) ->
    (B, N, C). One grid cell per (batch, row-tile); avoids vmap-of-pallas."""
    b, n, f = feat.shape
    c = q.shape[2]
    n_pad = int(np.ceil(n / max(_TILE_I, _TILE_J)) * max(_TILE_I, _TILE_J))

    feat_p = jnp.full((b, n_pad, _F_PAD), 0.0, jnp.float32)
    feat_p = feat_p.at[:, :n, :f].set(feat.astype(jnp.float32))
    feat_p = feat_p.at[:, n:, 0].set(1e4)
    q_p = jnp.zeros((b, n_pad, c), jnp.float32).at[:, :n].set(
        q.astype(jnp.float32)
    )

    grid = (b, n_pad // _TILE_I)
    out = pl.pallas_call(
        _kernel_batched,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TILE_I, _F_PAD), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, _F_PAD), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_I, c), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * n_pad * (_F_PAD + c),
            bytes_accessed=b * n_pad * (_F_PAD + 2 * c) * 4,
            transcendentals=b * n_pad * n_pad,
        ),
        interpret=interpret,
    )(feat_p, feat_p, q_p)
    return out[:, :n]


def bilateral_features(rgb_small: jnp.ndarray, sxy: float, srgb: float,
                       stride: int) -> jnp.ndarray:
    """(h, w, 3) coarse image -> (h*w, 5) scaled kernel features (identical
    feature construction to crf.py::_bilateral_kernel_matrix)."""
    h, w, _ = rgb_small.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride - 0.5
    pos = jnp.stack(
        [jnp.tile(ys[:, None], (1, w)), jnp.tile(xs[None, :], (h, 1))], axis=-1
    ).reshape(-1, 2) / sxy
    col = rgb_small.reshape(-1, 3) / srgb
    return jnp.concatenate([pos, col], axis=-1)
