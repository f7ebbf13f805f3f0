"""Gradient reversal.

Parity: reference ``simseg/models/components/grad_rev.py:4-31`` (RevGrad —
identity forward, negated/scaled gradient backward; unused by the registered
pipelines but part of the component surface).
"""

from __future__ import annotations

import jax


@jax.custom_vjp
def grad_reverse(x, alpha: float = 1.0):
    return x


def _fwd(x, alpha):
    return x, alpha


def _bwd(alpha, g):
    return (-alpha * g, None)


grad_reverse.defvjp(_fwd, _bwd)
