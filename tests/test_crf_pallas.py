"""Streaming Pallas bilateral kernel vs the explicit kernel matrix."""

import jax.numpy as jnp
import numpy as np

from simseg_tpu.ops.crf import _bilateral_kernel_matrix
from simseg_tpu.ops.crf_pallas import bilateral_features, bilateral_matvec


def test_bilateral_matvec_matches_kernel_matrix():
    rng = np.random.default_rng(0)
    h, w = 12, 9  # n = 108, exercises padding (not a tile multiple)
    rgb = rng.integers(0, 255, (h, w, 3)).astype(np.float32)
    q = rng.normal(size=(h * w, 3)).astype(np.float32)

    feat = bilateral_features(jnp.asarray(rgb), sxy=40.0, srgb=13.0, stride=4)
    got = np.asarray(bilateral_matvec(feat, jnp.asarray(q), interpret=True))

    kmat = np.asarray(
        _bilateral_kernel_matrix(jnp.asarray(rgb), 40.0, 13.0, 4)
    )
    want = kmat @ q
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_bilateral_matvec_degree_column():
    """Appending a ones column yields the kernel degree (K @ 1) exactly."""
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (8, 8, 3)).astype(np.float32)
    feat = bilateral_features(jnp.asarray(rgb), 40.0, 13.0, 4)
    n = 64
    q = np.concatenate(
        [rng.normal(size=(n, 2)).astype(np.float32), np.ones((n, 1), np.float32)],
        axis=1,
    )
    out = np.asarray(bilateral_matvec(feat, jnp.asarray(q), interpret=True))
    kmat = np.asarray(_bilateral_kernel_matrix(jnp.asarray(rgb), 40.0, 13.0, 4))
    np.testing.assert_allclose(out[:, 2], kmat.sum(1), rtol=1e-4)
