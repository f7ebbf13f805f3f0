"""The measured reference-decode baseline must be correctness-validated:
the native C++ CRF stand-in (tools/native/ref_decode.cc) and the numpy
derivation must both reproduce the exact O(N^2) mean-field argmax."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from measure_baseline import (  # noqa: E402
    build_native,
    crosscheck,
    dense_crf_fast,
)


def test_numpy_standin_matches_exact_meanfield():
    assert crosscheck(crf=dense_crf_fast) == 1.0


def test_native_standin_matches_exact_and_numpy():
    crf = build_native()
    if crf is None:
        pytest.skip("no C++ toolchain")
    assert crosscheck(crf=crf) == 1.0
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
    p = np.clip(rng.random((48, 48)), 0.01, 0.99).astype(np.float64)
    np.testing.assert_array_equal(crf(img, p), dense_crf_fast(img, p))
