"""Production-settings end-to-end seg parity (tools/seg_parity.py).

Converts "mIoU parity by construction" into "mIoU parity measured at
production settings": ViT-S/16 towers at 288 px, bf16 tower + CRF numerics,
stride-8 bilateral CRF, 7x7 morphology, nearest GT resize — against an
independent torch + numpy + cv2 re-derivation of the reference eval loop
(reference tools/seg_evaluation.py:78-181) with an EXACT mean-field dense
CRF (strictly stricter than the reference's own permutohedral-lattice
pydensecrf, whose spatial cells are ~5x coarser than our stride-8 grid).

Measured on 8 scenes (seed 0, 2026-08-17): 1.83% pixel disagreement, mIoU
delta 0.33 points, max per-class IoU delta 0.89 points, 1 marginal
candidate-set flip (bf16 global scores crossing the mean+std threshold).
Gates below hold comfortable margin over those numbers.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

from tools.seg_parity import (  # noqa: E402
    PARITY_CLASSES,
    build_fixture,
    candidate_decision,
    crf_image_state,
    exact_dense_crf_palette,
    render_scene,
    run_parity,
)


def test_exact_palette_crf_matches_brute_force():
    """The palette-FFT exact CRF is bit-identical to the O(N^2) brute-force
    mean-field (same math as pydensecrf's objective, no approximation)."""
    from tests.test_crf_morphology import np_dense_crf

    rng = np.random.default_rng(0)
    h = w = 20
    pal = np.array([[200, 60, 50], [182, 42, 32], [214, 74, 64],
                    [40, 60, 210], [22, 42, 192], [54, 74, 224]], np.float64)
    idx = (np.where(np.arange(w)[None, :] < w // 2, 0, 3)
           + rng.integers(0, 3, (h, w)))
    rgb = pal[idx]
    probs = np.clip(
        0.5 + 0.35 * np.where(np.arange(w) < w // 2, 1.0, -1.0)[None, :]
        + rng.normal(0, 0.15, (h, w)), 0.01, 0.99)

    want = np_dense_crf(probs, rgb)
    got = exact_dense_crf_palette(probs, rgb)
    np.testing.assert_array_equal(got, want)

    # shared per-image state path (what the harness uses across candidates)
    state = crf_image_state(rgb)
    got2 = exact_dense_crf_palette(probs, rgb, _shared=state)
    np.testing.assert_array_equal(got2, want)


def test_render_scene_palette_and_label_consistency():
    rng = np.random.default_rng(3)
    img, label = render_scene(rng, 96, (120, 140), n_classes=6)
    assert img.shape == (96, 96, 3) and label.shape == (120, 140)
    # palette-limited: few distinct colors (3 shades per drawn class)
    colors = np.unique(img.reshape(-1, 3), axis=0)
    assert len(colors) <= 3 * 6
    assert set(np.unique(label)) <= set(range(6))


def test_candidate_decision_selection_and_margin():
    """candidate_decision reproduces the reference's selection loop
    (tools/seg_evaluation.py:119-134 semantics: top-k shortlist, mean+std
    threshold, skip 0/255, break at first below-threshold slot, cap 5) and
    reports the min |score - threshold| over every examined slot."""
    # crafted: class 3 clearly above, class 5 marginal, rest below
    scores = np.array([0.90, 0.10, 0.12, 0.80, 0.11, 0.50, 0.13, 0.09])
    chosen, margin = candidate_decision(scores, 8, 10)
    order = np.argsort(-scores)[:8]
    top = scores[order]
    threshold = top.mean() + top.std(ddof=1)
    want, want_margin = [], np.inf
    for idx in order[:5]:
        if idx in (0, 255):
            continue
        want_margin = min(want_margin, abs(scores[idx] - threshold))
        if scores[idx] < threshold:
            break
        want.append(int(idx))
    assert chosen == want
    assert margin == pytest.approx(want_margin)
    # margin semantics: nudging every examined score AWAY from the
    # threshold by less than the margin cannot change the selection
    assert all(abs(scores[i] - threshold) >= margin for i in order[:5]
               if i not in (0, 255))


def test_aligned_fixture_pins_model_and_screens(tmp_path):
    """fixture='aligned' pins the tower weights across scene seeds (only
    the scene stream varies), and screen_margin-accepted scenes re-score
    above the margin with non-empty candidate sets on the torch side."""
    import torch

    from tools.seg_parity import (
        _make_parity_model,
        make_parity_tokenizer,
        torch_pooled_scores,
        torch_text_bank,
    )

    size, n_cls, margin = 96, 16, 1e-4
    roots = [tmp_path / "a", tmp_path / "b"]
    ckpts = []
    for root, seed in zip(roots, (3, 7)):
        root.mkdir()
        classes, tmodel, ckpt = build_fixture(
            str(root), 2, n_cls, seed, size, screen_margin=margin,
            fixture="aligned")
        ckpts.append(torch.load(ckpt, weights_only=True)["state_dict"])
        assert build_fixture.last_tries >= 2
    # model pinned to model_seed=0: identical weights for both scene seeds
    for k in ckpts[0]:
        assert torch.equal(ckpts[0][k], ckpts[1][k]), k

    # accepted scenes re-score above the margin (deterministic model)
    classes = PARITY_CLASSES[:n_cls]
    tmodel = _make_parity_model(size, 0)
    sd = {k: v for k, v in ckpts[0].items()}
    tmodel.load_state_dict(sd)
    tok = make_parity_tokenizer(classes)
    bank = torch_text_bank(tmodel, tok, classes, 25)
    from PIL import Image

    voc = roots[0] / "VOCdevkit" / "VOC2012" / "JPEGImages"
    for f in sorted(voc.iterdir()):
        img = np.asarray(Image.open(f).convert("RGB"))
        scores = torch_pooled_scores(tmodel, bank, img)
        chosen, m = candidate_decision(scores, n_cls, 10)
        assert chosen and m >= margin, (f.name, chosen, m)

    # the aligned text bank actually separates classes vs the random tower
    rand = _make_parity_model(size, 0)
    rand_bank = torch_text_bank(rand, tok, classes, 25)
    def offdiag(b):
        c = b @ b.T
        return float(c[~np.eye(len(c), dtype=bool)].mean())
    assert offdiag(bank) < offdiag(rand_bank) - 0.02


def test_screened_fixture_refuses_unreachable_margin(tmp_path):
    with pytest.raises(RuntimeError, match="screened fixture"):
        build_fixture(str(tmp_path), 2, 8, 0, 96, screen_margin=0.5,
                      fixture="aligned")


@pytest.mark.slow
def test_production_seg_parity_288px():
    """The quoted production-parity bound: at the REAL eval configuration
    the fused TPU pipeline and the torch/exact-CRF rederivation agree to a
    few percent of pixels and a fraction of an mIoU point."""
    out = run_parity(n_images=3, n_classes=8, seed=0, size=288)
    assert out["pixel_disagreement"] < 0.04, out
    assert abs(out["miou_delta"]) < 0.005, out  # < 0.5 mIoU points
    assert out["max_class_iou_delta"] < 0.02, out  # < 2 IoU points per class
    # discrete candidate selection may flip on threshold-marginal scores
    # (bf16 vs f32 towers); it must stay the exception, not the rule
    assert out["candidate_set_flips"] <= len(out["per_image"]) // 2, out


@pytest.mark.slow
def test_aligned_fixture_seg_parity_288px():
    """The aligned-fixture gate (round-5): informative attention + real
    candidate margins put the decode in its production regime, where the
    measured disagreement is dominated by the stride-8 bilateral boundary
    approximation (stride 4 halves it — BASELINE.md). Gates are set from
    the 33-scene/3-seed sweep (output/parity_r5_aligned_float.log) with
    headroom; per-class IoU is NOT gated per-run here because 4 scenes give
    a class 0-1 scenes of support (the pooled 33-scene gate lives in the
    sweep artifact)."""
    out = run_parity(n_images=4, n_classes=16, seed=1, size=288,
                     screen_margin=0.0015, fixture="aligned")
    assert out["pixel_disagreement"] < 0.04, out
    assert abs(out["miou_delta"]) < 0.02, out  # < 2 mIoU points on 4 scenes
    assert out["candidate_set_flips"] <= 1, out
