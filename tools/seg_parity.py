"""Production-settings zero-shot segmentation parity harness.

Measures, at the REAL eval configuration (ViT-S/16 towers at 288 px, bf16
tower + CRF numerics, stride-8 bilateral CRF, 7x7 morphology, nearest GT
resize), the total end-to-end disagreement between:

- this framework's fused on-device pipeline (``tasks/seg_eval.py``, the same
  code path ``tools/seg_evaluation.py`` runs), and
- an independent torch + numpy + cv2 re-derivation of the PyTorch
  reference's eval loop (reference ``tools/seg_evaluation.py:78-181``) with
  an *exact* mean-field dense CRF (no lattice/stride approximation).

The reference CRF (pydensecrf) is itself a permutohedral-lattice
approximation of exact mean-field; comparing against the exact solution is
the stricter test. Exact dense CRF is O(N^2) in general — intractable at
288 px — but for palette-limited images the bilateral message factorizes
over the palette: for pixel i with color c_i,

    m(i) = sum_j exp(-|p_i-p_j|^2/2sxy^2) exp(-|c_i-c_j|^2/2srgb^2) x(j)
         = sum_v exp(-|c_i-c_v|^2/2srgb^2) * [G_sxy * (x * 1{c=v})](p_i)

i.e. one exact full-extent spatial Gaussian convolution (FFT) per palette
color. The harness therefore evaluates on synthetic photo-like scenes
quantized to a small palette (dithered region shading keeps the bilateral
term non-trivial), where the exact reference is computable in
O(K * N log N). ``exact_dense_crf_palette`` is validated bit-for-bit
against the brute-force O(N^2) mean-field in
``tests/test_seg_parity_production.py``.

Reported metrics (JSON on stdout):
- pixel_disagreement: fraction of valid (non-255) GT pixels where the two
  pipelines' final class maps differ
- candidate_set_flips: images whose shortlisted candidate classes differ
  (discrete selection is threshold-gated; flips blow up pixel metrics and
  are reported separately)
- per-class IoU for both sides, max |delta| and mIoU delta

Usage:
    python tools/seg_parity.py [--images 8] [--classes 8] [--seed 0]

Platform: this environment's sitecustomize pins JAX to the tunneled TPU
regardless of the JAX_PLATFORMS env var (the var is overridden before user
code runs), so by default the flax side runs on the real chip — the
certification-grade lane. Set SIMSEG_PARITY_PLATFORM=cpu for a
tunnel-independent CPU screen (the round-3/4 proxy lane, agrees with the
TPU lane to ~0.1 pp).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("SIMSEG_PARITY_PLATFORM", "")
if _plat:
    # must precede backend init; sitecustomize's pin wins over JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", _plat)

# --------------------------------------------------------------------------
# Exact dense CRF for palette-limited images (numpy, FFT)
# --------------------------------------------------------------------------


def _full_gaussian_fft(h: int, w: int, sigma: float, fh: int, fw: int):
    """rfft2 of the full-extent (untruncated) 2-D Gaussian kernel
    exp(-0.5 d^2 / sigma^2) over all offsets (+-(h-1), +-(w-1)), zero-padded
    to (fh, fw) and rolled so the kernel center sits at the origin."""
    dy = np.arange(-(h - 1), h, dtype=np.float64)
    dx = np.arange(-(w - 1), w, dtype=np.float64)
    k = np.exp(-0.5 * (dy[:, None] ** 2 + dx[None, :] ** 2) / sigma**2)
    pad = np.zeros((fh, fw), np.float64)
    pad[: 2 * h - 1, : 2 * w - 1] = k
    pad = np.roll(pad, (-(h - 1), -(w - 1)), axis=(0, 1))
    return np.fft.rfft2(pad)


class _FFTConv:
    """'Same'-extent linear convolution with a full-extent Gaussian via
    zero-padded FFT — exact (to f64 roundoff) equivalent of the brute-force
    kernel-matrix product with exp(-0.5 |p_i - p_j|^2 / sigma^2)."""

    def __init__(self, h: int, w: int, sigma: float):
        # linear conv of (h, w) with (2h-1, 2w-1) kernel needs >= 3h-2
        from scipy.fft import next_fast_len

        self.h, self.w = h, w
        self.fh = next_fast_len(3 * h - 2)
        self.fw = next_fast_len(3 * w - 2)
        self.kfft = _full_gaussian_fft(h, w, sigma, self.fh, self.fw)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        """x: (..., h, w) -> (..., h, w)."""
        lead = x.shape[:-2]
        xp = np.zeros(lead + (self.fh, self.fw), np.float64)
        xp[..., : self.h, : self.w] = x
        y = np.fft.irfft2(np.fft.rfft2(xp) * self.kfft, s=(self.fh, self.fw))
        return y[..., : self.h, : self.w]


def exact_dense_crf_palette(
    probs: np.ndarray,
    rgb: np.ndarray,
    iters: int = 3,
    g_sxy: float = 3.0,
    g_compat: float = 3.0,
    b_sxy: float = 40.0,
    b_srgb: float = 13.0,
    b_compat: float = 10.0,
    color_chunk: int = 8,
    _shared=None,
) -> np.ndarray:
    """Exact 2-label mean-field dense CRF (Kraehenbuehl, symmetric kernel
    normalization, self-interaction included — the same math as the
    brute-force ``np_dense_crf`` in tests/test_crf_morphology.py) computed
    in O(K N log N) for a K-color palette image.

    probs: (H, W) foreground probability; rgb: (H, W, 3) uint8/float 0..255.
    Returns (H, W) int argmax mask.

    _shared: optional per-image state from :func:`crf_image_state` — the
    palette decomposition and kernel normalizations are class-independent,
    so callers refining several candidate classes of one image build it once.
    """
    h, w = probs.shape
    st = _shared if _shared is not None else crf_image_state(
        rgb, g_sxy=g_sxy, b_sxy=b_sxy, b_srgb=b_srgb, color_chunk=color_chunk,
        shape=(h, w),
    )

    p = probs.astype(np.float64)
    u = -np.log(np.stack([1.0 - p, p], 0) + 1e-8)  # (2, H, W)

    def softmax2(x):
        e = np.exp(x - x.max(0, keepdims=True))
        return e / e.sum(0, keepdims=True)

    q = softmax2(-u)
    for _ in range(iters):
        # 2-channel messages from the channel-0 convolution only:
        # q1 = 1 - q0, and the kernels are linear, so
        #   m1 = n * (K(n * 1) - K(n * q0)) = n * K(n) - m0'
        # where n * K(n) is the class-independent degree term cached in st.
        mg0 = st["ng"] * st["gconv"](st["ng"] * q[0])
        mb0 = st["nb"] * st["bilateral"](st["nb"] * q[0])
        m0 = g_compat * mg0 + b_compat * mb0
        m1 = (g_compat * st["g_total"] + b_compat * st["b_total"]) - m0
        q = softmax2(-u + np.stack([m0, m1], 0))
    return np.argmax(q, 0)


def crf_image_state(rgb: np.ndarray, g_sxy: float = 3.0, b_sxy: float = 40.0,
                    b_srgb: float = 13.0, color_chunk: int = 8,
                    shape=None) -> dict:
    """Class-independent exact-CRF state for one palette image: palette
    decomposition, FFT kernels, symmetric normalizations, and the
    n*K(n) degree fields used by the two-channel identity."""
    h, w = shape if shape is not None else rgb.shape[:2]
    flat = rgb.reshape(-1, 3).astype(np.float64)
    colors, inv = np.unique(flat, axis=0, return_inverse=True)
    kcol = len(colors)
    inv = inv.reshape(h, w)
    # color-kernel weights between palette entries
    cdist = ((colors[:, None, :] - colors[None, :, :]) ** 2).sum(-1)
    wc = np.exp(-0.5 * cdist / b_srgb**2)  # (K, K)

    gconv = _FFTConv(h, w, g_sxy)
    bconv = _FFTConv(h, w, b_sxy)
    onehot = np.stack([inv == v for v in range(kcol)]).astype(np.float64)

    def bilateral(x: np.ndarray) -> np.ndarray:
        """x: (h, w) -> exact bilateral-kernel product (h, w)."""
        out_per_color = np.empty((kcol, h, w), np.float64)
        for s in range(0, kcol, color_chunk):
            e = min(s + color_chunk, kcol)
            out_per_color[s:e] = bconv(x[None] * onehot[s:e])
        # m(i) = sum_v wc[c_i, v] * conv_v(i)
        mixed = np.einsum("av,vhw->ahw", wc, out_per_color)
        return np.take_along_axis(
            mixed.reshape(kcol, -1), inv.reshape(1, -1), axis=0
        ).reshape(h, w)

    ones = np.ones((h, w), np.float64)
    ng = 1.0 / np.sqrt(gconv(ones) + 1e-20)
    nb = 1.0 / np.sqrt(bilateral(ones) + 1e-20)
    return dict(
        gconv=gconv, bilateral=bilateral, ng=ng, nb=nb,
        g_total=ng * gconv(ng), b_total=nb * bilateral(nb),
    )


# --------------------------------------------------------------------------
# Synthetic palette-limited photo-like scenes
# --------------------------------------------------------------------------

# fixed palette: per class a base color plus two dithered shades (the
# dithering keeps the bilateral term non-trivial without growing the palette)
_BASE_COLORS = np.array([
    [95, 110, 100],    # background: muted green-grey
    [200, 60, 50],     # class 1: red
    [40, 70, 200],     # class 2: blue
    [230, 200, 60],    # class 3: yellow
    [60, 180, 90],     # class 4: green
    [170, 60, 180],    # class 5: purple
    [240, 140, 40],    # class 6: orange
    [70, 200, 210],    # class 7: cyan
    [150, 100, 60],    # class 8: brown
    [220, 220, 225],   # class 9: near-white
    [120, 140, 200],   # class 10: slate
    [30, 30, 35],      # class 11: near-black
], np.int32)
_SHADE_DELTAS = np.array([0, -18, 14], np.int32)


def class_palette(cls: int) -> np.ndarray:
    base = _BASE_COLORS[cls % len(_BASE_COLORS)]
    return np.clip(base[None, :] + _SHADE_DELTAS[:, None], 0, 255).astype(np.uint8)


def render_scene(rng: np.random.Generator, size: int, gt_size, n_classes: int,
                 max_objects: int = 4):
    """One photo-like palette scene.

    Returns (image_u8 (size, size, 3), label (gh, gw) uint8). Shapes are
    drawn analytically in relative coordinates so the 288-px image and the
    differently-sized GT label describe the same scene — exercising the
    production nearest GT-resize path.
    """
    gh, gw = gt_size
    # distinct foreground classes for this scene — at most the available
    # non-background classes (small --classes values)
    cap = min(max_objects, n_classes - 1)
    n_obj = int(rng.integers(min(2, cap), cap + 1))
    classes = rng.choice(np.arange(1, n_classes), size=n_obj, replace=False)
    shapes = []
    for cls in classes:
        cy, cx = rng.uniform(0.2, 0.8, 2)
        ry, rx = rng.uniform(0.08, 0.28, 2)
        ang = rng.uniform(0, np.pi)
        shapes.append((int(cls), cy, cx, ry, rx, ang))

    def paint(hh, ww, with_colors):
        yy, xx = np.mgrid[0:hh, 0:ww]
        fy = (yy + 0.5) / hh
        fx = (xx + 0.5) / ww
        label = np.zeros((hh, ww), np.uint8)
        for cls, cy, cx, ry, rx, ang in shapes:
            ca, sa = np.cos(ang), np.sin(ang)
            u = (fy - cy) * ca + (fx - cx) * sa
            v = -(fy - cy) * sa + (fx - cx) * ca
            label[(u / ry) ** 2 + (v / rx) ** 2 < 1.0] = cls
        if not with_colors:
            return label, None
        img = np.empty((hh, ww, 3), np.uint8)
        shade = rng.choice(len(_SHADE_DELTAS), size=(hh, ww),
                           p=[0.7, 0.15, 0.15])
        for cls in np.unique(label):
            pal = class_palette(int(cls))
            m = label == cls
            img[m] = pal[shade[m]]
        return label, img

    _, image = paint(size, size, True)
    label, _ = paint(gh, gw, False)
    return image, label


# --------------------------------------------------------------------------
# Torch reference eval at production settings
# --------------------------------------------------------------------------


def torch_text_bank(tmodel, tok, class_bank_texts, max_length: int = 25):
    """Zero-shot classifier bank on the torch reference side (reference
    ``tools/seg_evaluation.py:57-75``): per class, the L2-normed mean of the
    80 prompt embeddings."""
    import torch
    import torch.nn.functional as F

    from simseg_tpu.utils.prompts import openai_imagenet_template
    from tests.torch_reference import torch_topk_pool

    bank = []
    with torch.no_grad():
        for cls in class_bank_texts:
            enc = tok(openai_imagenet_template(cls), padding="max_length",
                      truncation=True, max_length=max_length)
            ids = torch.tensor(enc["input_ids"])
            msk = torch.tensor(enc["attention_mask"])
            tokens = tmodel.text_encoder.model(ids, msk)
            emb = torch_topk_pool(tmodel.text_projection.linear(tokens), 1, msk)
            emb = F.normalize(emb, dim=-1).mean(0)
            bank.append((emb / emb.norm()).numpy())
    return np.stack(bank)


def torch_pooled_scores(tmodel, bank, img_u8, image_k: int = 5):
    """Global class scores for one image on the torch reference side (the
    mean+std candidate-threshold inputs, reference :119-124)."""
    import torch
    import torch.nn.functional as F

    from tests.torch_reference import torch_topk_pool

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (img_u8.astype(np.float32) / 255.0 - mean) / std
    xt = torch.tensor(x.transpose(2, 0, 1))[None]
    with torch.no_grad():
        tokens = tmodel.image_encoder.model.model(xt)[:, 1:]
        proj = tmodel.image_projection.linear(tokens)
        pooled = F.normalize(torch_topk_pool(proj, image_k), dim=-1)
    return bank @ pooled[0].numpy()


def candidate_decision(scores, num_classes: int, top_cls_num: int):
    """The reference's discrete candidate selection (:119-134) plus its
    decision margin: the smallest |score - threshold| over every examined
    candidate slot. A scene whose margin is ~0 flips its whole candidate set
    under infinitesimal numeric jitter (bf16 vs f32 towers) — such scenes
    measure coin flips, not pipeline quality."""
    top_k = min(top_cls_num, num_classes)
    order = np.argsort(-scores)[:top_k]
    top = scores[order]
    threshold = top.mean() + top.std(ddof=1)
    chosen = []
    margin = np.inf
    for idx in order[:5]:
        if idx in (0, 255):
            continue
        margin = min(margin, abs(float(scores[idx]) - float(threshold)))
        if scores[idx] < threshold:
            break
        chosen.append(int(idx))
    return chosen, float(margin)


def torch_production_eval(tmodel, tok, batches, class_bank_texts,
                          num_classes: int, top_cls_num: int,
                          max_length: int = 25, image_k: int = 5,
                          patch: int = 16, crf_kwargs=None):
    """Faithful re-derivation of the reference eval loop (reference
    ``tools/seg_evaluation.py:78-181``): f32 torch towers, numpy decode
    heuristics, EXACT mean-field CRF, cv2 morphology + nearest resize.

    batches: list of dicts with image (B,S,S,3) u8, mask_label, mask_h/w.
    Returns (per-image preds at GT size, total_i, total_u, candidate sets).
    """
    import cv2
    import torch
    import torch.nn.functional as F

    crf_kwargs = crf_kwargs or {}
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    # zero-shot classifier (:57-75)
    bank = torch_text_bank(tmodel, tok, class_bank_texts, max_length)

    from tests.torch_reference import torch_topk_pool

    top_k = min(top_cls_num, num_classes)
    preds, cand_sets = [], []
    total_i = np.zeros(num_classes, np.float64)
    total_u = np.zeros(num_classes, np.float64)
    for batch in batches:
        for bi in range(batch["image"].shape[0]):
            img_u8 = np.asarray(batch["image"][bi])
            raw_h = int(batch["mask_h"][bi])
            raw_w = int(batch["mask_w"][bi])
            label = np.asarray(batch["mask_label"][bi])[:raw_h, :raw_w]
            size = img_u8.shape[0]
            grid = size // patch

            x = (img_u8.astype(np.float32) / 255.0 - mean) / std
            xt = torch.tensor(x.transpose(2, 0, 1))[None]
            with torch.no_grad():
                tokens = tmodel.image_encoder.model.model(xt)[:, 1:]
                proj = tmodel.image_projection.linear(tokens)
                pooled = F.normalize(torch_topk_pool(proj, image_k), dim=-1)
                pooled = pooled[0].numpy()
                dense = F.normalize(proj, dim=-1)[0].numpy()

            # shortlist + threshold (:119-124; torch.std is ddof=1)
            scores = bank @ pooled
            order = np.argsort(-scores)[:top_k]
            top = scores[order]
            threshold = top.mean() + top.std(ddof=1)

            state = None
            chosen = []
            temp_pred = np.zeros((num_classes, raw_h, raw_w))
            for idx in order[:5]:
                if idx in (0, 255):
                    continue
                if scores[idx] < threshold:
                    break
                chosen.append(int(idx))
                attn = (dense @ bank[idx]).reshape(grid, grid)
                attn = attn.repeat(patch, 0).repeat(patch, 1)
                norm_attn = (attn - attn.min()) / (attn.max() - attn.min())
                if state is None:
                    state = crf_image_state(img_u8.astype(np.float64),
                                            **crf_kwargs)
                binary = exact_dense_crf_palette(
                    norm_attn, img_u8.astype(np.float64), _shared=state
                ) * 255
                kernel = np.ones((7, 7), np.uint8)
                m = cv2.dilate(binary.astype(np.uint8), kernel)
                m = cv2.erode(m, kernel)
                m = cv2.resize(m, (raw_w, raw_h),
                               interpolation=cv2.INTER_NEAREST)
                temp_pred[idx] = m * scores[idx]

            pred = temp_pred.argmax(0)
            preds.append(pred)
            cand_sets.append(chosen)
            valid = label != 255
            for c in range(num_classes):
                pi = (pred == c) & valid
                li = (label == c) & valid
                inter = np.sum(pi & li)
                total_i[c] += inter
                total_u[c] += pi.sum() + li.sum() - inter
    return preds, total_i, total_u, cand_sets


# --------------------------------------------------------------------------
# Harness
# --------------------------------------------------------------------------

PARITY_CLASSES = [
    "background", "aeroplane", "bicycle", "bird", "boat", "bottle", "bus",
    "car", "cat", "chair", "cow", "dog", "horse", "person", "sheep", "train",
][:]


def make_parity_tokenizer(classes):
    """WordPiece tokenizer covering the prompt bank + class names (shared by
    both sides)."""
    import re as _re

    from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
    from simseg_tpu.utils.prompts import IMAGENET_TEMPLATES

    words = set()
    for t in IMAGENET_TEMPLATES:
        words.update(_re.findall(r"[a-z]+", t.format("x").lower()))
    for c in classes:
        words.update(_re.findall(r"[a-z]+", c.lower()))
    tok = WordPieceTokenizer(make_test_vocab(sorted(words)))
    assert max(tok.vocab.values()) < 256, "bump bert vocab_size"
    return tok


def _make_parity_model(size: int, model_seed: int):
    """The bridged-tower fixture model: ViT-S/16 image tower (the published
    simseg.vit-s architecture); mid-size BERT text tower (the bank builder —
    bridging + naming parity for full BERT-base is covered by
    test_real_transformers_bridge)."""
    import torch

    from tests.torch_reference import TorchTinyCLIP

    torch.manual_seed(model_seed)
    tmodel = TorchTinyCLIP(
        proj_dim=512,
        vit_kwargs=dict(img_size=size, patch=16, dim=384, depth=12, heads=6),
        bert_kwargs=dict(vocab=256, dim=384, depth=6, heads=6, inter=1536,
                         max_pos=64),
    )
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    return tmodel


def _separate_text_classes(tmodel, tok, classes, alpha: float = 10.0):
    """Amplify the class-name word-embedding rows of the text tower so the
    class word actually influences each prompt's embedding.

    A randomly-initialized text tower maps all 80-prompt class means to one
    direction (measured 0.993 mean pairwise cosine): the template tokens
    drown the single class-name token, so every decode decision differs by
    ~1e-4 of cosine — the coin-flip regime. Real CLIP text towers separate
    class names (that is what makes zero-shot segmentation work at all);
    one in-place row scale restores that property without training, and the
    scaled table rides the normal checkpoint bridge."""
    import torch

    ids = set()
    for c in classes:
        enc = tok([c], padding="max_length", truncation=True, max_length=25)
        row, msk = enc["input_ids"][0], enc["attention_mask"][0]
        toks = [t for t, m in zip(row, msk) if m]
        ids.update(toks[1:-1])  # strip [CLS]/[SEP]
    table = tmodel.text_encoder.model.model.embeddings.word_embeddings.weight
    with torch.no_grad():
        table[sorted(ids)] *= alpha


def _align_image_projection(tmodel, bank, size: int, n_classes: int,
                            model_seed: int, patch: int = 16,
                            n_align_scenes: int = 6):
    """Solve the image projection so patch projections align with each
    class's text embedding (ridge least squares over alignment scenes).

    Random towers give every decode decision a ~1e-4 score margin (all
    class scores nearly equal) and featureless attention maps — the decode
    then operates on coin flips, the regime the round-5 sweep showed blows
    up pixel metrics without measuring quality. A production model has
    informative attention (the reference's published 56 mIoU is only
    possible because of it); one closed-form solve of the 384->512 linear
    projection puts the fixture in that regime without training, and the
    solved weight rides the normal checkpoint bridge like any other."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(982_451 + model_seed)
    feats, targets = [], []
    with torch.no_grad():
        for _ in range(n_align_scenes):
            img, label = render_scene(rng, size, (size, size), n_classes)
            mean = np.array([0.485, 0.456, 0.406], np.float32)
            std = np.array([0.229, 0.224, 0.225], np.float32)
            x = (img.astype(np.float32) / 255.0 - mean) / std
            xt = torch.tensor(x.transpose(2, 0, 1))[None]
            tokens = tmodel.image_encoder.model.model(xt)[0, 1:].numpy()
            patch_cls = label[patch // 2::patch, patch // 2::patch].reshape(-1)
            feats.append(tokens)
            targets.append(bank[patch_cls])
    E = np.concatenate(feats, axis=0).astype(np.float64)
    T = np.concatenate(targets, axis=0).astype(np.float64)
    G = E.T @ E
    lam = 1e-3 * np.trace(G) / G.shape[0]
    W = np.linalg.solve(G + lam * np.eye(G.shape[0]), E.T @ T)  # (384, 512)
    with torch.no_grad():
        tmodel.image_projection.linear.weight.copy_(
            torch.tensor(W.T, dtype=torch.float32))


def build_fixture(root, n_images: int, n_classes: int, seed: int,
                  size: int = 288, screen_margin: float = 0.0,
                  model_seed=None, max_length: int = 25,
                  top_cls_num: int = 10, fixture: str = "random"):
    """VOC2012-layout fixture of palette scenes + the bridged ViT-S/16
    checkpoint. Returns (classes, tmodel, ckpt_path).

    ``screen_margin > 0`` enables margin-screened generation (round-4
    verdict #6, round-5 sweep finding): the torch model is pinned to
    ``model_seed`` (default 0 — the certified tower) while scenes stream
    from ``seed``; a scene is accepted only when the reference side's
    candidate decision is non-empty and holds at least ``screen_margin`` of
    score-threshold margin at every examined slot. Unscreened multi-seed
    sweeps reseeded the random weights together with the scenes and
    produced decision-unstable scenes (reference mIoU ~0.005) whose pixel
    metrics measure coin flips, not pipeline quality
    (output/parity_r5_sweep_*.log).

    ``fixture='aligned'`` additionally solves the image projection to align
    patch projections with the class text embeddings (the trained-model
    regime — see ``_align_image_projection``); margins then sit 2-3 orders
    of magnitude above numeric jitter and screening acceptance is high.
    """
    import torch
    from PIL import Image

    if fixture not in ("random", "aligned"):
        raise ValueError(f"unknown fixture mode {fixture!r} "
                         "(random|aligned)")
    classes = PARITY_CLASSES[:n_classes]
    aligned = fixture == "aligned"
    screening = screen_margin > 0.0
    if model_seed is None:
        model_seed = 0 if (screening or aligned) else seed
    tmodel = _make_parity_model(size, model_seed)
    bank = None
    if screening or aligned:
        tok = make_parity_tokenizer(classes)
        if aligned:
            _separate_text_classes(tmodel, tok, classes)
        bank = torch_text_bank(tmodel, tok, classes, max_length)
    if aligned:
        _align_image_projection(tmodel, bank, size, n_classes, model_seed)

    rng = np.random.default_rng(seed)
    voc = os.path.join(root, "VOCdevkit", "VOC2012")
    os.makedirs(os.path.join(voc, "JPEGImages"))
    os.makedirs(os.path.join(voc, "SegmentationClass"))
    os.makedirs(os.path.join(voc, "ImageSets", "Segmentation"))
    names = []
    accepted, tried = 0, 0
    max_tries = max(20 * n_images, 40)
    while accepted < n_images:
        gt_h = int(rng.integers(320, 512))
        gt_w = int(rng.integers(320, 512))
        img, label = render_scene(rng, size, (gt_h, gt_w), n_classes)
        tried += 1
        if screening:
            if tried > max_tries:
                raise RuntimeError(
                    f"screened fixture: {accepted}/{n_images} scenes after "
                    f"{tried} tries at margin {screen_margin} — lower the "
                    "margin or inspect the generator")
            scores = torch_pooled_scores(tmodel, bank, img)
            chosen, margin = candidate_decision(scores, n_classes,
                                                top_cls_num)
            if not chosen or margin < screen_margin:
                continue
        n = f"2007_{accepted:06d}"
        names.append(n)
        accepted += 1
        # PNG content under the .jpg name: both decode paths sniff magic
        # bytes, and JPEG's lossy DCT would break the palette the exact
        # CRF depends on
        Image.fromarray(img).save(
            os.path.join(voc, "JPEGImages", f"{n}.jpg"), format="PNG")
        Image.fromarray(label).save(
            os.path.join(voc, "SegmentationClass", f"{n}.png"))
    with open(os.path.join(voc, "ImageSets", "Segmentation", "val.txt"),
              "w") as f:
        f.write("\n".join(names))

    ckpt = os.path.join(root, "vit_s_parity.pth")
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)
    build_fixture.last_tries = tried  # screening-rate observability
    return classes, tmodel, ckpt


def make_parity_cfg(root, n_images: int, size: int = 288,
                    batch_size_val: int = 2, tome_r: int = 0,
                    quant: str = "none", stride: int = 8,
                    quant_towers: str = "both", tome_schedule=None,
                    crf_backend: str = "auto"):
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    # quality cost of the opt-in inference transforms (ops/tome.py token
    # merging, ops/quant.py int8 PTQ): the torch reference side stays
    # exact, so the reported disagreement quantifies what each trades for
    # its speedup at production settings
    arch = {}
    if tome_r:
        arch["tome_r"] = int(tome_r)
    if tome_schedule:
        # fewer, larger merges (models/vit.py tome_schedule): same final
        # token count as the uniform r, ~4 distinct block shapes instead of
        # 12 — priced here against the exact reference like every lane
        arch["tome_schedule"] = tuple(int(r) for r in tome_schedule)
    quantized = quant not in (None, "", "none")
    if quantized:
        arch["quant"] = str(quant)
    # --quant_towers both: quantize BOTH towers (the text side builds the
    # zero-shot classifier bank) — the fully-quantized configuration.
    # --quant_towers image: image tower only — the configuration bench.py's
    # quant lanes actually time (the classifier bank is built once per
    # dataset outside the hot loop, so quantizing the text tower buys no
    # throughput and only adds score error to the threshold decision).
    text_arch = {"vocab_size": 256, "hidden_dim": 384, "depth": 6,
                 "num_heads": 6, "intermediate_dim": 1536,
                 "max_position": 64, "type_vocab_size": 2}
    if quantized and quant_towers == "both":
        text_arch["quant"] = str(quant)
    return update_cfg(task_cfg_init_fn, None, argv=([
        f"model.image_encoder.arch={arch!r}",
    ] if arch else []) + [
        f"data.data_path={root}/",
        f"data.batch_size_val={batch_size_val}",
        "data.num_workers=1",
        "model.max_length=25",
        "model.image_encoder.tag=vit_small_patch16_224",
        "model.text_encoder.tag=bert_parity",
        f"model.text_encoder.arch={text_arch!r}",
        "model.projection.name=simple",
        "model.projection.dim=512",
        "model.pool.name=loda",
        "model.pool.loda.image_k=5",
        "model.pool.loda.text_k=1",
        # PRODUCTION numerics: bf16 towers (configs/clip/simseg.vit-s.yaml
        # dist.bf16) and the bf16 CRF/morphology lane the TPU eval runs
        # (crf_dtype auto->bf16 on accelerators; forced here so the CPU
        # harness exercises the same lane)
        "dist.bf16=True",
        "seg_eval.crf_dtype=bfloat16",
        # CRF bilateral stride (default 8 = the production setting; the
        # torch reference side is exact/stride-free either way, so coarser
        # strides are priced directly against the exact decode)
        f"seg_eval.bilateral_stride={int(stride)}",
        # CRF lane pin (A/B: 'auto' -> the fused Pallas kernel on TPU;
        # 'xla' -> the materialized-kernel lane the round-4 numbers used)
        f"seg_eval.crf_backend={crf_backend}",
        f"transforms.input_size={size}",
        f"transforms.resize.size={size}",
        "transforms.valid_transforms=[resize]",
    ], target=new_base_cfg())


def run_parity(n_images: int = 8, n_classes: int = 8, seed: int = 0,
               size: int = 288, root=None, tome_r: int = 0,
               quant: str = "none", stride: int = 8,
               quant_towers: str = "both", tome_schedule=None,
               crf_backend: str = "auto",
               screen_margin: float = 0.0, fixture: str = "random") -> dict:
    """Run both pipelines on the same fixture; return the metric dict.
    Owns (and removes) a temp fixture dir unless ``root`` is given."""
    owns_root = root is None
    if owns_root:
        root = tempfile.mkdtemp(prefix="seg_parity_")
    try:
        return _run_parity(root, n_images, n_classes, seed, size, tome_r,
                           quant, stride, quant_towers, tome_schedule,
                           crf_backend, screen_margin, fixture)
    finally:
        if owns_root:
            import shutil

            shutil.rmtree(root, ignore_errors=True)


def _run_parity(root, n_images, n_classes, seed, size, tome_r=0,
                quant="none", stride=8, quant_towers="both",
                tome_schedule=None, crf_backend="auto",
                screen_margin=0.0, fixture="random") -> dict:
    import jax
    import jax.numpy as jnp

    import torch

    from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint
    from simseg_tpu.data.datasets import build_seg_valid_loader
    from simseg_tpu.models.clip import build_clip_model
    from simseg_tpu.tasks.seg_eval import (
        make_seg_forward,
        zero_shot_classifier,
    )
    from simseg_tpu.utils.metrics import miou_from_totals

    classes, tmodel, ckpt = build_fixture(root, n_images, n_classes, seed,
                                          size, screen_margin=screen_margin,
                                          fixture=fixture)
    cfg = make_parity_cfg(root, n_images, size, tome_r=tome_r, quant=quant,
                          stride=stride, quant_towers=quant_towers,
                          tome_schedule=tome_schedule,
                          crf_backend=crf_backend)

    # shared tokenizer: specials + every word the prompt bank and class
    # names can produce
    tok = make_parity_tokenizer(classes)

    # ---- flax side (the production pipeline) ----
    model = build_clip_model(cfg)
    dummy = {
        "image": jnp.zeros((1, size, size, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 25), jnp.int32),
        "attention_mask": jnp.ones((1, 25), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    params, report = load_clip_checkpoint(ckpt, params)
    assert not report["missing"] and not report["mismatched"], report

    if quant not in (None, "", "none"):
        # cache the int8 weights; int8_static additionally calibrates
        # activation scales on the harness scenes (image tower) and the
        # prompt bank (text tower) — the standard PTQ calibration flow
        from simseg_tpu.tasks.seg_eval import prepare_quant_params

        calib = None
        if quant == "int8_static":
            # calibrate on the FULL fixture (running absmax over every
            # batch): a single-batch calibration clips the other scenes'
            # activation outliers, which measurably perturbs the pooled
            # scores feeding the mean+std candidate threshold
            import numpy as _np

            calib_loader = build_seg_valid_loader(cfg, "pascal_voc")
            calib = _np.concatenate(
                [_np.asarray(b["image"]) for b in calib_loader], axis=0)
        params = prepare_quant_params(model, params, cfg,
                                      calib_images_u8=calib, tokenizer=tok,
                                      classnames=classes)

    top_cls_num = 10  # VOC setting (reference :247)
    canvas = 512
    text_bank = zero_shot_classifier(model, params, classes, tok,
                                     max_length=cfg.model.max_length)
    forward = make_seg_forward(model, cfg, len(classes), top_cls_num, canvas,
                               patch_size=16, return_pred=True)

    # host-side replica of the decode's candidate selection (the decode's
    # own scores are an f32 einsum of the f32-cast pooled embedding and the
    # f32 bank — identical math on the host), to report discrete
    # candidate-set flips separately from continuous pixel disagreement
    from simseg_tpu.data.transforms import normalize_images

    nmean = tuple(cfg.transforms.normalize.mean)
    nstd = tuple(cfg.transforms.normalize.std)

    @jax.jit
    def pooled_fn(params, images_u8):
        images = normalize_images(images_u8, nmean, nstd)
        tokens = model.apply(
            params, images, method=lambda m, im: m.forward_image_tokens(im))
        pooled = model.apply(
            params, tokens[:, 1:],
            method=lambda m, t: m.forward_image_project(t))
        return pooled.astype(jnp.float32)

    def candidate_set(scores):
        return candidate_decision(scores, len(classes), top_cls_num)[0]

    loader = build_seg_valid_loader(cfg, "pascal_voc")
    batches = []
    total_i = np.zeros(len(classes), np.float64)
    total_u = np.zeros(len(classes), np.float64)
    ours_preds, ours_cands = [], []
    palette = {tuple(c) for cls in range(n_classes)
               for c in class_palette(cls)}
    for batch in loader:
        images = np.asarray(batch["image"])
        seen = {tuple(c) for c in images.reshape(-1, 3)}
        assert seen <= palette, (
            f"loader output left the palette ({len(seen - palette)} new "
            "colors) — the identity resize must be lossless")
        labels = batch["mask_label"]
        b = images.shape[0]
        gt_h = np.asarray(batch.get("mask_h", [labels.shape[1]] * b), np.int32)
        gt_w = np.asarray(batch.get("mask_w", [labels.shape[2]] * b), np.int32)
        padded = np.full((b, canvas, canvas), 255, np.int32)
        padded[:, : labels.shape[1], : labels.shape[2]] = labels
        batches.append(dict(image=images, mask_label=labels,
                            mask_h=gt_h, mask_w=gt_w))
        inter, union, pred = forward(
            params, jnp.asarray(images), text_bank, jnp.asarray(padded),
            jnp.asarray(gt_h), jnp.asarray(gt_w),
        )
        total_i += np.asarray(inter, np.float64)
        total_u += np.asarray(union, np.float64)
        pred = np.asarray(pred)
        pooled = np.asarray(pooled_fn(params, jnp.asarray(images)))
        for bi in range(b):
            ours_preds.append(pred[bi, : gt_h[bi], : gt_w[bi]])
            ours_cands.append(candidate_set(pooled[bi] @ text_bank.T))

    # ---- torch reference side ----
    ref_preds, ref_i, ref_u, ref_cands = torch_production_eval(
        tmodel, tok, batches, classes, len(classes), top_cls_num,
        max_length=cfg.model.max_length,
    )

    def confusion(pred, label, valid):
        ci = np.zeros(len(classes), np.float64)
        cu = np.zeros(len(classes), np.float64)
        for c in range(len(classes)):
            pi = (pred == c) & valid
            li = (label == c) & valid
            inter = np.sum(pi & li)
            ci[c] = inter
            cu[c] = pi.sum() + li.sum() - inter
        return ci, cu

    flips = 0
    disagree = 0
    valid_total = 0
    # "noflip" accumulators: continuous mask quality on the scenes where
    # BOTH pipelines selected the same candidate set. Candidate flips are a
    # discrete amplifier (one flip on a thin-support class = the whole
    # class's IoU) driven by score jitter vs the fixture's achievable
    # decision margins; they are counted and gated separately, so the
    # pixel/mIoU metrics can measure what the masks themselves do.
    nf_disagree = nf_valid = 0
    nf_i_ours = np.zeros(len(classes), np.float64)
    nf_u_ours = np.zeros(len(classes), np.float64)
    nf_i_ref = np.zeros(len(classes), np.float64)
    nf_u_ref = np.zeros(len(classes), np.float64)
    per_image = []
    idx = 0
    for batch in batches:
        for bi in range(batch["image"].shape[0]):
            raw_h = int(batch["mask_h"][bi])
            raw_w = int(batch["mask_w"][bi])
            label = np.asarray(batch["mask_label"][bi])[:raw_h, :raw_w]
            valid = label != 255
            ours = ours_preds[idx]
            ref = ref_preds[idx]
            d = int(((ours != ref) & valid).sum())
            v = int(valid.sum())
            disagree += d
            valid_total += v
            flipped = set(ours_cands[idx]) != set(ref_cands[idx])
            if flipped:
                flips += 1
            else:
                nf_disagree += d
                nf_valid += v
                ci, cu = confusion(ours, label, valid)
                nf_i_ours += ci
                nf_u_ours += cu
                ci, cu = confusion(ref, label, valid)
                nf_i_ref += ci
                nf_u_ref += cu
            per_image.append(dict(pixels=v, disagree=d,
                                  ref_candidates=ref_cands[idx],
                                  our_candidates=ours_cands[idx]))
            idx += 1

    iou_ours, miou_ours = miou_from_totals(total_i, total_u)
    with np.errstate(divide="ignore", invalid="ignore"):
        iou_ref = ref_i / ref_u
    miou_ref = float(np.nanmean(iou_ref))
    both = ~(np.isnan(np.asarray(iou_ours)) | np.isnan(iou_ref))
    iou_delta = float(np.max(np.abs(np.asarray(iou_ours)[both]
                                    - iou_ref[both]))) if both.any() else 0.0

    return dict(
        n_images=n_images,
        n_classes=n_classes,
        seed=seed,
        size=size,
        fixture=fixture,
        screen_margin=screen_margin,
        scenes_tried=getattr(build_fixture, "last_tries", n_images),
        tome_r=tome_r,
        tome_schedule=list(tome_schedule) if tome_schedule else None,
        quant=quant,
        quant_towers=quant_towers,
        pixel_disagreement=disagree / max(valid_total, 1),
        candidate_set_flips=flips,
        miou_ours=float(miou_ours),
        miou_ref=miou_ref,
        miou_delta=float(miou_ours - miou_ref),
        max_class_iou_delta=iou_delta,
        iou_ours=[None if np.isnan(v) else round(float(v), 4)
                  for v in np.asarray(iou_ours)],
        iou_ref=[None if np.isnan(v) else round(float(v), 4)
                 for v in iou_ref],
        # raw confusion totals so multi-seed sweeps can POOL per-class IoU
        # across all scenes (per-seed per-class IoU over 11 scenes rests on
        # 1-3 scenes of support per class; one mask difference swings it
        # tens of points)
        totals_ours=[list(map(float, total_i)), list(map(float, total_u))],
        totals_ref=[list(map(float, ref_i)), list(map(float, ref_u))],
        # flip-decomposed continuous quality (same-candidate scenes only)
        noflip_pixel_disagreement=nf_disagree / max(nf_valid, 1),
        noflip_totals_ours=[list(nf_i_ours), list(nf_u_ours)],
        noflip_totals_ref=[list(nf_i_ref), list(nf_u_ref)],
        per_image=per_image,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--classes", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--size", type=int, default=288)
    ap.add_argument("--tome_r", type=int, default=0,
                    help="token merging r (quality-cost measurement)")
    ap.add_argument("--tome_schedule", type=str, default="",
                    help="comma-separated per-block merge counts "
                         "(e.g. 48,0,0,48,0,0,48,0,0,48,0,0) — overrides "
                         "--tome_r with fewer, larger merges")
    ap.add_argument("--quant", type=str, default="none",
                    help="int8 PTQ inference lane (quality-cost measurement)")
    ap.add_argument("--stride", type=int, default=8,
                    help="CRF bilateral stride (coarser = faster decode; "
                         "priced against the exact stride-free reference)")
    ap.add_argument("--crf_backend", type=str, default="auto",
                    help="pin the CRF lane (auto|fused|xla|pallas)")
    ap.add_argument("--quant_towers", type=str, default="both",
                    choices=["both", "image"],
                    help="which towers --quant applies to; 'image' matches "
                         "bench.py's quant lanes (the one-time classifier "
                         "bank stays float)")
    ap.add_argument("--seeds", type=str, default="",
                    help="comma list of fixture seeds; runs every seed and "
                         "prints one aggregated JSON with per-gate margins "
                         "(round-4 verdict #6: a single 8-scene/1-seed "
                         "fixture is too narrow a base for the certifying "
                         "gates)")
    ap.add_argument("--fixture", type=str, default="random",
                    choices=["random", "aligned"],
                    help="'aligned' solves the image projection so patch "
                         "projections align with the class text bank (the "
                         "trained-model regime: real margins, informative "
                         "attention); 'random' is the legacy certified "
                         "fixture")
    ap.add_argument("--screen_margin", type=float, default=0.0,
                    help="margin-screened scene generation: pin the model "
                         "to seed 0, stream scenes from --seed(s), accept "
                         "only scenes whose reference-side candidate "
                         "decision is non-empty with >= this score-"
                         "threshold margin at every examined slot (the "
                         "round-5 sweep showed unscreened reseeding yields "
                         "decision-unstable scenes that measure coin flips)")
    args = ap.parse_args()
    sched = (tuple(int(x) for x in args.tome_schedule.split(","))
             if args.tome_schedule else None)
    if args.seeds:
        runs = []
        for seed in (int(s) for s in args.seeds.split(",")):
            r = run_parity(args.images, args.classes, seed, args.size,
                           tome_r=args.tome_r, quant=args.quant,
                           stride=args.stride,
                           quant_towers=args.quant_towers,
                           tome_schedule=sched,
                           crf_backend=args.crf_backend,
                           screen_margin=args.screen_margin,
                           fixture=args.fixture)
            r.pop("per_image", None)
            runs.append(r)
            print(json.dumps(r), flush=True)
        pix = [r["pixel_disagreement"] for r in runs]
        miou_d = [abs(r["miou_delta"]) for r in runs]
        cls_d = [r["max_class_iou_delta"] for r in runs]
        flips = sum(r["candidate_set_flips"] for r in runs)
        n_scenes = args.images * len(runs)
        # POOLED per-class IoU over every scene of every seed: per-seed
        # per-class IoU rests on 1-3 scenes of support per class, so one
        # boundary difference swings it tens of points; the pooled totals
        # are the statistically meaningful class-level comparison
        def pooled(key_ours, key_ref):
            oi = np.sum([r[key_ours][0] for r in runs], axis=0)
            ou = np.sum([r[key_ours][1] for r in runs], axis=0)
            ri = np.sum([r[key_ref][0] for r in runs], axis=0)
            ru = np.sum([r[key_ref][1] for r in runs], axis=0)
            with np.errstate(divide="ignore", invalid="ignore"):
                iou_o, iou_r = oi / ou, ri / ru
            both = ~(np.isnan(iou_o) | np.isnan(iou_r))
            cls = float(np.max(np.abs(iou_o[both] - iou_r[both])))
            miou = float(np.nanmean(iou_o) - np.nanmean(iou_r))
            return miou, cls

        pooled_miou, pooled_cls = pooled("totals_ours", "totals_ref")
        nf_miou, nf_cls = pooled("noflip_totals_ours", "noflip_totals_ref")
        nf_pix = [r["noflip_pixel_disagreement"] for r in runs]
        # gate margins: distance from the aligned-fixture CATASTROPHE
        # bounds at the WORST point — <4% pixel per seed, flip-decomposed
        # pooled |mIoU delta| < 2.5 pt, flip-decomposed pooled per-class
        # delta < 20 pt, flips <= 15% of scenes. These absolute bounds
        # catch a broken pipeline; the precise certification is RELATIVE —
        # each accelerated lane's noflip numbers are priced against the
        # float lane's in BASELINE.md (float itself measures -1.1 pt vs
        # the exact-CRF reference, the stride-8 bilateral boundary bias;
        # stride 4 measurably halves it). Candidate flips are a discrete
        # amplifier of score jitter vs the fixture's achievable decision
        # margins, so they are counted here and excluded from the
        # continuous metrics.
        agg = dict(
            aggregate=True, n_scenes=n_scenes, seeds=args.seeds,
            fixture=args.fixture, screen_margin=args.screen_margin,
            scenes_tried=sum(r.get("scenes_tried", args.images)
                             for r in runs),
            pixel_mean=float(np.mean(pix)), pixel_worst=float(np.max(pix)),
            miou_delta_mean=float(np.mean(miou_d)),
            miou_delta_worst=float(np.max(miou_d)),
            max_class_iou_delta_worst=float(np.max(cls_d)),
            pooled_miou_delta=pooled_miou,
            pooled_max_class_iou_delta=pooled_cls,
            candidate_set_flips=flips,
            # flip-decomposed (same-candidate scenes): the continuous mask
            # quality the tight gates certify
            noflip_pixel_worst=float(np.max(nf_pix)),
            noflip_pooled_miou_delta=nf_miou,
            noflip_pooled_max_class_iou_delta=nf_cls,
            margin_pixel_pct=float(4.0 - 100.0 * np.max(nf_pix)),
            margin_miou_pt=float(2.5 - 100.0 * abs(nf_miou)),
            margin_class_pt=float(20.0 - 100.0 * nf_cls),
            margin_flips=float(0.15 - flips / max(n_scenes, 1)),
        )
        print(json.dumps(agg))
        return
    out = run_parity(args.images, args.classes, args.seed, args.size,
                     tome_r=args.tome_r, quant=args.quant,
                     stride=args.stride, quant_towers=args.quant_towers,
                     tome_schedule=sched, crf_backend=args.crf_backend,
                     screen_margin=args.screen_margin,
                     fixture=args.fixture)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
