"""Int8 PTQ inference lane (ops/quant.py + the ViT ``quant`` arch knob).

Beyond-reference serving feature. The numerics contract under test:
- the quantizers are exact on int8-grid inputs (so the matmul path is
  verified bit-level, not just "close");
- param trees are UNCHANGED vs the float modules (any bridged torch or
  native checkpoint loads into a quantized tower verbatim);
- training refuses the knob loudly (round() has zero gradient a.e.).
"""

import flax.linen as nn
import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.models.vit import VisionTransformer
from simseg_tpu.ops.quant import (QuantDense, dense_cls, int8_matmul,
                                  quantize_colwise, quantize_rowwise)
from tests.test_models import tiny_clip


# ------------------------------------------------------------- quantizers

def test_quantize_rowwise_shapes_and_bound():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 16)).astype(np.float32) * 4.0
    q, s = quantize_rowwise(jnp.asarray(x))
    assert q.dtype == jnp.int8 and q.shape == x.shape
    assert s.shape == (3, 5, 1)
    qn, sn = np.asarray(q, np.float32), np.asarray(s)
    # symmetric: |q| <= 127; dequant error bounded by half a step per elt
    assert np.abs(qn).max() <= 127
    assert np.all(np.abs(qn * sn - x) < sn * 0.5 + 1e-6)
    # per-token scale: each row's max maps back to (close to) itself
    np.testing.assert_allclose(np.abs(qn).max(-1) * sn[..., 0],
                               np.abs(x).max(-1), rtol=1e-5)


def test_quantize_colwise_shapes_and_bound():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(16, 24)).astype(np.float32)
    q, s = quantize_colwise(jnp.asarray(w))
    assert q.dtype == jnp.int8 and q.shape == w.shape
    assert s.shape == (24,)
    qn, sn = np.asarray(q, np.float32), np.asarray(s)
    assert np.all(np.abs(qn * sn[None, :] - w) < sn[None, :] * 0.5 + 1e-6)


def test_quantize_zero_rows_are_finite():
    # a zero token / zero channel must not divide by zero
    q, s = quantize_rowwise(jnp.zeros((2, 4)))
    assert np.all(np.asarray(q) == 0) and np.isfinite(np.asarray(s)).all()
    q, s = quantize_colwise(jnp.zeros((4, 3)))
    assert np.all(np.asarray(q) == 0) and np.isfinite(np.asarray(s)).all()


def test_int8_matmul_exact_on_grid():
    """On inputs already representable on the int8 grid the whole pipeline
    (scale derivation, rounding, int32 accumulation, rank-1 dequant) is
    EXACT — power-of-two scales keep every f32 product representable."""
    rng = np.random.default_rng(2)
    xi = rng.integers(-127, 128, (4, 9, 32))
    xi[..., 0] = 127  # pin each row's max so scale_x is exactly c
    wi = rng.integers(-127, 128, (32, 24))
    wi[0, :] = 127    # pin each column's max so scale_w is exactly d
    c, d = 2.0 ** -5, 2.0 ** -8
    x = (xi * c).astype(np.float32)
    w = (wi * d).astype(np.float32)
    b = rng.normal(size=(24,)).astype(np.float32)
    got = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w),
                                 jnp.asarray(b)))
    want = ((xi.astype(np.int64) @ wi.astype(np.int64)).astype(np.float64)
            * c * d + b).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_int8_matmul_close_on_gaussian():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 50, 64)).astype(np.float32)
    w = (rng.normal(size=(64, 96)) * 0.05).astype(np.float32)
    y = np.asarray(int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    ref = x @ w
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.02, rel


def test_int8_matmul_out_dtype():
    x = jnp.ones((2, 8))
    w = jnp.ones((8, 4))
    assert int8_matmul(x, w, out_dtype=jnp.bfloat16).dtype == jnp.bfloat16
    assert int8_matmul(x, w).dtype == jnp.float32


def test_int8_matmul_accumulates_int32_on_device():
    # the compiled computation must carry an i32 dot (int8 x int8 -> int32
    # is the MXU fast path; an f32 accumulate would forfeit the 2x)
    x = jnp.ones((4, 16))
    w = jnp.ones((16, 8))
    hlo = jax.jit(lambda a, b: int8_matmul(a, b)).lower(x, w).as_text()
    assert "i32" in hlo and "i8" in hlo


# ------------------------------------------------------------- QuantDense

def test_quant_dense_params_interchange_with_nn_dense():
    """Identical param tree (names, shapes, dtypes) — a Dense checkpoint
    loads into QuantDense unchanged, and the outputs agree to quantization
    tolerance."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(6, 32)), jnp.float32)
    dense = nn.Dense(16)
    qdense = QuantDense(16)
    p = dense.init(jax.random.key(0), x)
    pq = qdense.init(jax.random.key(0), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)
    assert (jax.tree.map(lambda a: (a.shape, a.dtype), p)
            == jax.tree.map(lambda a: (a.shape, a.dtype), pq))
    y = np.asarray(dense.apply(p, x))
    yq = np.asarray(qdense.apply(p, x))  # Dense params, quantized forward
    assert np.abs(y - yq).max() / np.abs(y).max() < 0.02


def test_dense_cls_dispatch():
    assert dense_cls("none") is nn.Dense
    assert dense_cls("") is nn.Dense
    assert dense_cls(None) is nn.Dense
    assert dense_cls("int8") is QuantDense
    with pytest.raises(NotImplementedError, match="int4"):
        dense_cls("int4")


# ------------------------------------------------------------- ViT tower

def _tiny_vit(**kw):
    return VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                             depth=2, num_heads=2, **kw)


def test_vit_quant_param_tree_identical():
    # quant adds no parameters and renames none: checkpoints load
    # interchangeably between float and int8 towers
    imgs = jnp.zeros((1, 32, 32, 3))
    p0 = _tiny_vit().init(jax.random.key(0), imgs)
    p1 = _tiny_vit(quant="int8").init(jax.random.key(0), imgs)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_array_equal(
        np.asarray(jax.flatten_util.ravel_pytree(p0)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(p1)[0]))


def test_vit_quant_output_close_to_float():
    imgs = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    params = _tiny_vit().init(jax.random.key(0), imgs)
    y = np.asarray(_tiny_vit().apply(params, imgs), np.float64)
    yq = np.asarray(_tiny_vit(quant="int8").apply(params, imgs), np.float64)
    assert y.shape == yq.shape == (2, 17, 32)
    # per-token cosine similarity of the residual stream stays ~1
    cos = (y * yq).sum(-1) / (np.linalg.norm(y, axis=-1)
                              * np.linalg.norm(yq, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_vit_quant_composes_with_tome():
    # both opt-in inference transforms ride the same block; they compose
    imgs = jnp.asarray(np.random.default_rng(6).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    model = _tiny_vit(quant="int8", tome_r=2)
    params = model.init(jax.random.key(0), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (2, 17, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_model_quant_via_arch():
    model = tiny_clip(image_arch=(("quant", "int8"),))
    rng = np.random.default_rng(7)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 100, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(params, batch, deterministic=True)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    assert np.isfinite(np.asarray(img)).all()


# ------------------------------------------------------------- BERT tower

def test_bert_quant_param_tree_identical_and_close():
    from simseg_tpu.models.bert import build_bert

    ids = jnp.asarray(np.random.default_rng(8).integers(0, 128, (2, 10)),
                      jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    base = build_bert("bert_test")
    quant = build_bert("bert_test", arch={"quant": "int8"})
    p0 = base.init(jax.random.key(0), ids, mask)
    p1 = quant.init(jax.random.key(0), ids, mask)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_array_equal(
        np.asarray(jax.flatten_util.ravel_pytree(p0)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(p1)[0]))
    y = np.asarray(base.apply(p0, ids, mask), np.float64)
    yq = np.asarray(quant.apply(p0, ids, mask), np.float64)
    cos = (y * yq).sum(-1) / (np.linalg.norm(y, axis=-1)
                              * np.linalg.norm(yq, axis=-1))
    assert cos.min() > 0.995, cos.min()


def test_bert_quant_padding_isolation():
    """Per-token activation scales must keep padded positions from
    perturbing real ones: same real tokens, different pad garbage ->
    identical real-token hidden states."""
    from simseg_tpu.models.bert import build_bert

    model = build_bert("bert_test", arch={"quant": "int8"})
    rng = np.random.default_rng(9)
    ids_a = rng.integers(1, 128, (1, 10)).astype(np.int32)
    ids_b = ids_a.copy()
    ids_b[0, 6:] = rng.integers(1, 128, 4)  # different padding content
    mask = np.asarray([[1] * 6 + [0] * 4], np.int32)
    p = model.init(jax.random.key(0), jnp.asarray(ids_a), jnp.asarray(mask))
    ya = np.asarray(model.apply(p, jnp.asarray(ids_a), jnp.asarray(mask)))
    yb = np.asarray(model.apply(p, jnp.asarray(ids_b), jnp.asarray(mask)))
    np.testing.assert_array_equal(ya[:, :6], yb[:, :6])


# -------------------------------------------------- cached / static quant

def test_cache_quant_state_weights_identical_output():
    """The cached int8 weights are the same computation memoized: the
    forward with a populated 'quant' collection must be BIT-identical to
    the on-the-fly dynamic path."""
    from simseg_tpu.ops.quant import cache_quant_state

    imgs = jnp.asarray(np.random.default_rng(11).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    model = _tiny_vit(quant="int8")
    params = model.init(jax.random.key(0), imgs)
    assert "quant" not in params  # init must NOT create the derived cache
    y_dyn = np.asarray(model.apply(params, imgs))
    vs = cache_quant_state(model, params, [((imgs[:1],), {})])
    assert "quant" in vs
    # every block matmul cached: 4 dense layers x 2 blocks, 2 vars each
    leaves = jax.tree.leaves(vs["quant"])
    assert len(leaves) == 2 * 2 * 4
    y_cached = np.asarray(model.apply(vs, imgs))
    np.testing.assert_array_equal(y_dyn, y_cached)


def test_cache_quant_state_rebuilds_not_stale():
    """cache_quant_state drops any pre-existing collection and rebuilds
    from the CURRENT params (the cache is derived state)."""
    from simseg_tpu.ops.quant import cache_quant_state

    imgs = jnp.asarray(np.random.default_rng(12).normal(size=(1, 32, 32, 3)),
                       jnp.float32)
    model = _tiny_vit(quant="int8")
    p0 = model.init(jax.random.key(0), imgs)
    p1 = model.init(jax.random.key(1), imgs)
    vs0 = cache_quant_state(model, p0, [((imgs,), {})])
    # swap params under the stale cache, then rebuild
    stale = {**vs0, "params": p1["params"]}
    rebuilt = cache_quant_state(model, stale, [((imgs,), {})])
    want = cache_quant_state(model, p1, [((imgs,), {})])
    for a, b in zip(jax.tree.leaves(rebuilt["quant"]),
                    jax.tree.leaves(want["quant"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_static_requires_calibration():
    model = _tiny_vit(quant="int8_static")
    imgs = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.key(0), imgs)  # init itself must work
    with pytest.raises(RuntimeError, match="calibration"):
        model.apply(params, imgs)


def test_int8_static_close_to_float_after_calibration():
    from simseg_tpu.ops.quant import cache_quant_state

    rng = np.random.default_rng(13)
    imgs = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    calib = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    params = _tiny_vit().init(jax.random.key(0), imgs)
    model = _tiny_vit(quant="int8_static")
    vs = cache_quant_state(model, params, [((calib[:2],), {}),
                                           ((calib[2:],), {})])
    y = np.asarray(_tiny_vit().apply(params, imgs), np.float64)
    yq = np.asarray(model.apply(vs, imgs), np.float64)
    cos = (y * yq).sum(-1) / (np.linalg.norm(y, axis=-1)
                              * np.linalg.norm(yq, axis=-1))
    # static per-channel scales are cruder than dynamic per-token (0.995
    # above) on a tiny random tower; the production-quality gate is
    # tools/seg_parity.py --quant int8_static
    assert cos.min() > 0.97, cos.min()


def test_int8_static_exact_on_grid():
    """Static-scale pipeline is exact when activations sit on the
    calibrated grid and weights on the folded int8 grid."""
    from simseg_tpu.ops.quant import int8_matmul_static, quantize_colwise

    rng = np.random.default_rng(14)
    a = np.full((32,), 127 * 2.0 ** -5, np.float32)  # absmax per channel
    xi = rng.integers(-127, 128, (4, 32))
    x = (xi * 2.0 ** -5).astype(np.float32)
    # weight already on the folded grid: W = wi * d / (a/127)
    wi = rng.integers(-127, 128, (32, 24))
    wi[0, :] = 127
    d = 2.0 ** -8
    w_folded = (wi * d).astype(np.float32)          # = kernel * a/127
    wq, sw = quantize_colwise(jnp.asarray(w_folded))
    got = np.asarray(int8_matmul_static(
        jnp.asarray(x), jnp.asarray(127.0 / a), wq, sw))
    want = ((xi.astype(np.int64) @ wi.astype(np.int64)).astype(np.float64)
            * d).astype(np.float32)
    np.testing.assert_array_equal(got, want)


def test_dense_cls_static_dispatch():
    cls = dense_cls("int8_static")
    mod = cls(8)
    assert isinstance(mod, QuantDense) and mod.static_acts


# ------------------------------------------------------------ train guard

def test_runner_refuses_quant_training():
    """round() has zero gradient almost everywhere — a quantized tower
    would train silently to nothing, so the runner must refuse."""
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.core.runner import CLIPRunner
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "dist.bf16=false",
        "model.max_length=12",
        "transforms.input_size=32",
        "data.batch_size=8",
        "data.batch_size_train=4",
        "model.image_encoder.arch={'quant': 'int8'}",
    ], target=new_base_cfg())
    with pytest.raises(NotImplementedError, match="inference-only"):
        CLIPRunner(cfg, tiny_clip(image_arch=(("quant", "int8"),)),
                   {"train": [], "val": []})


def _linear_cfg(argv):
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.tasks.linear_prob.config import task_cfg_init_fn

    return update_cfg(task_cfg_init_fn, None, argv=[
        "dist.bf16=false",
        "transforms.input_size=32",
        "model.image_encoder.tag=vit_test",
        "model.classifier.num_classes=4",
    ] + argv, target=new_base_cfg())


def test_linear_probe_quantized_frozen_backbone():
    """The classic PTQ probe: frozen int8 backbone, trainable head. The
    arch knob must actually reach the tower (it was silently dropped
    before), and the head's gradient never differentiates through
    round(), so training is sound."""
    from simseg_tpu.models.linear_prob import (build_linear_prob_model,
                                               linear_prob_loss_fn)

    cfg = _linear_cfg(["model.image_encoder.arch={'quant': 'int8'}"])
    model = build_linear_prob_model(cfg)
    assert dict(model.image_arch)["quant"] == "int8"
    batch = {
        "image": jnp.asarray(
            np.random.default_rng(10).normal(size=(4, 32, 32, 3)),
            jnp.float32),
        "label": jnp.asarray([0, 1, 2, 3]),
    }
    params = model.init(jax.random.key(0), batch)
    grads = jax.grad(
        lambda p: linear_prob_loss_fn(model, p, batch)[0])(params)
    enc = jax.tree.leaves(grads["params"]["image_encoder"])
    assert all(np.allclose(np.asarray(g), 0.0) for g in enc)
    assert np.abs(
        np.asarray(grads["params"]["classifier"]["kernel"])).max() > 0


def test_linear_probe_refuses_trainable_quant():
    from simseg_tpu.models.linear_prob import build_linear_prob_model

    cfg = _linear_cfg(["model.image_encoder.arch={'quant': 'int8'}",
                       "model.image_encoder.trainable=True"])
    with pytest.raises(NotImplementedError, match="inference-only"):
        build_linear_prob_model(cfg)


def test_linear_probe_refuses_trainable_moe():
    from simseg_tpu.models.linear_prob import build_linear_prob_model

    cfg = _linear_cfg(["model.image_encoder.arch={'moe_experts': 4}",
                       "model.image_encoder.trainable=True"])
    with pytest.raises(NotImplementedError, match="MoE"):
        build_linear_prob_model(cfg)


def test_runner_refuses_quant_training_text_tower():
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.core.runner import CLIPRunner
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "dist.bf16=false",
        "model.max_length=12",
        "transforms.input_size=32",
        "data.batch_size=8",
        "data.batch_size_train=4",
        "model.text_encoder.arch={'quant': 'int8'}",
    ], target=new_base_cfg())
    with pytest.raises(NotImplementedError, match="text_encoder.*inference"):
        CLIPRunner(cfg, tiny_clip(text_arch=(("quant", "int8"),)),
                   {"train": [], "val": []})
