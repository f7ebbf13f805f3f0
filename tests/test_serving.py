"""Serving export (simseg_tpu/serving.py): a serialized artifact must
reproduce the live pipeline bit-for-bit and be callable without model code."""

import jax
import jax.numpy as jnp
import numpy as np

from simseg_tpu import serving
from tests.test_models import tiny_clip


def _model_and_params():
    model = tiny_clip()
    batch = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    return model, model.init(jax.random.key(0), batch)


def _seg_cfg():
    from simseg_tpu.utils.collections import AttrDict

    cfg = AttrDict()
    cfg.transforms = AttrDict()
    cfg.transforms.input_size = 32
    cfg.transforms.normalize = AttrDict(
        mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225])
    return cfg


def test_seg_artifact_roundtrip(tmp_path):
    model, params = _model_and_params()
    rng = np.random.default_rng(0)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    cfg = _seg_cfg()
    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank), cfg,
                                   num_classes=5, top_cls_num=3,
                                   patch_size=8)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)

    direct_pred, direct_conf = jax.jit(fn)(raw)

    data = serving.export_artifact(fn, (raw,))
    path = tmp_path / "seg.shlo"
    serving.save_artifact(str(path), data)
    loaded = serving.load_artifact(str(path))
    pred, conf = loaded(raw)

    np.testing.assert_array_equal(np.asarray(pred), np.asarray(direct_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(direct_conf),
                               rtol=1e-6)


def test_seg_artifact_matches_eval_pipeline(tmp_path):
    """The exported graph IS make_seg_predict: same pred as the eval tool's
    forward core on the same raw input."""
    from simseg_tpu.ops.pooling import l2_normalize
    from simseg_tpu.tasks.seg_eval import make_seg_predict

    model, params = _model_and_params()
    rng = np.random.default_rng(2)
    bank = l2_normalize(jnp.asarray(
        rng.normal(size=(5, 16)).astype(np.float32)))
    cfg = _seg_cfg()
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)

    predict = make_seg_predict(model, cfg, num_classes=5, top_cls_num=3,
                               patch_size=8)
    ref_pred, ref_conf = jax.jit(predict)(params, raw, bank)

    fn = serving.make_seg_infer_fn(model, params, bank, cfg,
                                   num_classes=5, top_cls_num=3,
                                   patch_size=8)
    data = serving.export_artifact(fn, (raw,))
    serving.save_artifact(str(tmp_path / "a.shlo"), data)
    pred, conf = serving.load_artifact(str(tmp_path / "a.shlo"))(raw)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-6)


def test_seg_artifact_honors_multiscale_cfg(tmp_path):
    """cfg.seg_eval.scales is baked into the export: a multi-scale artifact
    matches the multi-scale eval pipeline and differs from single-scale."""
    from simseg_tpu.utils.collections import AttrDict
    from simseg_tpu.ops.pooling import l2_normalize
    from simseg_tpu.tasks.seg_eval import make_seg_predict

    model, params = _model_and_params()
    rng = np.random.default_rng(3)
    bank = l2_normalize(jnp.asarray(
        rng.normal(size=(5, 16)).astype(np.float32)))
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)

    cfg = _seg_cfg()
    cfg.seg_eval = AttrDict(scales=[1.0, 0.5])
    predict = make_seg_predict(model, cfg, num_classes=5, top_cls_num=3,
                               patch_size=8)
    ref_conf = jax.jit(predict)(params, raw, bank)[1]

    fn = serving.make_seg_infer_fn(model, params, bank, cfg,
                                   num_classes=5, top_cls_num=3, patch_size=8)
    data = serving.export_artifact(fn, (raw,))
    serving.save_artifact(str(tmp_path / "ms.shlo"), data)
    conf = serving.load_artifact(str(tmp_path / "ms.shlo"))(raw)[1]
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-6)

    single = _seg_cfg()
    fn1 = serving.make_seg_infer_fn(model, params, bank, single,
                                    num_classes=5, top_cls_num=3,
                                    patch_size=8)
    conf1 = jax.jit(fn1)(raw)[1]
    assert not np.allclose(np.asarray(conf), np.asarray(conf1))


def test_embed_artifact_bakes_normalization(tmp_path):
    """kind=retrieval with a cfg: raw uint8 in, device-side normalization
    baked in — matches normalize + model forward."""
    from simseg_tpu.data.transforms import normalize_images

    model, params = _model_and_params()
    cfg = _seg_cfg()
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    ids = rng.integers(0, 128, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)

    mean = tuple(cfg.transforms.normalize.mean)
    std = tuple(cfg.transforms.normalize.std)
    ref_img, ref_txt = jax.jit(lambda p, r, i, m: model.apply(
        p, {"image": normalize_images(r, mean, std), "input_ids": i,
            "attention_mask": m}, deterministic=True)[:2])(
        params, raw, ids, mask)

    fn = serving.make_embed_fn(model, params, cfg)
    data = serving.export_artifact(fn, (raw, ids, mask))
    serving.save_artifact(str(tmp_path / "e.shlo"), data)
    img, txt = serving.load_artifact(str(tmp_path / "e.shlo"))(raw, ids, mask)
    # ref is a separately-jitted graph: allow f32 fusion-ordering noise
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(txt), np.asarray(ref_txt),
                               rtol=1e-5, atol=1e-6)


def test_separate_weights_artifact_matches_baked(tmp_path):
    """weights='separate': graph exported with weights as arguments +
    a .weights sidecar — same predictions as the baked artifact, and the
    graph file is much smaller than the weights."""
    model, params = _model_and_params()
    rng = np.random.default_rng(6)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    cfg = _seg_cfg()
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)

    baked = serving.make_seg_infer_fn(model, params, jnp.asarray(bank), cfg,
                                      num_classes=5, top_cls_num=3,
                                      patch_size=8)
    ref_pred, ref_conf = jax.jit(baked)(raw)

    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank), cfg,
                                   num_classes=5, top_cls_num=3,
                                   patch_size=8, bake_weights=False)
    path = str(tmp_path / "sep.shlo")
    serving.export_artifact_separate(fn, params, (raw,), path)
    assert (tmp_path / "sep.shlo.weights").exists()

    loaded = serving.load_artifact_separate(path)
    pred, conf = loaded(raw)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-5, atol=1e-6)


def test_image_patch_stride_standard_tags():
    """Regression: standard timm tags are regex-parsed, not in VIT_CONFIGS —
    the stride lookup must go through resolve_vit_config (16, not the CNN 32
    fallback)."""
    from types import SimpleNamespace

    from simseg_tpu.tasks.seg_eval import image_patch_stride

    assert image_patch_stride(SimpleNamespace(
        image_tag="vit_base_patch16_224_in21k", image_arch=None)) == 16
    assert image_patch_stride(SimpleNamespace(
        image_tag="vit_large_patch32_384", image_arch=None)) == 32
    assert image_patch_stride(SimpleNamespace(
        image_tag="vit_test", image_arch=None)) == 8
    assert image_patch_stride(SimpleNamespace(
        image_tag="resnet50", image_arch=None)) == 32


def test_embed_artifact_roundtrip(tmp_path):
    model, params = _model_and_params()
    rng = np.random.default_rng(1)
    images = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    ids = rng.integers(0, 128, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)

    fn = serving.make_embed_fn(model, params)
    direct_img, direct_txt = jax.jit(fn)(images, ids, mask)

    data = serving.export_artifact(fn, (images, ids, mask))
    path = tmp_path / "embed.shlo"
    serving.save_artifact(str(path), data)
    loaded = serving.load_artifact(str(path))
    img, txt = loaded(images, ids, mask)

    np.testing.assert_allclose(np.asarray(img), np.asarray(direct_img),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(txt), np.asarray(direct_txt),
                               rtol=1e-6)
    # weights are baked in: the artifact has exactly the data inputs
    assert img.shape == (4, 16) and txt.shape == (4, 16)


def test_seg_artifact_with_token_merging(tmp_path):
    """ToMe towers export/serve like any other (ops/tome.py is static-shaped
    dense algebra): artifact output is bit-identical to the live jit."""
    model = tiny_clip(image_arch=(("tome_r", 2),))
    batch = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    rng = np.random.default_rng(1)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank),
                                   _seg_cfg(), num_classes=5, top_cls_num=3,
                                   patch_size=8)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    direct_pred, direct_conf = jax.jit(fn)(raw)

    data = serving.export_artifact(fn, (raw,))
    path = tmp_path / "seg_tome.shlo"
    serving.save_artifact(str(path), data)
    pred, conf = serving.load_artifact(str(path))(raw)

    np.testing.assert_array_equal(np.asarray(pred), np.asarray(direct_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(direct_conf),
                               rtol=1e-6)


def test_seg_artifact_with_int8_quant(tmp_path):
    """Int8 PTQ towers (ops/quant.py) export/serve bit-identically to the
    live jit — and the baked artifact constant-folds the weight
    quantization, so the int8 kernels ship pre-quantized."""
    model = tiny_clip(image_arch=(("quant", "int8"),),
                      text_arch=(("quant", "int8"),))
    batch = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    rng = np.random.default_rng(2)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank),
                                   _seg_cfg(), num_classes=5, top_cls_num=3,
                                   patch_size=8)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    direct_pred, direct_conf = jax.jit(fn)(raw)

    data = serving.export_artifact(fn, (raw,))
    path = tmp_path / "seg_int8.shlo"
    serving.save_artifact(str(path), data)
    pred, conf = serving.load_artifact(str(path))(raw)

    np.testing.assert_array_equal(np.asarray(pred), np.asarray(direct_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(direct_conf),
                               rtol=1e-6)


def test_seg_artifact_multichip_data_parallel(tmp_path):
    """A single-program artifact served over an 8-device mesh: GSPMD
    batch-shards the inlined module; predictions are bit-identical to the
    single-device call and the outputs land sharded over the mesh."""
    from simseg_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    rng = np.random.default_rng(7)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank),
                                   _seg_cfg(), num_classes=5, top_cls_num=3,
                                   patch_size=8)
    raw = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    path = tmp_path / "seg_mc.shlo"
    serving.save_artifact(str(path), serving.export_artifact(fn, (raw,)))

    ref_pred, ref_conf = serving.load_artifact(str(path))(raw)

    mesh = make_mesh()
    pred, conf = serving.load_artifact(str(path), mesh=mesh)(raw)
    assert len(pred.sharding.device_set) == mesh.size
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(ref_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(ref_conf),
                               rtol=1e-6)


def test_separate_weights_artifact_multichip(tmp_path):
    """Separate-weights layout over a mesh: the weight pytree is replicated,
    the data arguments batch-sharded; embeddings match the single-device
    serve (to float tolerance — XLA may tile reductions differently at the
    per-shard shape, so bitwise equality across device counts is not a
    guarantee for float outputs)."""
    from simseg_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    cfg = _seg_cfg()
    fn = serving.make_embed_fn(model, params, cfg, bake_weights=False)
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8).astype(
        np.float32) / 255.0
    ids = rng.integers(0, 30, (8, 12)).astype(np.int32)
    mask = np.ones((8, 12), np.int32)
    path = str(tmp_path / "emb_mc.shlo")
    serving.export_artifact_separate(fn, params, (raw, ids, mask), path)

    ref_img, ref_txt = serving.load_artifact_separate(path)(raw, ids, mask)

    mesh = make_mesh()
    img, txt = serving.load_artifact_separate(path, mesh=mesh)(raw, ids, mask)
    assert len(img.sharding.device_set) == mesh.size
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref_img),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(txt), np.asarray(ref_txt),
                               rtol=1e-5, atol=1e-6)


def test_multichip_serve_rejects_indivisible_batch(tmp_path):
    """Loading over a mesh the artifact's batch cannot split across raises
    up front with an actionable message, not mid-call."""
    import pytest

    from simseg_tpu.parallel.mesh import make_mesh

    model, params = _model_and_params()
    rng = np.random.default_rng(5)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    fn = serving.make_seg_infer_fn(model, params, jnp.asarray(bank),
                                   _seg_cfg(), num_classes=5, top_cls_num=3,
                                   patch_size=8)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    path = str(tmp_path / "seg_bad.shlo")
    serving.save_artifact(path, serving.export_artifact(fn, (raw,)))

    with pytest.raises(ValueError, match="batch-sharded"):
        serving.load_artifact(path, mesh=make_mesh())


def test_seg_artifact_int8_static_composed_headline(tmp_path):
    """The CERTIFIED headline configuration — ToMe + int8_static with the
    calibrated ``'quant'`` collection (cached int8 weights, folded static
    activation scales) — must bake into an artifact bit-identical to the
    live pipeline, and the export must refuse uncalibrated variables
    loudly (round-4 verdict #3: the one configuration bench.py sells was
    never proven exportable)."""
    import pytest

    from simseg_tpu.ops.quant import cache_quant_state

    model = tiny_clip(image_arch=(("tome_r", 2), ("quant", "int8_static")))
    batch = {
        "image": jnp.zeros((1, 32, 32, 3), jnp.float32),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    rng = np.random.default_rng(3)
    bank = rng.normal(size=(5, 16)).astype(np.float32)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    cfg = _seg_cfg()

    # uncalibrated int8_static must refuse to stage (no silent fallback)
    fn_uncal = serving.make_seg_infer_fn(model, params, jnp.asarray(bank),
                                         cfg, num_classes=5, top_cls_num=3,
                                         patch_size=8)
    with pytest.raises(RuntimeError, match="cache_quant_state"):
        serving.export_artifact(fn_uncal, (raw,))

    # calibrate on two representative batches (running absmax), then export
    calib = [
        ((jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),),
         {"method": lambda m, im: m.forward_image_tokens(im)})
        for _ in range(2)
    ]
    variables = cache_quant_state(model, params, calib)
    assert "quant" in variables  # calibrated scales + cached int8 weights

    fn = serving.make_seg_infer_fn(model, variables, jnp.asarray(bank), cfg,
                                   num_classes=5, top_cls_num=3,
                                   patch_size=8)
    direct_pred, direct_conf = jax.jit(fn)(raw)

    data = serving.export_artifact(fn, (raw,))
    path = tmp_path / "seg_tome_int8s.shlo"
    serving.save_artifact(str(path), data)
    pred, conf = serving.load_artifact(str(path))(raw)

    np.testing.assert_array_equal(np.asarray(pred), np.asarray(direct_pred))
    np.testing.assert_allclose(np.asarray(conf), np.asarray(direct_conf),
                               rtol=1e-6)
