"""Token merging (ops/tome.py + the ViT tome_r path).

The merge semantics are checked against an independent per-image numpy
rederivation of ToMe's bipartite soft matching (keys metric, CLS
protected, size-weighted means, order-preserving compaction)."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.models.clip import CLIPModel
from simseg_tpu.models.vit import VisionTransformer
from simseg_tpu.ops.tome import (bipartite_merge, merge_counts, size_bias,
                                 unmerge, update_gather_map)


def numpy_bipartite_merge(x, sizes, metric, r, protect=1):
    """Straight-line per-image rederivation of the same algorithm."""
    B, T, _ = x.shape
    na = (T + 1) // 2
    r = min(r, na - protect)
    t_new = T - r
    xs, ss, maps = [], [], []
    for i in range(B):
        m = metric[i] / (np.linalg.norm(metric[i], axis=-1, keepdims=True)
                         + 1e-6)
        scores = m[0::2] @ m[1::2].T
        scores[:protect] = -np.inf
        node_max, node_dst = scores.max(1), scores.argmax(1)
        src = np.argsort(-node_max, kind="stable")[:r]  # merged A rows
        a_old = np.arange(0, T, 2)
        b_old = np.arange(1, T, 2)
        merged_old = set(a_old[src].tolist())
        kept = [t for t in range(T) if t not in merged_old]
        new_of_old_kept = {t: j for j, t in enumerate(kept)}
        old2new = np.zeros(T, np.int32)
        for t in range(T):
            if t in merged_old:
                ai = t // 2
                old2new[t] = new_of_old_kept[b_old[node_dst[ai]]]
            else:
                old2new[t] = new_of_old_kept[t]
        x_new = np.zeros((t_new, x.shape[-1]), np.float64)
        s_new = np.zeros(t_new, np.float64)
        for t in range(T):
            x_new[old2new[t]] += sizes[i, t] * x[i, t]
            s_new[old2new[t]] += sizes[i, t]
        xs.append(x_new / s_new[:, None])
        ss.append(s_new)
        maps.append(old2new)
    return np.stack(xs), np.stack(ss), np.stack(maps)


@pytest.fixture
def rand_tokens():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 13, 8)).astype(np.float32)
    metric = rng.normal(size=(3, 13, 4)).astype(np.float32)
    sizes = rng.uniform(1.0, 3.0, size=(3, 13)).astype(np.float32)
    return x, sizes, metric


def test_merge_matches_numpy_rederivation(rand_tokens):
    x, sizes, metric = rand_tokens
    got_x, got_s, got_map = bipartite_merge(
        jnp.asarray(x), jnp.asarray(sizes), jnp.asarray(metric), r=3)
    want_x, want_s, want_map = numpy_bipartite_merge(x, sizes, metric, r=3)
    np.testing.assert_array_equal(np.asarray(got_map), want_map)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=1e-5,
                               atol=1e-6)


def test_merge_conserves_size_mass_and_protects_cls(rand_tokens):
    x, sizes, metric = rand_tokens
    got_x, got_s, got_map = bipartite_merge(
        jnp.asarray(x), jnp.asarray(sizes), jnp.asarray(metric), r=4)
    # total token mass is redistributed, never lost
    np.testing.assert_allclose(np.asarray(got_s).sum(axis=1),
                               sizes.sum(axis=1), rtol=1e-6)
    # CLS (index 0) keeps its slot and its feature row bit-for-bit:
    # never a source (protected) and never a destination (A-side)
    assert np.all(np.asarray(got_map)[:, 0] == 0)
    np.testing.assert_array_equal(np.asarray(got_x)[:, 0], x[:, 0])


def test_merge_r0_and_clamp():
    x = jnp.ones((1, 5, 4))
    s = jnp.ones((1, 5))
    m = jnp.ones((1, 5, 2))
    ox, os_, omap = bipartite_merge(x, s, m, r=0)
    assert omap is None and ox is x and os_ is s
    # r larger than the mergeable A-side count is clamped: na=3, CLS
    # protected -> at most 2 merges
    assert merge_counts(5, 99) == 2
    ox, _, omap = bipartite_merge(x, s, m, r=99)
    assert ox.shape == (1, 3, 4) and omap is not None


def test_gather_map_composition_and_unmerge(rand_tokens):
    x, sizes, metric = rand_tokens
    b, t, _ = x.shape
    gmap = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t))
    x1, s1, m1 = bipartite_merge(jnp.asarray(x), jnp.asarray(sizes),
                                 jnp.asarray(metric), r=3)
    gmap = update_gather_map(gmap, m1)
    x2, s2, m2 = bipartite_merge(x1, s1, x1, r=2)
    gmap = update_gather_map(gmap, m2)
    out = unmerge(x2, gmap)
    assert out.shape == (b, t, x.shape[-1])
    # every original position points at the row its token was folded into
    two_hop = np.asarray(jnp.take_along_axis(m2, m1, axis=1))
    np.testing.assert_array_equal(np.asarray(gmap), two_hop)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(x2)[np.arange(b)[:, None], two_hop])


def test_size_bias_shape():
    s = jnp.asarray([[1.0, 2.0, 4.0]])
    bias = size_bias(s, jnp.float32)
    assert bias.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(np.asarray(bias)[0, 0, 0],
                               np.log([1.0, 2.0, 4.0]), rtol=1e-6)


def _tiny_vit(tome_r=0, **kw):
    return VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                             depth=2, num_heads=2, tome_r=tome_r, **kw)


def test_vit_tome_output_contract():
    model = _tiny_vit(tome_r=2)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    params = model.init(jax.random.key(0), imgs)
    out = model.apply(params, imgs)
    # public contract unchanged: full (B, 1+N, D), finite
    assert out.shape == (2, 17, 32)
    assert np.isfinite(np.asarray(out)).all()
    # internally 2 blocks x r=2 merges happened: at most 17-4 unique rows
    for i in range(2):
        assert len(np.unique(np.asarray(out)[i], axis=0)) <= 13


def test_vit_tome_param_tree_identical():
    # tome adds no parameters: checkpoints load interchangeably
    imgs = jnp.zeros((1, 32, 32, 3))
    p0 = _tiny_vit(tome_r=0).init(jax.random.key(0), imgs)
    p1 = _tiny_vit(tome_r=2).init(jax.random.key(0), imgs)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    np.testing.assert_array_equal(
        np.asarray(jax.flatten_util.ravel_pytree(p0)[0]),
        np.asarray(jax.flatten_util.ravel_pytree(p1)[0]))


def test_vit_tome_grads_finite():
    model = _tiny_vit(tome_r=2)
    imgs = jnp.asarray(np.random.default_rng(2).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    params = model.init(jax.random.key(0), imgs)

    def loss(p):
        return jnp.mean(model.apply(p, imgs) ** 2)

    g = jax.jit(jax.grad(loss))(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert np.isfinite(np.asarray(flat)).all()
    assert float(jnp.abs(flat).sum()) > 0


def test_vit_tome_remat_matches():
    imgs = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    base = _tiny_vit(tome_r=2)
    params = base.init(jax.random.key(0), imgs)
    rematted = _tiny_vit(tome_r=2, remat=True)
    np.testing.assert_allclose(np.asarray(base.apply(params, imgs)),
                               np.asarray(rematted.apply(params, imgs)),
                               rtol=1e-6, atol=1e-6)


def test_clip_model_tome_via_arch():
    model = CLIPModel(
        image_tag="vit_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="loda",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02, image_arch=(("tome_r", 2),),
    )
    rng = np.random.default_rng(4)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 100, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(params, batch, deterministic=True)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    assert np.isfinite(np.asarray(img)).all()


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["tp", "fsdp"])
def test_tome_train_step_composes_with_sharded_towers(mode):
    """A ToMe tower trained under tp=2 / FSDP sharding matches plain DP
    numerics (backs the PARITY.md composition claim; pp refuses tome_r).

    Merge choices ride argmax/top_k over key similarities, so this also
    guards against sharded-execution reduction orderings flipping the
    matching itself."""
    from simseg_tpu.core.optim import build_optimizer
    from simseg_tpu.engine import TrainState, make_train_step
    from simseg_tpu.parallel import make_mesh, shard_batch
    from tests.test_models import tiny_clip
    from tests.test_train_step import _batch, _cfg
    from simseg_tpu.utils.collections import AttrDict

    model = tiny_clip(image_arch=(("tome_r", 2),))
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)

    dp_mesh = make_mesh()
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False)
    b1 = shard_batch(batch, dp_mesh)

    mesh = make_mesh(tp_size=2) if mode == "tp" else make_mesh()
    tx2, set_lr2 = build_optimizer(cfg, params)
    s2 = TrainState.create(params, tx2)
    kw = dict(fsdp=True, fsdp_min_size=64) if mode == "fsdp" else {}
    factory = make_train_step(model, tx2, set_lr2, mesh=mesh, donate=False,
                              **kw)
    step2, s2 = factory(s2)
    b2 = shard_batch(batch, mesh)

    for _ in range(3):
        s1, m1 = step1(s1, b1, None, 1e-3)
        s2, m2 = step2(s2, b2, None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


def test_vit_tome_schedule_matches_uniform_r():
    """A schedule equal to the uniform plan is the SAME computation
    (bit-identical outputs) — the schedule only regroups merges."""
    imgs = jnp.asarray(np.random.default_rng(5).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    uniform = _tiny_vit(tome_r=2)
    params = uniform.init(jax.random.key(0), imgs)
    scheduled = _tiny_vit(tome_r=0, tome_schedule=(2, 2))
    np.testing.assert_array_equal(np.asarray(uniform.apply(params, imgs)),
                                  np.asarray(scheduled.apply(params, imgs)))


def test_vit_tome_schedule_fewer_larger_merges():
    """Front-loaded schedule: same total merged count, fewer distinct
    shapes; output contract and gradients intact."""
    imgs = jnp.asarray(np.random.default_rng(6).normal(size=(2, 32, 32, 3)),
                       jnp.float32)
    model = _tiny_vit(tome_r=0, tome_schedule=(4, 0))
    params = model.init(jax.random.key(0), imgs)
    out = model.apply(params, imgs)
    assert out.shape == (2, 17, 32)
    assert np.isfinite(np.asarray(out)).all()
    # 4 merges happened: at most 13 unique rows per image
    for i in range(2):
        assert len(np.unique(np.asarray(out)[i], axis=0)) <= 13

    def loss(p):
        return jnp.mean(model.apply(p, imgs) ** 2)

    flat, _ = jax.flatten_util.ravel_pytree(jax.jit(jax.grad(loss))(params))
    assert np.isfinite(np.asarray(flat)).all()


def test_vit_tome_schedule_validation():
    imgs = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="depth-2"):
        _tiny_vit(tome_schedule=(2, 2, 2)).init(jax.random.key(0), imgs)
    with pytest.raises(ValueError, match=">= 0"):
        _tiny_vit(tome_schedule=(2, -1)).init(jax.random.key(0), imgs)


def test_clip_model_tome_schedule_via_arch():
    model = CLIPModel(
        image_tag="vit_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="loda",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02, image_arch=(("tome_schedule", (4, 0)),),
    )
    rng = np.random.default_rng(7)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(0, 100, (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(params, batch, deterministic=True)
    assert img.shape == (2, 16) and np.isfinite(np.asarray(img)).all()


def test_pp_refuses_tome_schedule():
    from simseg_tpu.parallel.pp import _refuse_heterogeneous_tower

    model = CLIPModel(
        image_tag="vit_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="loda",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02, image_arch=(("tome_schedule", (4, 0)),),
    )
    with pytest.raises(NotImplementedError, match="token merging"):
        _refuse_heterogeneous_tower(model)
