import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.models import CLIPModel, build_bert, build_vit
from simseg_tpu.ops.attention import multi_head_attention
from simseg_tpu.ops.pooling import avg_pool, l2_normalize, topk_pool


def tiny_clip(**over):
    kw = dict(
        image_tag="vit_test",
        img_size=32,
        text_tag="bert_test",
        projection_name="simple",
        projection_dim=16,
        pool_name="loda",
        image_k=3,
        text_k=1,
        temperature_name="parameter",
        temperature_init=0.02,
    )
    kw.update(over)
    return CLIPModel(**kw)


# ---------------------------------------------------------------- pooling

def _torch_style_topk(x, k, mask=None):
    """Reference semantics re-derived in numpy (pooling.py:42-65)."""
    x = np.array(x, dtype=np.float64)
    if mask is not None:
        x[np.array(mask) == 0] = -10000
        k = min(k, int(np.min(np.sum(np.array(mask) > 0, axis=1))))
    part = np.sort(x, axis=1)[:, ::-1][:, :k]  # top-k along token dim
    return part.mean(axis=1)


def test_topk_pool_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 7, 5)).astype(np.float32)
    got = np.asarray(topk_pool(jnp.asarray(x), 3))
    want = _torch_style_topk(x, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_topk_pool_mask_clamps_k():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 6, 4)).astype(np.float32)
    mask = np.ones((3, 6), dtype=np.int32)
    mask[0, 2:] = 0  # shortest valid length 2 < k=4 -> k clamped to 2
    got = np.asarray(topk_pool(jnp.asarray(x), 4, jnp.asarray(mask)))
    want = _torch_style_topk(x, 4, mask)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_avg_pool_masked():
    x = jnp.asarray(np.arange(24, dtype=np.float32).reshape(2, 3, 4))
    mask = jnp.asarray([[1, 1, 0], [1, 1, 1]])
    got = np.asarray(avg_pool(x, mask))
    np.testing.assert_allclose(got[0], np.asarray(x)[0, :2].mean(0), rtol=1e-6)
    np.testing.assert_allclose(got[1], np.asarray(x)[1].mean(0), rtol=1e-6)


def test_l2_normalize():
    x = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    y = np.asarray(l2_normalize(x))
    np.testing.assert_allclose(y[0], [0.6, 0.8], rtol=1e-6)
    assert np.all(np.isfinite(y[1]))  # eps-guarded


# ------------------------------------------------------------- attention

def test_attention_matches_numpy():
    rng = np.random.default_rng(2)
    b, t, h, hd = 2, 5, 2, 4
    d = h * hd
    q, k, v = (rng.normal(size=(b, t, d)).astype(np.float32) for _ in range(3))
    got = np.asarray(multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), h))

    qh = q.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(b, t, h, hd).transpose(0, 2, 1, 3)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(hd)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = (p @ vh).transpose(0, 2, 1, 3).reshape(b, t, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ towers

def test_vit_token_sequence_shape():
    model = build_vit("vit_test", img_size=32)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 1 + (32 // 8) ** 2, 32)


def test_bert_mask_blocks_padding_influence():
    model = build_bert("bert_test")
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, (2, 10)))
    mask = jnp.asarray(np.concatenate([np.ones((2, 6)), np.zeros((2, 4))], axis=1))
    params = model.init(jax.random.key(0), ids, mask)
    out1 = model.apply(params, ids, mask)
    ids2 = ids.at[:, 7].set((ids[:, 7] + 1) % 128)  # change a masked token
    out2 = model.apply(params, ids2, mask)
    np.testing.assert_allclose(
        np.asarray(out1[:, :6]), np.asarray(out2[:, :6]), rtol=1e-5, atol=1e-6
    )


# -------------------------------------------------------------------- CLIP

def test_clip_forward_all():
    model = tiny_clip()
    rng = np.random.default_rng(4)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (2, 12))),
        "attention_mask": jnp.asarray(np.ones((2, 12), dtype=np.int32)),
    }
    params = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(params, batch)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    # simple projection -> L2-normalized embeddings
    np.testing.assert_allclose(np.linalg.norm(np.asarray(img), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(txt), axis=-1), 1.0, rtol=1e-5)
    assert 0.001 <= float(temp) <= 0.5


def test_clip_temperature_clamp():
    model = tiny_clip(temperature_init=0.9)
    batch = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 4), dtype=jnp.int32),
        "attention_mask": jnp.ones((1, 4), dtype=jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    _, _, temp = model.apply(params, batch)
    assert float(temp) == pytest.approx(0.5)


def test_clip_identity_pool_uses_cls():
    model = tiny_clip(pool_name="identity")
    rng = np.random.default_rng(5)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (2, 8))),
        "attention_mask": jnp.ones((2, 8), dtype=jnp.int32),
    }
    params = model.init(jax.random.key(0), batch)
    feats = model.apply(params, batch, embeddings="image")
    assert feats.shape == (2, 32)  # CLS vector, not token sequence

    model2 = tiny_clip()
    params2 = model2.init(jax.random.key(0), batch)
    feats2 = model2.apply(params2, batch, embeddings="image")
    assert feats2.shape == (2, 16, 32)  # patch tokens


def test_topk_pool_static_k_clamp():
    """k larger than the static token count clamps to T (small patch grids
    under LoDA) instead of crashing lax.top_k; result equals the full mean."""
    from simseg_tpu.ops.pooling import avg_pool, topk_pool

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8)),
                    jnp.float32)
    got = topk_pool(x, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(avg_pool(x)),
                               rtol=1e-6)
    # masked variant under the same static clamp
    mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 1, 0]], jnp.int32)
    got_m = topk_pool(x, 5, attention_mask=mask)
    assert np.isfinite(np.asarray(got_m)).all()
