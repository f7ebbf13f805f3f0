"""VMEM-resident attention kernel (ops/flash_attention.py) vs the einsum
path, in interpreter mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.ops.attention import multi_head_attention
from simseg_tpu.ops.flash_attention import flash_supported


def _qkv(b=2, t=325, d=192, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32),
                    dtype=jnp.bfloat16)
        for _ in range(3)
    )


def test_forward_matches_einsum():
    q, k, v = _qkv()
    ref = multi_head_attention(q, k, v, 3, dtype=jnp.bfloat16,
                               use_flash="never").astype(jnp.float32)
    out = multi_head_attention(q, k, v, 3, dtype=jnp.bfloat16,
                               use_flash="interpret").astype(jnp.float32)
    # kernel softmax normalizes in f32 (einsum path divides in bf16):
    # agreement to 1-2 bf16 ulps
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_gradients_match_einsum():
    q, k, v = _qkv(t=256)

    def loss(path, q, k, v):
        o = multi_head_attention(q, k, v, 3, dtype=jnp.bfloat16,
                                 use_flash=path).astype(jnp.float32)
        return jnp.sum(o * o)

    g_ref = jax.grad(lambda *a: loss("never", *a), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(lambda *a: loss("interpret", *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_out):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def test_train_bwd_kernel_matches_einsum_vjp():
    """flash_mha_train's fused Pallas backward reproduces the einsum-path
    VJP: exact in f32 (reduction-order noise only), bf16-ulp level in
    bf16."""
    from simseg_tpu.ops.flash_attention import _reference_mha, flash_mha_train

    rng = np.random.default_rng(0)
    b, t, h, hd = 2, 24, 3, 64
    for dt, atol in ((jnp.float32, 1e-4), (jnp.bfloat16, 0.25)):
        q, k, v, g = (
            jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32),
                        dtype=dt)
            for _ in range(4)
        )

        def f_ref(q, k, v):
            return jnp.sum(_reference_mha(q, k, v).astype(jnp.float32)
                           * g.astype(jnp.float32))

        def f_ker(q, k, v):
            return jnp.sum(flash_mha_train(q, k, v, True)
                           .astype(jnp.float32) * g.astype(jnp.float32))

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        g_ker = jax.grad(f_ker, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ref, g_ker):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                atol=atol, rtol=0.02,
            )


def test_train_supported_gating():
    """flash_train_supported: measured fwd+bwd economics (v5e) — only the
    long-T band wins end-to-end; mid T loses to XLA fusion (see gate)."""
    from simseg_tpu.ops.flash_attention import flash_train_supported

    bf16, f32 = jnp.bfloat16, jnp.float32
    assert flash_train_supported(8, 12, 1297, 1297, 64, bf16, None)  # long T
    assert flash_train_supported(64, 12, 1024, 1024, 64, bf16, None)
    # mid T: standalone win but full-step LOSS (fusion break) — einsum owns it
    assert not flash_train_supported(32, 12, 325, 325, 64, bf16, None)
    assert not flash_train_supported(32, 12, 128, 128, 64, bf16, None)  # tiny T
    assert not flash_train_supported(8, 12, 2048, 2048, 64, bf16, None)  # VMEM cap
    assert not flash_train_supported(8, 12, 1297, 1297, 64, f32, None)  # parity lane
    assert not flash_train_supported(8, 12, 1297, 1297, 64, bf16, 0.0)  # biased
    assert not flash_train_supported(8, 12, 1297, 1024, 64, bf16, None)  # cross
    assert not flash_train_supported(8, 12, 1297, 1297, 48, bf16, None)  # lanes


def test_train_routing_grads_flow():
    """multi_head_attention(training=True) differentiates through the
    platform_dependent routing; on CPU it statically resolves to the einsum
    branch and grads equal the training=False path bit-for-bit."""
    from simseg_tpu.ops.attention import multi_head_attention

    rng = np.random.default_rng(3)
    b, t, h, hd = 1, 1024, 2, 64  # inside the flash_train_supported band
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, t, h * hd)).astype(np.float32),
                    dtype=jnp.bfloat16)
        for _ in range(3)
    )

    def loss(train):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, h, dtype=jnp.bfloat16,
                                       training=train)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    g0 = jax.jit(jax.grad(loss(False), argnums=(0, 1, 2)))(q, k, v)
    g1 = jax.jit(jax.grad(loss(True), argnums=(0, 1, 2)))(q, k, v)
    for a, b_ in zip(g0, g1):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b_, np.float32))


def test_stream_fwd_matches_einsum():
    """Streaming (online-softmax) forward equals the einsum path, including
    the ragged-T padding path (T=300 with tile=128 -> padded to 384)."""
    from simseg_tpu.ops.flash_attention import _mha_stream_fwd, _reference_mha

    rng = np.random.default_rng(0)
    b, t, h, hd = 1, 300, 2, 64
    for dt, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.08)):
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32),
                        dtype=dt)
            for _ in range(3)
        )
        ref = _reference_mha(q, k, v).astype(jnp.float32)
        out, lse = _mha_stream_fwd(q, k, v, interpret=True, tile=128)
        assert out.shape == (b, t, h, hd)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref), atol=atol, rtol=0.02)
        # the saved per-row logsumexp (compact (B*H, 1, Tq_pad) layout)
        # matches an f32 einsum rederivation
        assert lse.shape == (b * h, 1, 384)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        ref_lse = np.asarray(
            jax.nn.logsumexp(s, axis=-1).reshape(b * h, t))
        np.testing.assert_allclose(np.asarray(lse[:, 0, :t]), ref_lse,
                                   atol=1e-4, rtol=1e-5)
        # inference path: no lse computed at all
        out2, no_lse = _mha_stream_fwd(q, k, v, interpret=True, tile=128,
                                       need_lse=False)
        assert no_lse is None
        np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_stream_grads_match_einsum_vjp():
    """flash_mha_stream's two-kernel FlashAttention-2-style backward
    reproduces the einsum-path VJP through the padding path."""
    from simseg_tpu.ops.flash_attention import _reference_mha, flash_mha_stream

    rng = np.random.default_rng(1)
    b, t, h, hd = 1, 300, 2, 64
    for dt, atol in ((jnp.float32, 5e-4), (jnp.bfloat16, 0.3)):
        q, k, v, g = (
            jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32),
                        dtype=dt)
            for _ in range(4)
        )

        def f_ref(q, k, v):
            return jnp.sum(_reference_mha(q, k, v).astype(jnp.float32)
                           * g.astype(jnp.float32))

        def f_st(q, k, v):
            return jnp.sum(flash_mha_stream(q, k, v, True, 128)
                           .astype(jnp.float32) * g.astype(jnp.float32))

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        g_st = jax.grad(f_st, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ref, g_st):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                atol=atol, rtol=0.02,
            )


def test_rowblock_fwd_matches_einsum():
    """Row-block (q-tiled, whole-k) forward equals the einsum path,
    including the q-padding path (T=300 padded to the 512 tile; T=700
    exercises two q tiles)."""
    from simseg_tpu.ops.flash_attention import (_mha_rowblock_fwd,
                                                _reference_mha)

    rng = np.random.default_rng(5)
    for t in (300, 700):
        b, h, hd = 1, 2, 64
        for dt, atol in ((jnp.float32, 2e-5), (jnp.bfloat16, 0.08)):
            q, k, v = (
                jnp.asarray(
                    rng.normal(size=(b, t, h, hd)).astype(np.float32),
                    dtype=dt)
                for _ in range(3)
            )
            ref = _reference_mha(q, k, v).astype(jnp.float32)
            out, lse = _mha_rowblock_fwd(q, k, v, interpret=True)
            assert out.shape == (b, t, h, hd)
            np.testing.assert_allclose(np.asarray(out, np.float32),
                                       np.asarray(ref), atol=atol,
                                       rtol=0.02)
            s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                           preferred_element_type=jnp.float32)
            ref_lse = np.asarray(
                jax.nn.logsumexp(s, axis=-1).reshape(b * h, t))
            np.testing.assert_allclose(np.asarray(lse[:, 0, :t]), ref_lse,
                                       atol=1e-4, rtol=1e-5)
            out2, no_lse = _mha_rowblock_fwd(q, k, v, interpret=True,
                                             need_lse=False)
            assert no_lse is None
            np.testing.assert_array_equal(np.asarray(out2), np.asarray(out))


def test_rowblock_grads_match_einsum_vjp():
    """flash_mha_rowblock's split backward reproduces the einsum-path VJP
    through the q-padding path."""
    from simseg_tpu.ops.flash_attention import (_reference_mha,
                                                flash_mha_rowblock)

    rng = np.random.default_rng(6)
    b, t, h, hd = 1, 300, 2, 64
    for dt, atol in ((jnp.float32, 5e-4), (jnp.bfloat16, 0.3)):
        q, k, v, g = (
            jnp.asarray(rng.normal(size=(b, t, h, hd)).astype(np.float32),
                        dtype=dt)
            for _ in range(4)
        )

        def f_ref(q, k, v):
            return jnp.sum(_reference_mha(q, k, v).astype(jnp.float32)
                           * g.astype(jnp.float32))

        def f_rb(q, k, v):
            return jnp.sum(flash_mha_rowblock(q, k, v, True)
                           .astype(jnp.float32) * g.astype(jnp.float32))

        g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        g_rb = jax.grad(f_rb, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g_ref, g_rb):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                atol=atol, rtol=0.02,
            )


def test_rowblock_routing_grads_flow():
    """multi_head_attention at T past the whole-T ceiling differentiates
    through the platform_dependent row-block routing (tracing visits the
    custom_vjp even when CPU lowering resolves to einsum); on CPU grads
    equal the use_flash='never' einsum path bit-for-bit."""
    from simseg_tpu.ops.attention import multi_head_attention
    from simseg_tpu.ops.flash_attention import _ROWBLOCK_MIN_INFER

    rng = np.random.default_rng(4)
    # above the inference crossover so 'auto' routes the row-block branch
    # in BOTH modes; training=True additionally covers the
    # training-floor entry
    b, t, h, hd = 1, _ROWBLOCK_MIN_INFER + 48, 1, 64
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, t, h * hd)).astype(np.float32),
                    dtype=jnp.bfloat16)
        for _ in range(3)
    )

    def loss(mode, training):
        def f(q, k, v):
            out = multi_head_attention(q, k, v, h, dtype=jnp.bfloat16,
                                       use_flash=mode, training=training)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    for training in (False, True):
        g0 = jax.jit(jax.grad(loss("never", training),
                              argnums=(0, 1, 2)))(q, k, v)
        g1 = jax.jit(jax.grad(loss("auto", training),
                              argnums=(0, 1, 2)))(q, k, v)
        for a, b_ in zip(g0, g1):
            np.testing.assert_array_equal(np.asarray(a, np.float32),
                                          np.asarray(b_, np.float32))


def test_long_t_gating():
    """The three long-T gates tile the axis exactly once: whole-T resident
    up to _MAX_T, row-block to _ROWBLOCK_MAX_T, streaming beyond; same
    bias/dtype/lane constraints everywhere; self-attention only."""
    from simseg_tpu.ops.flash_attention import (_MAX_T, _ROWBLOCK_MAX_T,
                                                flash_rowblock_supported,
                                                flash_stream_supported,
                                                flash_supported)

    from simseg_tpu.ops.flash_attention import _ROWBLOCK_MIN_INFER

    bf16, f32 = jnp.bfloat16, jnp.float32
    # the row-block band
    assert flash_rowblock_supported(2048, 2048, 64, bf16, None)
    assert flash_rowblock_supported(4096, 4096, 128, bf16, None)
    assert not flash_stream_supported(2048, 2048, 64, bf16, None)
    # measured einsum window just past the whole-T ceiling: inference stays
    # einsum until the crossover, but a differentiated region enters the
    # row-block kernel right away (memory + measured parity)
    assert not flash_rowblock_supported(1601, 1601, 64, bf16, None)
    assert flash_rowblock_supported(1601, 1601, 64, bf16, None,
                                    training=True)
    assert flash_rowblock_supported(_ROWBLOCK_MIN_INFER + 1,
                                    _ROWBLOCK_MIN_INFER + 1, 64, bf16, None)
    # the streaming tail
    assert flash_stream_supported(4097, 4097, 64, bf16, None)
    assert flash_stream_supported(8192, 8192, 128, bf16, None)
    assert not flash_rowblock_supported(4097, 4097, 64, bf16, None,
                                        training=True)
    # inside the whole-T band the resident kernel owns it
    assert not flash_rowblock_supported(1297, 1297, 64, bf16, None,
                                        training=True)
    assert flash_supported(1297, 1297, 64, bf16, None)
    # band edges: no T is ever claimed by two kernels, and away from the
    # inference einsum window exactly one claims it
    for t in (_MAX_T, _MAX_T + 1, _ROWBLOCK_MIN_INFER,
              _ROWBLOCK_MIN_INFER + 1, _ROWBLOCK_MAX_T,
              _ROWBLOCK_MAX_T + 1):
        for training in (False, True):
            claims = [flash_supported(t, t, 64, bf16, None),
                      flash_rowblock_supported(t, t, 64, bf16, None,
                                               training),
                      flash_stream_supported(t, t, 64, bf16, None)]
            assert sum(claims) <= 1, (t, training, claims)
            in_einsum_window = (not training
                                and _MAX_T < t <= _ROWBLOCK_MIN_INFER)
            assert sum(claims) == (0 if in_einsum_window else 1), (
                t, training, claims)
    # shared constraints
    for gate in (flash_rowblock_supported, flash_stream_supported):
        t = 2048 if gate is flash_rowblock_supported else 8192
        assert not gate(t, t, 64, f32, None)
        assert not gate(t, t, 64, bf16, 0.0)
        assert not gate(t, t // 2, 64, bf16, None)
        assert not gate(t, t, 48, bf16, None)


def test_supported_gating():
    bf16, f32 = jnp.bfloat16, jnp.float32
    # the gate is purely static (shape/dtype); TPU-vs-other routing happens
    # per lowering platform at the call site (lax.platform_dependent)
    assert not flash_supported(1297, 1297, 64, f32, None)  # f32 parity lane
    assert not flash_supported(25, 25, 64, bf16, None)  # too short (BERT)
    assert not flash_supported(325, 325, 64, bf16, None)  # einsum wins here
    assert not flash_supported(1297, 1297, 48, bf16, None)  # lane-misaligned
    assert not flash_supported(1297, 1297, 64, bf16, jnp.zeros((1, 1, 1, 1297)))
    assert not flash_supported(4096, 4096, 64, bf16, None)  # > VMEM tile
    assert flash_supported(1297, 1297, 64, bf16, None)  # the seg 576px case


def test_platform_routing_on_cpu():
    """A kernel-eligible shape on a CPU lowering resolves to the einsum
    branch of lax.platform_dependent (no Pallas TPU lowering attempted) and
    matches use_flash='never' exactly."""
    q, k, v = _qkv(b=1, t=1024, d=128)
    assert flash_supported(1024, 1024, 64, jnp.bfloat16, None)
    ref = multi_head_attention(q, k, v, 2, dtype=jnp.bfloat16,
                               use_flash="never")
    out = jax.jit(
        lambda a, b, c: multi_head_attention(a, b, c, 2, dtype=jnp.bfloat16,
                                             use_flash="auto")
    )(q, k, v)
    # same einsum code; staging inside the cond branch changes fusion
    # context -> 1-ulp bf16 rounding on <1% of elements
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=1e-2, rtol=1e-2)


def test_platform_routing_differentiable():
    """Gradients flow through the platform_dependent routing (train path
    safety — cond branches with a custom_vjp inside)."""
    q, k, v = _qkv(b=1, t=1024, d=64)

    def loss(q, k, v):
        o = multi_head_attention(q, k, v, 1, dtype=jnp.bfloat16,
                                 use_flash="auto").astype(jnp.float32)
        return jnp.sum(o * o)

    g_auto = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda a, b, c: jnp.sum(
            multi_head_attention(a, b, c, 1, dtype=jnp.bfloat16,
                                 use_flash="never").astype(jnp.float32) ** 2)
    , argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_auto, g_ref):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-2, rtol=5e-2)


def test_vit_block_equivalence_through_kernel():
    """A whole ViT forward agrees between the two attention lowerings."""
    from simseg_tpu.models.vit import build_vit
    import simseg_tpu.models.vit as vitmod

    model = build_vit("vit_test", 64, dtype=jnp.bfloat16)  # T = 64+1 -> short
    # vit_test @64px gives T=65 (< flash threshold); use a bigger grid so
    # the kernel gate would trigger on TPU. Here we force interpret mode by
    # patching the call site.
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.key(0), imgs)
    ref = model.apply(params, imgs).astype(jnp.float32)

    orig = vitmod.multi_head_attention

    def patched(q, k, v, h, attention_bias=None, dtype=jnp.float32,
                training=False):
        return orig(q, k, v, h, attention_bias, dtype,
                    use_flash="interpret", training=training)

    vitmod.multi_head_attention = patched
    try:
        out = model.apply(params, imgs).astype(jnp.float32)
    finally:
        vitmod.multi_head_attention = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)
