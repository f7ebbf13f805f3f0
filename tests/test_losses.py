import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simseg_tpu.ops.losses import (
    info_nce,
    label_smoothing_ce,
    mixup_nce,
    soft_target_ce,
    symmetric_info_nce,
    triplet_loss,
)


def _norm_rows(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture
def embs():
    rng = np.random.default_rng(0)
    img = _norm_rows(rng.normal(size=(16, 8))).astype(np.float32)
    txt = _norm_rows(rng.normal(size=(16, 8))).astype(np.float32)
    return img, txt


def test_info_nce_matches_torch(embs):
    """Reference semantics: CE(logits = f1 @ f2.T / T, arange targets)
    (mml_loss.py:51-96 global branch on the global batch)."""
    img, txt = embs
    temp = 0.05
    loss, acc = info_nce(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(temp))

    logits = torch.tensor(img @ txt.T / temp)
    want = F.cross_entropy(logits, torch.arange(16))
    assert float(loss) == pytest.approx(float(want), rel=1e-5)

    want_acc = (logits.argmax(1) == torch.arange(16)).float().mean()
    assert float(acc) == pytest.approx(float(want_acc))


def test_symmetric_info_nce(embs):
    img, txt = embs
    temp = jnp.asarray(0.05)
    loss, accs = symmetric_info_nce(jnp.asarray(img), jnp.asarray(txt), temp)
    i2t, _ = info_nce(jnp.asarray(img), jnp.asarray(txt), temp)
    t2i, _ = info_nce(jnp.asarray(txt), jnp.asarray(img), temp)
    assert float(loss) == pytest.approx(0.5 * (float(i2t) + float(t2i)), rel=1e-6)
    assert set(accs) == {"i2t_acc", "t2i_acc"}


def test_info_nce_ignore_mask(embs):
    """Masked feat2 rows are zeroed and masked loss rows contribute 0 but
    stay in the denominator (reference behavior, mml_loss.py:70-91)."""
    img, txt = embs
    temp = 0.05
    ignore = np.zeros(16, dtype=np.float32)
    ignore[3] = 1.0
    loss, _ = info_nce(jnp.asarray(img), jnp.asarray(txt), jnp.asarray(temp),
                       ignore_mask=jnp.asarray(ignore))

    txt_m = txt * (1 - ignore)[:, None]
    logits = torch.tensor(img @ txt_m.T / temp)
    per_row = F.cross_entropy(logits, torch.arange(16), reduction="none")
    want = (per_row * torch.tensor(1 - ignore)).mean()
    assert float(loss) == pytest.approx(float(want), rel=1e-5)


def test_info_nce_group_block_diagonal(embs):
    """group_size negatives == concatenated per-group InfoNCE
    (TPU equivalent of generate_local_groups-limited gather)."""
    img, txt = embs
    temp = jnp.asarray(0.05)
    loss, _ = info_nce(jnp.asarray(img), jnp.asarray(txt), temp, group_size=8)
    parts = []
    for g in range(2):
        l, _ = info_nce(jnp.asarray(img[g * 8:(g + 1) * 8]),
                        jnp.asarray(txt[g * 8:(g + 1) * 8]), temp)
        parts.append(float(l))
    assert float(loss) == pytest.approx(np.mean(parts), rel=1e-5)


def test_label_smoothing_matches_torch():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=8)
    got = label_smoothing_ce(jnp.asarray(logits), jnp.asarray(targets), 0.1)
    want = F.cross_entropy(
        torch.tensor(logits), torch.tensor(targets), label_smoothing=0.1,
        reduction="none",
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_soft_target_ce():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    probs = rng.random((4, 6)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    got = soft_target_ce(jnp.asarray(logits), jnp.asarray(probs))
    want = torch.sum(
        -torch.tensor(probs) * F.log_softmax(torch.tensor(logits), dim=-1), dim=-1
    )
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-5)


def test_mixup_nce_flip_targets(embs):
    img, txt = embs
    temp = jnp.asarray(0.05)
    alpha = jnp.asarray(0.7)
    loss, _ = mixup_nce(jnp.asarray(img), jnp.asarray(txt), temp, alpha,
                        flip_block=16)
    logits = torch.tensor(img @ txt.T / 0.05)
    t = torch.arange(16)
    want = 0.7 * F.cross_entropy(logits, t, reduction="none") + 0.3 * F.cross_entropy(
        logits, t.flip(0), reduction="none"
    )
    assert float(loss) == pytest.approx(float(want.mean()), rel=1e-5)


def test_triplet_loss_hard_negative(embs):
    img, txt = embs
    loss, _, _ = triplet_loss(jnp.asarray(img), jnp.asarray(txt), margin=0.2,
                              reduce_mode="max")
    scores = torch.tensor(img @ txt.T)
    diag = scores.diag()
    n = 16
    c12 = (0.2 + scores - diag.view(-1, 1)).clamp(min=0)
    c21 = (0.2 + scores - diag.view(1, -1)).clamp(min=0)
    mask = torch.eye(n) > 0.5
    c12 = c12.masked_fill(mask, 0)
    c21 = c21.masked_fill(mask, 0)
    want = (c12.max(1)[0] + c21.max(0)[0]).sum()
    assert float(loss) == pytest.approx(float(want), rel=1e-4)
