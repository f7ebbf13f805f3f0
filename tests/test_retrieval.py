"""Retrieval metrics vs a torch re-derivation of the reference argsort path."""

import numpy as np
import pytest
import torch

from simseg_tpu.utils.retrieval import (
    IndexedEmb,
    first_match_ranks,
    recall_at_k,
    retrieval_summary,
)


def torch_reference_recall(l_emb, l_gid, r_emb, r_gid, ks=(1, 5, 10)):
    """Reference semantics re-derived (hooks/utils.py:35-75)."""
    sim = torch.tensor(l_emb) @ torch.tensor(r_emb).T
    order = torch.argsort(sim, dim=1, descending=True)
    r_sorted = torch.tensor(r_gid)[order]
    matched = r_sorted == torch.tensor(l_gid)[:, None]
    has, first = torch.max(matched, dim=1)
    ranks = first[has]
    return {f"R@{k}": float((ranks < k).sum() / has.sum()) for k in ks}


@pytest.fixture
def retrieval_data():
    rng = np.random.default_rng(0)
    n_img, n_cap, d = 40, 200, 16
    img = rng.normal(size=(n_img, d)).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    cap_img_id = np.repeat(np.arange(n_img), 5)
    # caption = noisy view of its image embedding
    cap = img[cap_img_id] + 0.5 * rng.normal(size=(n_cap, d)).astype(np.float32)
    cap /= np.linalg.norm(cap, axis=1, keepdims=True)
    return img, cap, cap_img_id


def test_recall_matches_torch_argsort(retrieval_data):
    img, cap, cap_img_id = retrieval_data
    img_ids = np.arange(img.shape[0])
    got = recall_at_k(IndexedEmb("i", img_ids, img), IndexedEmb("t", cap_img_id, cap))
    want = torch_reference_recall(img, img_ids, cap, cap_img_id)
    for k in ("R@1", "R@5", "R@10"):
        assert got[k] == pytest.approx(want[k], abs=1e-6)

    got_t2i = recall_at_k(IndexedEmb("t", cap_img_id, cap), IndexedEmb("i", img_ids, img))
    want_t2i = torch_reference_recall(cap, cap_img_id, img, img_ids)
    for k in ("R@1", "R@5", "R@10"):
        assert got_t2i[k] == pytest.approx(want_t2i[k], abs=1e-6)


def test_unique_dedup():
    emb = np.stack([np.full(4, i, np.float32) for i in range(6)])
    gid = np.array([3, 3, 1, 1, 2, 2])
    uni = IndexedEmb("x", gid, emb).unique()
    np.testing.assert_array_equal(uni.group_idx, [1, 2, 3])
    # keeps the last row of each sorted-group block (cumsum-1 offsets)
    np.testing.assert_array_equal(uni.emb[:, 0], [3, 5, 1])


def test_retrieval_summary_perfect():
    image_ids = np.repeat(np.arange(4), 2)  # each image appears twice
    caption_ids = np.arange(8)
    basis = np.eye(4, 8, dtype=np.float32)
    img = basis[image_ids]  # duplicate rows share the embedding
    txt = img.copy()
    out = retrieval_summary(img, txt, image_ids, caption_ids)
    assert out["rsum"] == pytest.approx(600.0)
    assert out["i2t_R@1"] == 1.0 and out["t2i_R@1"] == 1.0


def test_first_match_ranks_chunked(retrieval_data):
    img, cap, cap_img_id = retrieval_data
    a = first_match_ranks(IndexedEmb("t", cap_img_id, cap),
                          IndexedEmb("i", np.arange(img.shape[0]), img))
    b = first_match_ranks(IndexedEmb("t", cap_img_id, cap),
                          IndexedEmb("i", np.arange(img.shape[0]), img),
                          batch=7)
    np.testing.assert_array_equal(a, b)
