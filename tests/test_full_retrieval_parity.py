"""End-to-end retrieval parity: our tool's embedding + RSUM path vs a torch
re-derivation of the reference (tools/retrieval_evaluation.py semantics),
with bridged weights on a synthetic parquet set."""

from io import BytesIO

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint
from simseg_tpu.data.datasets import DataLoader, ParquetRetrievalDataset
from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
from simseg_tpu.data.transforms import build_transforms
from simseg_tpu.tasks.clip.config import task_cfg_init_fn
from simseg_tpu.utils.retrieval import retrieval_summary
from tests.test_models import tiny_clip
from tests.torch_reference import TorchTinyCLIP, torch_clip_embeddings


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("retrieval")
    rng = np.random.default_rng(0)
    words = ["dog", "cat", "car", "tree"]
    rows = []
    for i in range(12):
        buf = BytesIO()
        Image.fromarray(rng.integers(0, 255, (40, 44, 3), np.uint8)).save(buf, "JPEG")
        rows.append({
            "imbytes": buf.getvalue(),
            "caption": f"a photo of the {words[i % 4]}",
            "image_id": i // 2,
            "id": i,
        })
    (tmp_path / "f30k").mkdir()
    pd.DataFrame(rows).to_parquet(tmp_path / "f30k" / "valid.parquet")

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        f"data.data_path={tmp_path}/",
        "data.batch_size_val=4",
        "data.num_workers=1",
        "model.max_length=12",
        "transforms.input_size=32",
        "transforms.resize.size=32",
        "transforms.valid_transforms=[resize]",
    ], target=new_base_cfg())

    torch.manual_seed(1)
    tmodel = TorchTinyCLIP()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    ckpt = tmp_path / "tiny.pth"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)

    fmodel = tiny_clip()
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = fmodel.init(jax.random.key(0), dummy)
    params, _ = load_clip_checkpoint(str(ckpt), params)
    tok = WordPieceTokenizer(make_test_vocab(
        words + ["a", "photo", "of", "the"]
    ))
    return cfg, tmodel, fmodel, params, tok


def test_retrieval_summary_matches_torch(setup):
    cfg, tmodel, fmodel, params, tok = setup
    tf = build_transforms(cfg, "valid")
    ds = ParquetRetrievalDataset(cfg, "f30k", tok, tf)
    loader = DataLoader(ds, cfg.data.batch_size_val, num_workers=1)

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    # collect both frameworks' embeddings over the same batches
    ours_i, ours_t, torch_i, torch_t, iids, cids = [], [], [], [], [], []
    from simseg_tpu.data.transforms import normalize_images

    @jax.jit
    def embed(params, images_u8, ids, mask):
        batch = {"image": normalize_images(images_u8),
                 "input_ids": ids, "attention_mask": mask}
        img, txt, _ = fmodel.apply(params, batch, deterministic=True)
        return img, txt

    for batch in loader:
        img, txt = embed(params, jnp.asarray(batch["image"]),
                         jnp.asarray(batch["input_ids"]),
                         jnp.asarray(batch["attention_mask"]))
        ours_i.append(np.asarray(img))
        ours_t.append(np.asarray(txt))
        x = (batch["image"].astype(np.float32) / 255.0 - mean) / std
        with torch.no_grad():
            ti, tt = torch_clip_embeddings(
                tmodel,
                torch.tensor(x.transpose(0, 3, 1, 2)),
                torch.tensor(batch["input_ids"].astype(np.int64)),
                torch.tensor(batch["attention_mask"].astype(np.int64)),
            )
        torch_i.append(ti.numpy())
        torch_t.append(tt.numpy())
        iids.append(batch["image_id"])
        cids.append(batch["caption_id"])

    ours_i, ours_t = np.concatenate(ours_i), np.concatenate(ours_t)
    torch_i, torch_t = np.concatenate(torch_i), np.concatenate(torch_t)
    np.testing.assert_allclose(ours_i, torch_i, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_t, torch_t, rtol=1e-4, atol=1e-5)

    iids, cids = np.concatenate(iids), np.concatenate(cids)
    got = retrieval_summary(ours_i, ours_t, iids, cids)

    # torch-side reference ranking (hooks/utils.py argsort semantics; the
    # reference's unique() keeps the LAST row of each sorted id block via
    # cumsum-1 offsets, :14-19)
    uniq, counts = np.unique(iids, return_counts=True)
    stable = np.argsort(iids, kind="stable")
    last = stable[np.cumsum(counts) - 1]
    img_mat = torch.tensor(torch_i[last])
    sim = torch.tensor(torch_t) @ img_mat.T
    order = torch.argsort(sim, dim=1, descending=True)
    gids = torch.tensor(uniq[np.argsort(uniq)])[order]
    matched = gids == torch.tensor(iids)[:, None]
    _, first_rank = torch.max(matched, dim=1)
    for k in (1, 5, 10):
        want = float((first_rank < k).float().mean())
        assert got[f"t2i_R@{k}"] == pytest.approx(want, abs=1e-6)
    assert 0 < got["rsum"] <= 600
