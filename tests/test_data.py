import os
import random

import numpy as np
import pytest
from PIL import Image

from simseg_tpu.data.corruption import process_caption
from simseg_tpu.data.datasets import (
    ConcatDataset,
    CsvPairDataset,
    DataLoader,
    SegDataset,
    debias_batches,
    sequential_batches,
)
from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
from simseg_tpu.data.transforms import (
    build_transforms,
    denormalize_to_u8,
    normalize_images,
)
from simseg_tpu.utils.collections import AttrDict


@pytest.fixture
def vocab_tok():
    return WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "dog", "cat", "play", "##ing", "the"]
    ))


def test_wordpiece_tokenizer_basics(vocab_tok):
    toks = vocab_tok.tokenize("A photo of playing dogs!")
    assert "photo" in toks and "play" in toks and "##ing" in toks
    enc = vocab_tok("a photo of the dog", max_length=10)
    ids, mask = enc["input_ids"][0], enc["attention_mask"][0]
    assert len(ids) == 10 and len(mask) == 10
    assert ids[0] == vocab_tok.vocab["[CLS]"]
    assert ids[sum(mask) - 1] == vocab_tok.vocab["[SEP]"]
    assert all(m == 0 for m in mask[sum(mask):])


def test_tokenizer_matches_hf_bert_algorithm(vocab_tok):
    """Our WordPiece must agree with transformers' BertTokenizer on the same
    vocab (greedy longest-match, lowercase, punctuation split)."""
    transformers = pytest.importorskip("transformers")
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for tok in vocab_tok.vocab:
            f.write(tok + "\n")
        path = f.name
    hf = transformers.BertTokenizer(path, do_lower_case=True)
    for text in ["A photo of the dog!", "cats playing", "PLAYING dog, cat."]:
        assert vocab_tok.tokenize(text) == hf.tokenize(text)
        ours = vocab_tok(text, max_length=12)
        theirs = hf(text, padding="max_length", truncation=True, max_length=12)
        assert ours["input_ids"][0] == theirs["input_ids"]
        assert ours["attention_mask"][0] == theirs["attention_mask"]
    os.unlink(path)


def test_caption_corruption(vocab_tok):
    random.seed(0)
    cap = "a photo of the dog playing"
    outs = {process_caption(vocab_tok, cap, train=True) for _ in range(50)}
    assert len(outs) > 1  # corruption actually happens
    assert process_caption(vocab_tok, cap, train=False) == cap
    for out in outs:
        # masked tokens survive round-trip tokenization
        if "[MASK]" in out:
            assert "[MASK]" in vocab_tok.tokenize(out)


def _cfg_transforms(size=32):
    cfg = AttrDict()
    cfg.transforms = AttrDict()
    cfg.transforms.input_size = size
    cfg.transforms.train_transforms = ["random_resize_crop", "autoaug"]
    cfg.transforms.valid_transforms = ["resize"]
    cfg.transforms.resize = AttrDict(size=size)
    cfg.transforms.random_resize_crop = AttrDict(size=size, scale=[0.6, 1.0])
    cfg.transforms.random_erasing = AttrDict(reprob=0.0, remode="pixel", recount=1)
    cfg.transforms.normalize = AttrDict(
        mean=[0.485, 0.456, 0.406], std=[0.229, 0.224, 0.225]
    )
    return cfg


def test_transforms_and_device_normalize():
    cfg = _cfg_transforms()
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (48, 64, 3), np.uint8)
    )
    valid = build_transforms(cfg, "valid")(img)
    assert valid.shape == (32, 32, 3) and valid.dtype == np.uint8
    train = build_transforms(cfg, "train")(img)
    assert train.shape == (32, 32, 3)

    norm = np.asarray(normalize_images(valid[None]))
    want = (valid.astype(np.float32) / 255.0 - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
    np.testing.assert_allclose(norm[0], want, rtol=1e-5, atol=1e-6)
    back = np.asarray(denormalize_to_u8(norm))
    np.testing.assert_array_equal(back[0], valid)


@pytest.fixture
def csv_dataset(tmp_path, vocab_tok):
    # valid mode: no caption corruption, so loader determinism is testable
    root = tmp_path / "toy" / "valid"
    root.mkdir(parents=True)
    rows = ["image,caption"]
    rng = np.random.default_rng(0)
    for i in range(10):
        name = f"img_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(root / name)
        rows.append(f"{name},a photo of the dog {i}")
    (tmp_path / "toy" / "valid_anno.csv").write_text("\n".join(rows))

    cfg = _cfg_transforms()
    cfg.data = AttrDict(data_path=str(tmp_path))
    cfg.model = AttrDict(max_length=12)
    tf = build_transforms(cfg, "valid")
    return CsvPairDataset(cfg, "toy", vocab_tok, tf, "valid")


def test_csv_dataset_and_loader(csv_dataset):
    assert len(csv_dataset) == 10
    s = csv_dataset[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["input_ids"].shape == (12,)

    loader = DataLoader(csv_dataset, batch_size=4, shuffle=True, drop_last=True,
                        num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2 == len(loader)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["input_ids"].dtype == np.int32

    # deterministic per epoch, different across epochs
    again = list(loader)
    np.testing.assert_array_equal(batches[0]["input_ids"], again[0]["input_ids"])
    loader.set_epoch(1)
    other = list(loader)
    assert not np.array_equal(batches[0]["input_ids"], other[0]["input_ids"])


def test_loader_sharding(csv_dataset):
    a = DataLoader(csv_dataset, 1, shard_index=0, shard_count=2, num_workers=1)
    b = DataLoader(csv_dataset, 1, shard_index=1, shard_count=2, num_workers=1)
    ids_a = [x["input_ids"][0, 6] for x in a]
    ids_b = [x["input_ids"][0, 6] for x in b]
    assert len(ids_a) == 5 and len(ids_b) == 5
    assert set(map(int, ids_a)).isdisjoint(map(int, ids_b))


def test_concat_and_mixing(csv_dataset):
    concat = ConcatDataset([csv_dataset, csv_dataset])
    assert len(concat) == 20
    assert concat[15]["image"].shape == (32, 32, 3)

    l1 = DataLoader(csv_dataset, 5, num_workers=1)
    l2 = DataLoader(csv_dataset, 5, num_workers=1)
    seq = list(sequential_batches([l1, l2]))
    assert len(seq) == 4
    deb = list(debias_batches([l1, l2], seed=0))
    assert len(deb) == 4


def test_seg_dataset(tmp_path):
    root = tmp_path / "VOCdevkit" / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(1)
    names = []
    for i in range(3):
        n = f"2007_{i:06d}"
        names.append(n)
        Image.fromarray(rng.integers(0, 255, (50, 60, 3), np.uint8)).save(
            root / "JPEGImages" / f"{n}.jpg"
        )
        Image.fromarray(rng.integers(0, 21, (50, 60), np.uint8).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{n}.png"
        )
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(names))

    cfg = _cfg_transforms()
    cfg.data = AttrDict(data_path=str(tmp_path), batch_size_val=1, num_workers=1)
    ds = SegDataset(cfg, "pascal_voc", build_transforms(cfg, "valid"))
    assert len(ds) == 3
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["mask_label"].shape == (50, 60)


class _ListDataset:
    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise OSError(f"corrupt sample {i}")
        return {"x": np.full((2,), i, np.float32)}


def test_loader_len_is_arithmetic():
    """__len__ never materializes/shuffles indices; it matches the actual
    batch count for every shard/pad/drop combination."""
    for n in (0, 1, 7, 16, 17):
        ds = _ListDataset(n)
        for shard_count in (1, 3):
            for shard_index in range(shard_count):
                for pad in (False, True):
                    for drop in (False, True):
                        loader = DataLoader(
                            ds, batch_size=4, shuffle=True, drop_last=drop,
                            num_workers=1, shard_index=shard_index,
                            shard_count=shard_count, pad_shards=pad)
                        got = len(loader)
                        want = len(list(loader))
                        assert got == want, (
                            n, shard_count, shard_index, pad, drop, got, want)


def test_loader_propagates_dataset_errors():
    """A decode error reaches the consumer as an exception instead of
    killing the producer thread and hanging q.get forever."""
    loader = DataLoader(_ListDataset(8, fail_at=5), batch_size=4,
                        num_workers=2, prefetch=1)
    it = iter(loader)
    next(it)  # first batch (indices 0-3) is fine
    with pytest.raises(OSError, match="corrupt sample 5"):
        for _ in it:
            pass


def test_loader_abandoned_iterator_stops_producer():
    """Abandoning iteration mid-epoch unblocks the producer (it would
    otherwise sit in q.put on the full prefetch queue forever)."""
    import threading
    import time

    before = {t.ident for t in threading.enumerate()}
    loader = DataLoader(_ListDataset(64), batch_size=4, num_workers=1,
                        prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # generator finally -> stop.set()
    deadline = time.time() + 10
    while time.time() < deadline:
        extra = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"leaked producer threads: {extra}"


def test_csv_dataset_with_real_hf_tokenizer(csv_dataset, vocab_tok, tmp_path):
    """Datasets must tokenize with batch-of-one calls: a real HF tokenizer
    returns a FLAT id list for a bare string (so [0] would be the CLS id,
    garbling every sample on machines with a cached HF tokenizer)."""
    transformers = pytest.importorskip("transformers")
    vf = tmp_path / "hf_vocab.txt"
    vf.write_text("\n".join(vocab_tok.vocab))
    hf = transformers.BertTokenizer(str(vf), do_lower_case=True)

    csv_dataset.tokenizer = hf
    s = csv_dataset[0]
    assert s["input_ids"].shape == (12,)
    assert s["attention_mask"].shape == (12,)
    # matches the bundled WordPiece fallback token-for-token
    csv_dataset.tokenizer = vocab_tok
    s2 = csv_dataset[0]
    np.testing.assert_array_equal(s["input_ids"], s2["input_ids"])
