"""Datasets and the host-side prefetching loader.

Parity: reference ``simseg/datasets/`` —
- RawImageDataset (clip_dataset.py:17-77): CSV-driven (image, caption) pairs
  with train-time caption corruption, tokenized to max_length
- ParquetDataset (clip_dataset.py:80-122): f30k/coco ``valid.parquet`` with
  imbytes/caption/image_id/id columns
- SegDataset (seg/seg_dataset.py:13-64): pascal_voc / pascal_context /
  coco_stuff val splits returning (transformed image, raw-size label)
- ImageFolder (linear_prob/linear_dataset.py): class-per-directory ImageNet
- the ``clip``/``seg``/``imagenet_local`` DATALOADER factories with
  shuffle / sequential / debias train mixing (clip_dataset.py:237-253,
  clip_runner.py:79-183)

TPU-native loader: instead of torch DataLoader worker *processes* + pinned
host tensors + per-step H2D copies, a thread pool decodes/transforms and a
background prefetcher keeps a queue of ready uint8 numpy batches; images
cross to the device as uint8 and are normalized on device
(transforms.normalize_images), so the PCIe/ICI transfer is 4x smaller. In a
multi-host pod each process loads its own shard (process_index-strided).
"""

from __future__ import annotations

import os
import queue
import random
import threading
from concurrent.futures import ThreadPoolExecutor
from glob import glob
from io import BytesIO
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np
from PIL import Image

from simseg_tpu.data.corruption import process_caption
from simseg_tpu.data.transforms import build_transforms
from simseg_tpu.utils.registry import Registry

DATALOADER = Registry("DATALOADER")


# --------------------------------------------------------------------------
# datasets (index -> sample dict of numpy arrays / python scalars)
# --------------------------------------------------------------------------

class CsvPairDataset:
    """CSV (image, caption[, image_id, caption_id]) pairs
    (parity: RawImageDataset)."""

    def __init__(self, cfg, name: str, tokenizer, transforms, mode: str = "train"):
        self.name = name
        self.mode = mode
        self.tokenizer = tokenizer
        self.transforms = transforms
        self.max_length = cfg.model.max_length
        self.seed = int(cfg.get("seed", 0) or 0)
        self.epoch = 0
        import pandas as pd

        split = "train" if mode == "train" else "valid"
        self.image_base = os.path.join(cfg.data.data_path, name, split)
        df = pd.read_csv(os.path.join(cfg.data.data_path, name, f"{split}_anno.csv"))
        self.images = df["image"].tolist()
        self.captions = df["caption"].tolist()
        self.image_ids = df["image_id"].tolist() if "image_id" in df else None
        self.caption_ids = df["caption_id"].tolist() if "caption_id" in df else None

    def __len__(self) -> int:
        return len(self.captions)

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __getitem__(self, index: int) -> Dict[str, Any]:
        caption = self.captions[index]
        if self.mode == "train":
            # per-(seed, epoch, sample) stream: the corruption is
            # deterministic and thread-safe, so a resumed run replays the
            # exact batches an uninterrupted run would see (the reference's
            # global-`random` draws are ordering- and thread-dependent)
            rng = random.Random(
                (self.seed * 1_000_003 + self.epoch) * 1_000_003 + index)
            caption = process_caption(self.tokenizer, caption, rng=rng)
        # batch-of-one call: HF tokenizers return a FLAT id list for a bare
        # string (so [0] would be the CLS id), but nested lists for a list
        # input — the form the bundled WordPiece fallback also produces
        enc = self.tokenizer([caption], padding="max_length", truncation=True,
                             max_length=self.max_length)
        path = os.path.join(self.image_base, self.images[index])
        if self.mode == "train" and hasattr(self.transforms, "load"):
            image = self.transforms.load(path)  # native decode fast path
        else:
            image = self.transforms(Image.open(path).convert("RGB"))
        sample = {
            "image": image,
            "input_ids": np.asarray(enc["input_ids"][0], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"][0], np.int32),
        }
        if self.mode != "train" and self.image_ids is not None:
            sample["image_id"] = np.int64(self.image_ids[index])
            # caption_id is optional independently of image_id (the class
            # contract); the row index is unique per caption when absent
            sample["caption_id"] = np.int64(
                self.caption_ids[index] if self.caption_ids is not None
                else index)
        return sample


class ParquetRetrievalDataset:
    """f30k/coco valid.parquet (parity: ParquetDataset)."""

    def __init__(self, cfg, name: str, tokenizer, transforms):
        import pyarrow.parquet as pq

        self.tokenizer = tokenizer
        self.transforms = transforms
        self.max_length = cfg.model.max_length
        df = pq.read_table(
            os.path.join(cfg.data.data_path, name, "valid.parquet")
        ).to_pandas()
        self.images = df["imbytes"].tolist()
        self.captions = df["caption"].tolist()
        self.image_ids = df["image_id"].tolist()
        self.caption_ids = df["id"].tolist()

    def __len__(self) -> int:
        return len(self.captions)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        # batch-of-one (see CsvPairDataset: HF returns flat ids for a bare
        # string)
        enc = self.tokenizer([self.captions[index]], padding="max_length",
                             truncation=True, max_length=self.max_length)
        img = Image.open(BytesIO(self.images[index])).convert("RGB")
        return {
            "image": self.transforms(img),
            "input_ids": np.asarray(enc["input_ids"][0], np.int32),
            "attention_mask": np.asarray(enc["attention_mask"][0], np.int32),
            "image_id": np.int64(self.image_ids[index]),
            "caption_id": np.int64(self.caption_ids[index]),
        }


class SegDataset:
    """Val-only segmentation datasets (parity: seg/seg_dataset.py:13-64)."""

    LAYOUTS = {
        "pascal_voc": ("VOCdevkit/VOC2012", "JPEGImages", "SegmentationClass",
                       "ImageSets/Segmentation/val.txt"),
        "pascal_context": ("VOCdevkit/VOC2010", "JPEGImages",
                           "SegmentationClassContext",
                           "ImageSets/SegmentationContext/val.txt"),
        "coco_stuff": ("coco_stuff164k", "images/val2017", "annotations/val2017", None),
    }

    def __init__(self, cfg, name: str, transforms):
        if name not in self.LAYOUTS:
            raise NotImplementedError(f"dataset '{name}'")
        self.name = name
        self.transforms = transforms
        root, img_dir, label_dir, list_file = self.LAYOUTS[name]
        self.image_path = os.path.join(cfg.data.data_path, root, img_dir)
        self.label_path = os.path.join(cfg.data.data_path, root, label_dir)
        if list_file is not None:
            with open(os.path.join(cfg.data.data_path, root, list_file)) as f:
                self.names = [l.rstrip() for l in f]
        else:
            files = glob(os.path.join(self.image_path, "*.jpg"))
            self.names = [os.path.basename(p)[:-len(".jpg")] for p in files]

    def __len__(self) -> int:
        return len(self.names)

    def _label_file(self, item: str) -> str:
        label_name = item + ("_labelTrainIds" if self.name == "coco_stuff" else "")
        return os.path.join(self.label_path, label_name + ".png")

    def max_label_size(self) -> tuple:
        """(max_h, max_w) over all GT label maps, from the PNG headers only
        (no pixel decode) — lets the eval size its padded GT canvas up front
        instead of crashing mid-dataset on an oversized label. Cached: the
        split is immutable, and rescanning tens of thousands of headers on
        every evaluate_benchmark call (per process) is pure waste."""
        if not hasattr(self, "_max_label_size"):
            mh = mw = 0
            for item in self.names:
                with Image.open(self._label_file(item)) as im:
                    w, h = im.size
                mh, mw = max(mh, h), max(mw, w)
            self._max_label_size = (mh, mw)
        return self._max_label_size

    def __getitem__(self, index: int) -> Dict[str, Any]:
        item = self.names[index]
        img = Image.open(os.path.join(self.image_path, item + ".jpg")).convert("RGB")
        label = np.asarray(Image.open(self._label_file(item)))
        return {"image": self.transforms(img), "mask_label": label.astype(np.int32)}


class ImageFolderDataset:
    """class-per-directory layout (parity: linear_prob/linear_dataset.py)."""

    def __init__(self, root: str, transforms):
        self.transforms = transforms
        classes = sorted(
            d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
        )
        self.class_to_idx = {c: i for i, c in enumerate(classes)}
        self.samples: List = []
        for c in classes:
            for p in sorted(glob(os.path.join(root, c, "*"))):
                self.samples.append((p, self.class_to_idx[c]))

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, index: int) -> Dict[str, Any]:
        path, label = self.samples[index]
        if (getattr(self.transforms, "mode", "") == "train"
                and hasattr(self.transforms, "load")):
            image = self.transforms.load(path)  # native decode fast path
        else:
            image = self.transforms(Image.open(path).convert("RGB"))
        return {"image": image, "label": np.int64(label)}


# --------------------------------------------------------------------------
# loader: thread-pool decode + background prefetch
# --------------------------------------------------------------------------

def _collate(samples: Sequence[Dict[str, Any]]) -> Dict[str, np.ndarray]:
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if np.ndim(vals[0]) == 0:
            out[k] = np.asarray(vals)
        elif k == "mask_label" and len({v.shape for v in vals}) > 1:
            # variable-size GT maps: pad to the batch max with the ignore
            # index and record true sizes (the seg eval compares inside a
            # padded canvas, so 255 pixels never score)
            max_h = max(v.shape[0] for v in vals)
            max_w = max(v.shape[1] for v in vals)
            padded = np.full((len(vals), max_h, max_w), 255, vals[0].dtype)
            for i, v in enumerate(vals):
                padded[i, :v.shape[0], :v.shape[1]] = v
            out[k] = padded
            out["mask_h"] = np.asarray([v.shape[0] for v in vals], np.int32)
            out["mask_w"] = np.asarray([v.shape[1] for v in vals], np.int32)
        else:
            out[k] = np.stack(vals)
    return out


class DataLoader:
    """Iterable over collated numpy batches with threaded decode and
    background prefetch. Deterministic per (seed, epoch)."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
        pad_shards: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.pad_shards = pad_shards

    def set_epoch(self, epoch: int) -> None:
        """parity: DistributedSampler.set_epoch (core/hooks/dist.py:64-67);
        forwarded to the dataset so per-sample augmentation streams (caption
        corruption) key on the epoch too."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def _indices(self) -> List[int]:
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            random.Random(self.seed + self.epoch).shuffle(idx)
        if self.shard_count > 1 and self.pad_shards and idx:
            # wrap-pad so every shard has the same length (torch
            # DistributedSampler semantics): the runner's step/eval fns are
            # collective over the global mesh, so every process must produce
            # the same number of same-sized batches or the pod deadlocks
            # mid-epoch. The standalone eval tools keep exact shards
            # (independent per-process jits; they gather at the end).
            total = -(-len(idx) // self.shard_count) * self.shard_count
            idx = (idx * self.shard_count)[:total]
        return idx[self.shard_index::self.shard_count]

    def __len__(self) -> int:
        # arithmetic only — materializing + shuffling the index list here
        # (i.e. calling _indices()) would be O(N) per call, and __len__
        # runs at runner init and per epoch in debias_batches
        n = len(self.dataset)
        if self.shard_count > 1:
            if self.pad_shards and n:
                n = -(-n // self.shard_count)  # every shard wrap-padded equal
            else:
                n = max(0, (n - self.shard_index + self.shard_count - 1)
                        // self.shard_count)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        batches = [
            indices[i:i + self.batch_size]
            for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # a plain q.put would block forever once the consumer abandons
            # the iterator (stop set, queue full) — poll the stop event
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        batch = _collate(list(
                            pool.map(self.dataset.__getitem__, batch_idx)))
                        if not put_or_stop(batch):
                            return
                put_or_stop(None)
            except BaseException as exc:  # noqa: BLE001
                # a decode/collate error must reach the consumer — dying
                # without a sentinel would leave it blocked in q.get forever
                put_or_stop(exc)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


# --------------------------------------------------------------------------
# mixing iterators for the three train modes
# --------------------------------------------------------------------------

class ConcatDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)
        self.offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def set_epoch(self, epoch: int) -> None:
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __len__(self) -> int:
        return int(self.offsets[-1])

    def __getitem__(self, index: int):
        ds = int(np.searchsorted(self.offsets, index, side="right")) - 1
        return self.datasets[ds][index - int(self.offsets[ds])]


def sequential_batches(loaders: Sequence[DataLoader]) -> Iterator:
    """One dataset after another (parity: clip_runner.py:109-138)."""
    for loader in loaders:
        yield from loader


def debias_batches(loaders: Sequence[DataLoader], seed: int = 0) -> Iterator:
    """Per-step weighted random dataset choice, weights proportional to
    remaining batches (parity: clip_runner.py:140-183)."""
    rng = random.Random(seed)
    iters = [iter(l) for l in loaders]
    remaining = [len(l) for l in loaders]
    while any(r > 0 for r in remaining):
        choice = rng.choices(range(len(iters)), weights=remaining)[0]
        try:
            yield next(iters[choice])
            remaining[choice] -= 1
        except StopIteration:
            remaining[choice] = 0


# --------------------------------------------------------------------------
# registered factories
# --------------------------------------------------------------------------

def _process_shard():
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


@DATALOADER.register(name="clip")
def build_clip_dataloaders(cfg, tokenizer=None) -> Dict[str, Any]:
    """parity: clip_dataset.py:237-253. Per-process batch size is
    global/process_count (each process feeds its local devices)."""
    from simseg_tpu.data.tokenizer import build_tokenizer

    if tokenizer is None:
        tokenizer = build_tokenizer(
            cfg.model.text_encoder.tag,
            vocab_file=cfg.data.get("vocab_file"),
        )
    shard, nshards = _process_shard()
    train_tf = build_transforms(cfg, "train")
    valid_tf = build_transforms(cfg, "valid")
    bs = cfg.data.batch_size // nshards
    bs_val = cfg.data.batch_size_val // nshards

    def make_train(name):
        return CsvPairDataset(cfg, name, tokenizer, train_tf, "train")

    if cfg.data.train_type == "shuffle":
        ds = ConcatDataset([make_train(n) for n in cfg.data.train_name])
        train = [DataLoader(ds, bs, shuffle=True, drop_last=True,
                            num_workers=cfg.data.num_workers,
                            shard_index=shard, shard_count=nshards,
                            pad_shards=True)]
        train_datasets = None
    elif cfg.data.train_type in ("sequential", "debias"):
        train_datasets = [make_train(n) for n in cfg.data.train_name]
        train = [
            DataLoader(d, bs, shuffle=True, drop_last=True,
                       num_workers=cfg.data.num_workers,
                       shard_index=shard, shard_count=nshards,
                       pad_shards=True)
            for d in train_datasets
        ]
    else:
        raise NotImplementedError(cfg.data.train_type)

    # single_eval=True (reference default, clip/config.py:73): full-set
    # metrics — every process feeds the whole val set (the global-mesh eval
    # is collective, so "rank 0 only" is not expressible; full-set-everywhere
    # reproduces rank 0's numbers on every process). False = distributed
    # eval: per-process shards + the eval hook's gather (eval.py:32-39).
    if cfg.data.get("single_eval", True):
        vshard, vnshards = 0, 1
        bs_val = cfg.data.batch_size_val
    else:
        vshard, vnshards = shard, nshards
    val = []
    if cfg.data.enable_valid:
        for name in cfg.data.valid_name:
            try:
                ds = ParquetRetrievalDataset(cfg, name, tokenizer, valid_tf)
            except FileNotFoundError:
                ds = CsvPairDataset(cfg, name, tokenizer, valid_tf, "valid")
            val.append(
                DataLoader(ds, bs_val, num_workers=cfg.data.num_workers,
                           shard_index=vshard, shard_count=vnshards,
                           pad_shards=True)
            )
    return dict(train=train, train_dataset=train_datasets, val=val)


def build_seg_valid_loader(cfg, name: str) -> DataLoader:
    """parity: seg_dataset.py:67-81 (batch_size_val, typically 1). On a
    multi-process run each process evaluates a strided shard of the set;
    the eval sums the per-class histograms across processes
    (tasks/seg_eval.py) — the reference's DistributedSampler + eval-hook
    gather (tasks/clip/hooks/eval.py:32-39)."""
    shard, nshards = _process_shard()
    tf = build_transforms(cfg, "valid")
    return DataLoader(SegDataset(cfg, name, tf), cfg.data.batch_size_val,
                      num_workers=cfg.data.num_workers,
                      shard_index=shard, shard_count=nshards)


@DATALOADER.register(name="seg")
def build_seg_dataloaders(cfg) -> Dict[str, Any]:
    val = []
    if cfg.data.enable_valid:
        val = [build_seg_valid_loader(cfg, n) for n in cfg.data.valid_name]
    return dict(val=val)


@DATALOADER.register(name="imagenet_local")
def build_imagenet_dataloaders(cfg) -> Dict[str, Any]:
    shard, nshards = _process_shard()
    train_tf = build_transforms(cfg, "train")
    valid_tf = build_transforms(cfg, "valid")
    root = cfg.data.data_path
    train_ds = ImageFolderDataset(os.path.join(root, "train"), train_tf)
    val_ds = ImageFolderDataset(os.path.join(root, "val"), valid_tf)
    train = DataLoader(train_ds, cfg.data.batch_size // nshards, shuffle=True,
                       drop_last=True, num_workers=cfg.data.num_workers,
                       shard_index=shard, shard_count=nshards,
                       pad_shards=True)
    # single_eval semantics as in build_clip_dataloaders
    if cfg.data.get("single_eval", True):
        vshard, vnshards, bs_val = 0, 1, cfg.data.batch_size_val
    else:
        vshard, vnshards = shard, nshards
        bs_val = cfg.data.batch_size_val // nshards
    val = DataLoader(val_ds, bs_val,
                     num_workers=cfg.data.num_workers,
                     shard_index=vshard, shard_count=vnshards,
                     pad_shards=True)
    return dict(train=[train], train_dataset=None, val=[val])
