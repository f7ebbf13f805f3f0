"""COCO-Stuff 164k annotation converter (offline, numpy/PIL only).

Parity: reference ``tools/convert_datasets/coco_stuff164k.py`` — maps the
raw COCO-Stuff label ids to contiguous train ids, then applies the GroupViT
setting (:189-193): every id is shifted +1 and all stuff classes (raw id >
90) are folded into background 0, leaving 80 thing classes + background.

The reference hardcodes the 182-entry mapping table; here it is derived:
raw ids 0..181 minus the 11 ids unused by COCO detection
({11,25,28,29,44,65,67,68,70,82,90}) map to a contiguous range, 255 stays
255. A self-check reproduces the reference table exactly (see
tests/test_converters.py).
"""

import argparse
import os
import os.path as osp
import shutil
from functools import partial
from glob import glob
from multiprocessing import Pool

import numpy as np
from PIL import Image

COCO_LEN = 123287

# COCO detection ids absent from the 0..181 range (the famous 11 holes)
UNUSED_IDS = {11, 25, 28, 29, 44, 65, 67, 68, 70, 82, 90}


def build_clsid_to_trid() -> dict:
    mapping = {}
    tr = 0
    for cls in range(182):
        if cls in UNUSED_IDS:
            continue
        mapping[cls] = tr
        tr += 1
    mapping[255] = 255
    # GroupViT setting: +1 shift, stuff (raw id > 90) -> background 0
    out = {}
    for k, v in mapping.items():
        out[k] = 0 if k > 90 and k != 255 else (v + 1 if k != 255 else 255)
    return out


CLSID_TO_TRID = build_clsid_to_trid()

_LUT = np.full(256, 255, dtype=np.uint8)
for _k, _v in CLSID_TO_TRID.items():
    _LUT[_k] = _v


def convert_to_trainid(maskpath: str, out_mask_dir: str, is_train: bool) -> None:
    mask = np.asarray(Image.open(maskpath))
    converted = _LUT[mask]
    split = "train2017" if is_train else "val2017"
    name = osp.basename(maskpath).split(".")[0] + "_labelTrainIds.png"
    Image.fromarray(converted).save(osp.join(out_mask_dir, split, name), "PNG")


def main():
    parser = argparse.ArgumentParser(
        description="Convert COCO-Stuff 164k annotations to train ids"
    )
    parser.add_argument("coco_path")
    parser.add_argument("-o", "--out_dir")
    parser.add_argument("--nproc", default=16, type=int)
    args = parser.parse_args()

    out_dir = args.out_dir or args.coco_path
    out_mask_dir = osp.join(out_dir, "annotations")
    os.makedirs(osp.join(out_mask_dir, "train2017"), exist_ok=True)
    os.makedirs(osp.join(out_mask_dir, "val2017"), exist_ok=True)
    if out_dir != args.coco_path:
        shutil.copytree(
            osp.join(args.coco_path, "images"), osp.join(out_dir, "images"),
            dirs_exist_ok=True,
        )

    train_list = [
        f for f in glob(osp.join(args.coco_path, "annotations", "train2017", "*.png"))
        if "_labelTrainIds" not in f
    ]
    val_list = [
        f for f in glob(osp.join(args.coco_path, "annotations", "val2017", "*.png"))
        if "_labelTrainIds" not in f
    ]
    if len(train_list) + len(val_list) != COCO_LEN:
        print(f"warning: expected {COCO_LEN} masks, found "
              f"{len(train_list) + len(val_list)}")

    with Pool(args.nproc) as pool:
        pool.map(partial(convert_to_trainid, out_mask_dir=out_mask_dir,
                         is_train=True), train_list)
        pool.map(partial(convert_to_trainid, out_mask_dir=out_mask_dir,
                         is_train=False), val_list)
    print("Done!")


if __name__ == "__main__":
    main()
