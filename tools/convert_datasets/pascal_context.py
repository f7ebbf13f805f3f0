"""PASCAL-Context annotation converter (offline, numpy/PIL only).

Parity: reference ``tools/convert_datasets/pascal_context.py`` — renders the
60-class PASCAL-Context train-id masks from the Detail API's
``trainval_merged.json`` and writes the SegmentationContext split lists. The
reference depends on the Detail API + mmcv; this version parses the JSON and
decodes the COCO-style RLE segmentations directly.

The 59 Detail category ids retained (+0 for everything else) are the
standard pascal-context-59 selection; ``np.digitize`` over the sorted id
list reproduces the reference's _class_to_index (:11-29).
"""

import argparse
import json
import os
import os.path as osp
from collections import defaultdict

import numpy as np
from PIL import Image

# the 59 retained Detail category ids + 0 (reference :11-17)
_MAPPING = np.sort(np.array([
    0, 2, 259, 260, 415, 324, 9, 258, 144, 18, 19, 22, 23, 397, 25, 284,
    158, 159, 416, 33, 162, 420, 454, 295, 296, 427, 44, 45, 46, 308, 59,
    440, 445, 31, 232, 65, 354, 424, 68, 326, 72, 458, 34, 207, 80, 355,
    85, 347, 220, 349, 360, 98, 187, 104, 105, 366, 189, 368, 113, 115
]))
_KEY = np.arange(len(_MAPPING)).astype("uint8")


def rle_decode(rle, h, w) -> np.ndarray:
    """Decode COCO RLE (uncompressed count list or compressed LEB128 string)
    to a (h, w) bool mask (column-major order, as in pycocotools)."""
    counts = rle["counts"] if isinstance(rle, dict) else rle
    if isinstance(counts, str):
        counts = counts.encode("ascii")
    if isinstance(counts, (bytes, bytearray)):
        # pycocotools compressed RLE
        decoded = []
        i, prev = 0, 0
        while i < len(counts):
            x, k, more = 0, 0, True
            while more:
                c = counts[i] - 48
                x |= (c & 0x1F) << (5 * k)
                more = bool(c & 0x20)
                i += 1
                k += 1
            if x & (1 << (5 * k - 1)):  # sign-extend
                x -= 1 << (5 * k)
            if len(decoded) > 2:
                x += decoded[-2]
            decoded.append(x)
        counts = decoded
    flat = np.zeros(h * w, dtype=bool)
    pos, val = 0, False
    for c in counts:
        if val:
            flat[pos:pos + c] = True
        pos += c
        val = not val
    return flat.reshape(w, h).T  # column-major


def class_to_index(mask: np.ndarray) -> np.ndarray:
    values = np.unique(mask)
    for v in values:
        assert v in _MAPPING, f"unexpected category id {v}"
    index = np.digitize(mask.ravel(), _MAPPING, right=True)
    return _KEY[index].reshape(mask.shape)


def main():
    parser = argparse.ArgumentParser(
        description="Convert PASCAL-Context annotations to 60-class masks"
    )
    parser.add_argument("devkit_path")
    parser.add_argument("json_path", help="trainval_merged.json")
    parser.add_argument("-o", "--out_dir")
    args = parser.parse_args()

    out_dir = args.out_dir or osp.join(
        args.devkit_path, "VOC2010", "SegmentationClassContext"
    )
    os.makedirs(out_dir, exist_ok=True)
    split_dir = osp.join(args.devkit_path, "VOC2010", "ImageSets",
                         "SegmentationContext")
    os.makedirs(split_dir, exist_ok=True)

    with open(args.json_path) as f:
        detail = json.load(f)

    images = {im["image_id"] if "image_id" in im else im["id"]: im
              for im in detail["images"]}
    anns_by_image = defaultdict(list)
    for ann in detail.get("annos_segmentation", detail.get("annotations", [])):
        anns_by_image[ann["image_id"]].append(ann)

    split_lists = defaultdict(list)
    keep = set(int(x) for x in _MAPPING)
    for img_id, im in sorted(images.items()):
        phase = im.get("phase", "train")
        h, w = im["height"], im["width"]
        mask = np.zeros((h, w), dtype=np.int32)
        for ann in anns_by_image.get(img_id, []):
            cat = ann["category_id"]
            m = rle_decode(ann["segmentation"], h, w)
            mask[m] = cat
        mask[~np.isin(mask, list(keep))] = 0
        out = class_to_index(mask)
        stem = osp.splitext(osp.basename(im["file_name"]))[0]
        Image.fromarray(out).save(osp.join(out_dir, stem + ".png"))
        split_lists[phase].append(stem)

    for phase, names in split_lists.items():
        with open(osp.join(split_dir, f"{phase}.txt"), "w") as f:
            f.writelines(n + "\n" for n in sorted(names))
    print("Done!")


if __name__ == "__main__":
    main()
