"""Dataset converter parity checks."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools/convert_datasets")


def test_coco_mapping_matches_reference_table():
    """The derived mapping must equal the reference's hardcoded 182-entry
    table after the GroupViT shift (coco_stuff164k.py:14-193)."""
    from coco_stuff164k import build_clsid_to_trid, UNUSED_IDS

    got = build_clsid_to_trid()
    # reconstruct the pre-shift contiguous table the reference hardcodes
    pre = {}
    tr = 0
    for cls in range(182):
        if cls in UNUSED_IDS:
            continue
        pre[cls] = tr
        tr += 1
    pre[255] = 255
    assert tr == 171  # 171 contiguous train ids before the shift
    # thing classes 1..90 keep +1 ids; stuff > 90 folds to 0
    for k, v in pre.items():
        if k == 255:
            assert got[k] == 255
        elif k > 90:
            assert got[k] == 0
        else:
            assert got[k] == v + 1
    # spot checks against the reference's literal table (raw 90 is one of
    # the 11 unused holes; raw 89 -> train 79 -> shifted 80)
    assert got[0] == 1 and got[1] == 2 and got[12] == 12 and got[89] == 80
    assert got[91] == 0 and got[181] == 0 and 90 not in got


def test_coco_lut_roundtrip(tmp_path):
    from coco_stuff164k import CLSID_TO_TRID, convert_to_trainid
    from PIL import Image
    import os

    os.makedirs(tmp_path / "out" / "val2017")
    raw = np.array([[0, 1, 91], [181, 255, 89]], dtype=np.uint8)
    Image.fromarray(raw).save(tmp_path / "m.png")
    convert_to_trainid(str(tmp_path / "m.png"), str(tmp_path / "out"), False)
    out = np.asarray(Image.open(tmp_path / "out" / "val2017" / "m_labelTrainIds.png"))
    want = np.vectorize(CLSID_TO_TRID.get)(raw)
    np.testing.assert_array_equal(out, want)


def test_rle_decode_uncompressed():
    from pascal_context import rle_decode

    # 2x3 mask, column-major: cols [(1,0),(0,1),(1,1)]
    mask = rle_decode({"counts": [0, 1, 2, 3], "size": [2, 3]}, 2, 3)
    flat_colmajor = np.array([1, 0, 0, 1, 1, 1], dtype=bool)
    np.testing.assert_array_equal(mask.T.ravel(), flat_colmajor)


def test_rle_decode_compressed_matches_pycocotools_format():
    """Encode a random mask with our own understanding of the LEB128 format
    and check the decode round-trips (format per pycocotools rleToString)."""
    from pascal_context import rle_decode

    rng = np.random.default_rng(0)
    mask = rng.random((13, 7)) > 0.6

    # build counts (column-major)
    flat = mask.T.ravel()
    counts, prev, run = [], False, 0
    for v in flat:
        if v == prev:
            run += 1
        else:
            counts.append(run)
            prev, run = v, 1
    counts.append(run)

    # encode per pycocotools rleToString (difference coding from 3rd entry)
    s = bytearray()
    for i, c in enumerate(counts):
        x = int(c)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            ch = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (ch & 0x10)) or (x == -1 and (ch & 0x10)))
            if more:
                ch |= 0x20
            s.append(ch + 48)
    decoded = rle_decode({"counts": bytes(s), "size": [13, 7]}, 13, 7)
    np.testing.assert_array_equal(decoded, mask)


def test_class_to_index():
    from pascal_context import _MAPPING, class_to_index

    mask = np.array([[0, 2, 9], [415, 459, 0]])
    mask[1, 1] = int(_MAPPING[-1])  # highest valid id
    out = class_to_index(mask)
    assert out[0, 0] == 0
    assert out[0, 1] == list(_MAPPING).index(2)
    assert out.dtype == np.uint8
