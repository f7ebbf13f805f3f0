"""Packaging surface: packaged label banks stay in sync with the
reference-parity copies at the repo root, and load_label_bank falls back
to the packaged copy when the data_root has none."""

import os

import simseg_tpu
from simseg_tpu.tasks.seg_eval import load_label_bank

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.dirname(os.path.abspath(simseg_tpu.__file__))

BANKS = ["pascal_voc", "pascal_context", "coco_stuff"]


def test_packaged_banks_match_root_copies():
    for name in BANKS:
        root = open(os.path.join(REPO, "data", "label_category",
                                 f"{name}.txt")).read()
        packaged = open(os.path.join(PKG, "data", "label_category",
                                     f"{name}.txt")).read()
        assert root == packaged, f"label bank drift: {name}"


def test_load_label_bank_packaged_fallback(tmp_path):
    # a data_root with no label_category dir: the packaged copy serves
    bank = load_label_bank("pascal_voc", data_root=str(tmp_path))
    assert bank[0] == "background" and len(bank) == 21


def test_load_label_bank_prefers_data_root(tmp_path):
    d = tmp_path / "label_category"
    d.mkdir()
    (d / "pascal_voc.txt").write_text("background\ncustom\n")
    bank = load_label_bank("pascal_voc", data_root=str(tmp_path))
    assert bank == ["background", "custom"]


def test_version_is_dynamic_from_package():
    # pyproject must source the version from simseg_tpu.__version__ (no
    # second hardcoded literal to drift; see the 0.1.0/0.3.0 divergence
    # this replaced)
    text = open(os.path.join(REPO, "pyproject.toml")).read()
    assert 'dynamic = ["version"]' in text
    assert 'version = { attr = "simseg_tpu.__version__" }' in text
    assert not any(
        line.startswith('version = "') for line in text.splitlines()
    )
