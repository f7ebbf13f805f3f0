import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.utils.metrics import (
    intersect_and_union,
    mean_iou,
    miou_from_totals,
    topk_accuracy,
)
from simseg_tpu.utils.prompts import IMAGENET_TEMPLATES, openai_imagenet_template
from simseg_tpu.utils.registry import Registry, build_from_cfg
from simseg_tpu.parallel import make_mesh, shard_batch, local_batch_size


def test_registry():
    R = Registry("TEST")

    @R.register
    def thing(cfg, scale=1):
        return cfg["x"] * scale

    @R.register(name="alias")
    def other(cfg):
        return -cfg["x"]

    assert build_from_cfg("thing", {"x": 3}, R, scale=2) == 6
    assert build_from_cfg("alias", {"x": 3}, R) == -3
    with pytest.raises(KeyError):
        R.get("missing")
    with pytest.raises(KeyError):
        R.register(thing)


def test_prompt_bank():
    assert len(IMAGENET_TEMPLATES) == 80
    out = openai_imagenet_template("dog")
    assert len(out) == 80
    assert out[39] == "a photo of a dog."
    assert all("{}" not in t for t in out)


def test_intersect_and_union_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 5, size=(31, 47))
    label = rng.integers(0, 5, size=(31, 47))
    label[0, :10] = 255  # ignore region
    i, u, p, l = jax.jit(intersect_and_union, static_argnums=(2, 3))(
        jnp.asarray(pred), jnp.asarray(label), 5, 255
    )
    valid = label != 255
    for c in range(5):
        np_i = np.sum((pred == c) & (label == c) & valid)
        np_p = np.sum((pred == c) & valid)
        np_l = np.sum((label == c) & valid)
        assert int(i[c]) == np_i
        assert int(p[c]) == np_p
        assert int(l[c]) == np_l
        assert int(u[c]) == np_p + np_l - np_i


def test_intersect_and_union_label_map_and_reduce_zero():
    """label_map applies sequentially on the mutated map (the reference's
    in-place loop, metrics.py:55-57: {1: 2, 2: 3} sends original 1s all the
    way to 3) and reduce_zero_label shifts ids down with 0/255 ignored
    (metrics.py:58-61)."""
    rng = np.random.default_rng(1)
    pred = rng.integers(0, 4, size=(13, 17))
    label = rng.integers(0, 5, size=(13, 17))
    label[0, :5] = 255

    # numpy re-derivation of the reference's exact in-place semantics
    def ref(label, label_map, reduce_zero):
        lab = label.copy()
        for old, new in label_map:
            lab[lab == old] = new
        if reduce_zero:
            lab[lab == 0] = 255
            lab = lab - 1
            lab[lab == 254] = 255
        return lab

    for lmap, rz in [(((1, 2), (2, 3)), False), ((), True),
                     (((4, 1),), True)]:
        lab_ref = ref(label, lmap, rz)
        valid = lab_ref != 255
        i, u, p, l = intersect_and_union(
            jnp.asarray(pred), jnp.asarray(label), 4, 255,
            label_map=lmap, reduce_zero_label=rz)
        for c in range(4):
            assert int(i[c]) == np.sum((pred == c) & (lab_ref == c) & valid)
            assert int(l[c]) == np.sum((lab_ref == c) & valid)

    # dict form through mean_iou (insertion order = application order)
    ti, tu = mean_iou([pred], [label], num_classes=4, ignore_index=255,
                      label_map={1: 2, 2: 3}, reduce_zero_label=False)
    lab_ref = ref(label, ((1, 2), (2, 3)), False)
    valid = lab_ref != 255
    for c in range(4):
        want_i = np.sum((pred == c) & (lab_ref == c) & valid)
        want_u = (np.sum((pred == c) & valid)
                  + np.sum((lab_ref == c) & valid) - want_i)
        assert ti[c] == want_i and tu[c] == want_u


def test_mean_iou_perfect_prediction():
    label = np.tile(np.arange(4, dtype=np.int32), (8, 1))
    ti, tu = mean_iou([label], [label], num_classes=4, ignore_index=255)
    iou, m = miou_from_totals(ti, tu)
    assert np.allclose(iou, 1.0)
    assert m == 1.0


def test_miou_nan_classes_skipped():
    # class 3 never appears: IoU nan, excluded from the mean
    label = np.zeros((4, 4), dtype=np.int32)
    pred = np.zeros((4, 4), dtype=np.int32)
    pred[0, 0] = 1
    label[0, 0] = 1
    ti, tu = mean_iou([pred], [label], num_classes=4, ignore_index=255)
    iou, m = miou_from_totals(ti, tu)
    assert np.isnan(iou[2]) and np.isnan(iou[3])
    assert m == 1.0


def test_download_helpers(tmp_path):
    """file:// URLs exercise the real urllib path without network egress
    (parity: misc.py:416-436 download / download_to_local_file)."""
    from simseg_tpu.utils.misc import download, download_to_local_file

    src = tmp_path / "payload.bin"
    src.write_bytes(b"hello-bytes")
    url = src.as_uri()
    assert download(url) == b"hello-bytes"
    dst = tmp_path / "out.bin"
    download_to_local_file(url, str(dst))
    assert dst.read_bytes() == b"hello-bytes"
    with pytest.raises(RuntimeError):
        download((tmp_path / "missing.bin").as_uri(), retry=2)


def test_topk_accuracy():
    logits = jnp.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    targets = jnp.array([1, 0, 0])
    acc1, acc2 = topk_accuracy(logits, targets, ks=(1, 2))
    assert float(acc1) == pytest.approx(2 / 3)
    assert float(acc2) == pytest.approx(2 / 3)


def test_mesh_and_sharding():
    assert len(jax.devices()) == 8
    mesh = make_mesh()
    assert mesh.axis_names == ("data",)
    assert local_batch_size(16, mesh) == 2

    grouped = make_mesh(group_size=4)
    assert grouped.axis_names == ("replica", "data")
    assert grouped.devices.shape == (2, 4)

    batch = {"x": np.arange(16.0).reshape(16, 1)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding.is_fully_addressable
    np.testing.assert_allclose(np.asarray(sharded["x"]), batch["x"])

    with pytest.raises(ValueError):
        make_mesh(group_size=3)
    with pytest.raises(ValueError):
        local_batch_size(17, mesh)


def test_loss_group_samples_unit_conversion():
    """cfg.loss.group_size is DEVICES per gather group (the reference's
    generate_local_groups unit); the fused-batch loss needs SAMPLES per
    group — one contiguous block per device group."""
    from simseg_tpu.parallel.mesh import loss_group_samples

    # 8 devices, groups of 4 -> 2 groups; batch 16 -> blocks of 8 samples
    grouped = make_mesh(group_size=4)
    assert loss_group_samples(grouped, 16) == 8
    # plain data mesh (group_size <= 0 or world-sized): global negatives
    assert loss_group_samples(make_mesh(), 16) == -1
    with pytest.raises(ValueError):
        loss_group_samples(grouped, 15)  # not divisible into 2 groups
