import pytest

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.utils.collections import AttrDict


def seed_fn(cfg):
    cfg.model.name = "clip"
    cfg.model.pool = AttrDict()
    cfg.model.pool.name = "loda"
    cfg.data.valid_name = ["f30k"]
    cfg.optim.lr.init = 1e-4
    cfg.loss = AttrDict()
    cfg.loss.temperature = AttrDict()
    cfg.loss.temperature.value = 0.02


def test_attrdict_basics():
    d = AttrDict()
    d.a = 1
    d.b = {"c": 2}
    assert d["a"] == 1 and d.b.c == 2
    d.set_immutable(True)
    with pytest.raises(AttributeError):
        d.a = 3
    with pytest.raises(AttributeError):
        d.b.c = 4
    d.set_immutable(False)
    d.a = 3
    assert d.a == 3


def test_yaml_merge_strict(tmp_path):
    y = tmp_path / "c.yaml"
    y.write_text("model:\n  name: clip2\noptim:\n  lr:\n    init: 2.0e-4\n")
    cfg = update_cfg(seed_fn, str(y), target=new_base_cfg())
    assert cfg.model.name == "clip2"
    assert cfg.optim.lr.init == 2e-4
    assert cfg.is_immutable

    bad = tmp_path / "bad.yaml"
    bad.write_text("nonexistent_key: 1\n")
    with pytest.raises(KeyError):
        update_cfg(seed_fn, str(bad), target=new_base_cfg())


def test_cli_overrides():
    cfg = update_cfg(
        seed_fn,
        None,
        argv=[
            "optim.lr.init=3e-4",
            "data.valid_name=[pascal_voc,coco_stuff]",
            "model.pool.name=avg",
            "loss.temperature.value=0.05",
            "epoch=7",
        ],
        target=new_base_cfg(),
    )
    assert cfg.optim.lr.init == 3e-4
    assert cfg.data.valid_name == ["pascal_voc", "coco_stuff"]
    assert cfg.model.pool.name == "avg"
    assert cfg.loss.temperature.value == 0.05
    assert cfg.epoch == 7

    with pytest.raises(KeyError):
        update_cfg(seed_fn, None, argv=["not.a.key=1"], target=new_base_cfg())


def test_type_coercion():
    def seed(cfg):
        cfg.data.flag = True
        cfg.data.ratio = 0.5
        cfg.data.pair = (1, 2)

    cfg = update_cfg(
        seed, None,
        argv=["data.flag=false", "data.ratio=1", "data.pair=[3,4]"],
        target=new_base_cfg(),
    )
    assert cfg.data.flag is False
    assert cfg.data.ratio == 1.0 and isinstance(cfg.data.ratio, float)
    assert cfg.data.pair == (3, 4)
