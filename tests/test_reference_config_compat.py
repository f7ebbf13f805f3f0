"""The reference's own YAML configs load verbatim (drop-in config compat)."""

import os

import pytest

from simseg_tpu.config import new_base_cfg, update_cfg

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_reference_clip_yamls_load():
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config

    for name, tag in [("simseg.vit-b.yaml", "vit_base_patch16_224_in21k"),
                      ("simseg.vit-s.yaml", "vit_small_patch16_224")]:
        cfg = update_cfg(
            task_cfg_init_fn, os.path.join(REF, "clip", name),
            preprocess_fn=update_clip_config, target=new_base_cfg(),
        )
        assert tag in cfg.model.image_encoder.tag
        assert cfg.model.pool.name == "loda"
        assert cfg.loss.temperature.name == "parameter"
        assert cfg.optim.lr.param["min_lr_scale"] == 0.1
        assert cfg.transforms.input_size == 288


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree not mounted")
def test_reference_linear_prob_yaml_loads():
    from simseg_tpu.tasks.linear_prob.config import (
        task_cfg_init_fn,
        update_linear_config,
    )

    cfg = update_cfg(
        task_cfg_init_fn, os.path.join(REF, "linear_prob", "imagenet.yaml"),
        preprocess_fn=update_linear_config, target=new_base_cfg(),
    )
    assert cfg.optim.name == "LARS"
    assert cfg.data.batch_size == 16384


def test_open_dict_semantics():
    """Param banks accept arbitrary keys from YAML/CLI; AttrDict trees stay
    strict."""
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "optim.param={'betas': (0.5, 0.9), 'custom_knob': 1}",
        "optim.lr.param.min_lr_scale=0.2",
        "dist.param.opt_level=O2",
    ], target=new_base_cfg())
    assert cfg.optim.param["custom_knob"] == 1
    assert cfg.optim.lr.param["min_lr_scale"] == 0.2
    assert cfg.dist.param["opt_level"] == "O2"

    with pytest.raises(KeyError):
        update_cfg(task_cfg_init_fn, None, argv=["model.not_a_key=1"],
                   target=new_base_cfg())
