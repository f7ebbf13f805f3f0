"""CLIP pretraining entry point.

Parity: reference ``simseg/tasks/clip/train.py:40-67`` — parse args ->
update_cfg -> device init -> build pipeline + dataloaders -> pick runner by
``cfg.runner.name`` ('clip' or 'clip_bsgs') -> run. Device init on TPU is
``jax.distributed`` + mesh construction instead of NCCL process groups.
"""

import argparse
import os
import sys

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))),
)

from simseg_tpu.config import cfg, update_cfg
from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config
from simseg_tpu.utils.logger import logger


def parse_args():
    parser = argparse.ArgumentParser(description="SimSeg-TPU CLIP pretraining")
    parser.add_argument("--cfg", type=str, required=True,
                        help="experiment configure file name")
    parser.add_argument("--vocab_file", type=str, default="")
    args, overrides = parser.parse_known_args()
    update_cfg(task_cfg_init_fn, args.cfg, overrides,
               preprocess_fn=update_clip_config)
    return args


def main():
    args = parse_args()

    from simseg_tpu.parallel import init_distributed, make_mesh

    init_distributed()
    mesh = make_mesh(group_size=cfg.loss.get("group_size", -1),
                     tp_size=cfg.dist.get("tp_size", 1),
                     pp_size=cfg.dist.get("pp_size", 1))
    logger.emph(f"Mesh: {mesh}")

    from simseg_tpu.core.runner import CLIPRunner
    from simseg_tpu.data.datasets import build_clip_dataloaders
    from simseg_tpu.data.tokenizer import build_tokenizer
    from simseg_tpu.models.clip import build_clip_model

    tokenizer = build_tokenizer(
        cfg.model.text_encoder.tag, vocab_file=args.vocab_file or None
    )
    model = build_clip_model(cfg, mesh=mesh)
    loaders = build_clip_dataloaders(cfg, tokenizer=tokenizer)

    if cfg.runner.name not in ("clip", "clip_bsgs"):
        raise NotImplementedError(f"runner '{cfg.runner.name}'")
    runner = CLIPRunner(cfg, model, loaders, mesh=mesh)
    runner.run()


if __name__ == "__main__":
    main()
