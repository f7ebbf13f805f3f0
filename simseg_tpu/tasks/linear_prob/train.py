"""Linear-probe training entry point.

Parity: reference ``simseg/tasks/linear_prob/train.py:38-59``.
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
from simseg_tpu.tasks.linear_prob.config import task_cfg_init_fn, update_linear_config
from simseg_tpu.utils.logger import logger


def parse_args():
    parser = argparse.ArgumentParser(description="SimSeg-TPU linear probing")
    parser.add_argument("--cfg", type=str, required=True)
    args, overrides = parser.parse_known_args()
    update_cfg(task_cfg_init_fn, args.cfg, overrides,
               preprocess_fn=update_linear_config)
    return args


def main():
    parse_args()

    from simseg_tpu.parallel import init_distributed, make_mesh

    init_distributed()
    mesh = make_mesh()
    logger.emph(f"Mesh: {mesh}")

    from simseg_tpu.core.runner import LinearProbRunner
    from simseg_tpu.data.datasets import build_imagenet_dataloaders
    from simseg_tpu.models.linear_prob import build_linear_prob_model

    model = build_linear_prob_model(cfg)
    loaders = build_imagenet_dataloaders(cfg)
    runner = LinearProbRunner(cfg, model, loaders, mesh=mesh)
    runner.run()


if __name__ == "__main__":
    main()
