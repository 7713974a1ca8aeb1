"""Offline torch -> orbax weight conversion.

Converts released weights once so training/eval starts don't pay the torch
load + remap cost:
- OpenAI CLIP TorchScript archives (RN50.pt / RN101.pt) -> a CRIS 'weight'
  checkpoint with fresh heads (pass --config to size the heads), or
- trained CRIS .pth checkpoints -> a best_model-style orbax directory
  loadable by test.py.

  python tools/convert_weights.py --config config/refcoco/cris_r50.yaml \
      --torch exp/refcoco/CRIS_R50/best_model.pth \
      --out exp/refcoco/CRIS_R50/best_model
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from cris_tpu import cli
from cris_tpu.checkpoint import save_checkpoint
from cris_tpu.utils import config as config_lib
from cris_tpu.utils.logging import logger, setup_logger


def main():
    parser = argparse.ArgumentParser(description="torch -> orbax converter")
    parser.add_argument("--config", required=True, type=str)
    parser.add_argument("--torch", required=True, type=str,
                        help="RN50.pt/RN101.pt TorchScript or CRIS .pth")
    parser.add_argument("--out", required=True, type=str,
                        help="output checkpoint directory")
    args = parser.parse_args()
    setup_logger(None)

    cfg = config_lib.load_cfg_from_cfg_file(args.config)

    import torch

    is_torchscript = True
    try:
        torch.jit.load(args.torch, map_location="cpu")
    except Exception:
        is_torchscript = False

    if is_torchscript:
        # CLIP backbone + fresh heads
        cfg.clip_pretrain = args.torch
        _, variables = cli.build_model_and_variables(cfg)
    else:
        from cris_tpu.checkpoint import load_cris_checkpoint

        logger.info(f"=> converting trained CRIS checkpoint '{args.torch}'")
        variables, _ = load_cris_checkpoint(args.torch, cfg.num_layers)

    variables = {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
    }
    out_dir, name = osp.split(osp.abspath(args.out.rstrip("/")))
    path = save_checkpoint(out_dir, name, variables)
    n_params = sum(
        np.prod(x.shape)
        for x in __import__("jax").tree_util.tree_leaves(variables["params"])
    )
    logger.info(f"wrote {path} ({n_params/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
