"""Standalone evaluation entry point.

Same CLI as the reference (/root/reference/test.py:21-37):
    python test.py --config config/refcoco/cris_r50.yaml \
        --opts TEST.test_split val-test TEST.test_lmdb <path>

Evaluates every sentence of every ref (reference engine.py:146-215) from
{output_dir}/best_model (orbax) or a converted torch best_model.pth,
batching (image, sentence) pairs on device instead of batch-1.
"""

import os

import jax

from cris_tpu import cli
from cris_tpu.checkpoint import BEST_NAME, restore_model
from cris_tpu.data import RefDataset
from cris_tpu.engine import Evaluator
from cris_tpu.parallel import make_param_shardings
from cris_tpu.utils import setup_logger
from cris_tpu.utils.logging import log_exceptions, logger


@log_exceptions
def main():
    cli.setup_compilation_cache()
    cfg = cli.get_parser("CRIS-TPU evaluation")
    cfg.output_dir = os.path.join(cfg.output_folder, cfg.exp_name)
    if cfg.get("visualize"):
        cfg.vis_dir = os.path.join(cfg.output_dir, "vis")
        os.makedirs(cfg.vis_dir, exist_ok=True)

    setup_logger(cfg.output_dir, process_index=0, filename="test.log", mode="a")
    logger.info(cfg)

    test_data = RefDataset(
        cfg.test_lmdb, cfg.mask_root, cfg.dataset, cfg.test_split,
        "test", cfg.input_size, cfg.word_len,
    )

    mesh = cli.make_mesh_from_cfg(cfg)
    model, variables = cli.build_model_and_variables(cfg, load_clip=False)

    # load best checkpoint: orbax dir, or a reference-format .pth
    orbax_path = os.path.join(cfg.output_dir, BEST_NAME)
    torch_path = os.path.join(cfg.output_dir, "best_model.pth")
    if os.path.isdir(orbax_path):
        logger.info(f"=> loading checkpoint '{orbax_path}'")
        variables = restore_model(
            orbax_path,
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )
    elif os.path.isfile(torch_path):
        from cris_tpu.checkpoint import load_cris_checkpoint

        logger.info(f"=> loading torch checkpoint '{torch_path}'")
        variables, _ = load_cris_checkpoint(torch_path, cfg.num_layers)
    else:
        raise ValueError(
            f"=> no checkpoint found at '{orbax_path}' or '{torch_path}'"
        )

    if cfg.get("fold_bn_eval", True):
        # fold BN affines into conv weights: exact rewrite, removes a full
        # elementwise pass per conv at inference
        import dataclasses

        import numpy as np

        from cris_tpu.checkpoint import fold_batchnorm

        logger.info("=> folding BatchNorm into conv weights for inference")
        model = dataclasses.replace(model, fold_bn=True, scan_unroll=0,
                                    pos_grid=cfg.input_size // 32)
        variables = fold_batchnorm(
            jax.tree_util.tree_map(np.asarray, variables),
            input_resolution=cfg.input_size,
        )

    # static int8: attach calibrated activation scales when present
    # (tools/quantize.py writes them; without the file the int8 mode
    # falls back to dynamic per-tensor quantization)
    quant_path = os.path.join(cfg.output_dir, "quant_scales.npz")
    if (str(cfg.get("precision", "bf16")).lower() == "int8"
            and os.path.isfile(quant_path)):
        from cris_tpu.checkpoint import load_act_scales

        logger.info(f"=> static int8 activation scales '{quant_path}'")
        variables = {**variables, "quant": load_act_scales(quant_path)}

    variables = jax.device_put(variables, make_param_shardings(mesh, variables))
    evaluator = Evaluator(
        model, cfg.input_size, mesh, cfg.get("batch_size_val", 32)
    )
    evaluator.inference(
        test_data,
        variables,
        word_len=cfg.word_len,
        visualize=bool(cfg.get("visualize")),
        vis_dir=cfg.get("vis_dir"),
    )


if __name__ == "__main__":
    main()
