"""Single-image inference: image + referring expression -> mask.

A serving-style convenience the reference lacks: loads a trained
checkpoint once, then segments one (image, sentence) pair per invocation
(or a whole --sentences list in a single batch), writing the binary mask
and an overlay visualization.

  python tools/predict.py --config config/refcoco/cris_r50.yaml \
      --image photo.jpg --sent "the man in the red shirt" \
      --out mask.png [--overlay overlay.jpg] [--checkpoint path]
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np

from cris_tpu import cli
from cris_tpu.checkpoint import BEST_NAME, restore_model
from cris_tpu.data.transforms import (
    get_transform_mats,
    inverse_warp_prediction,
    normalize_image,
    warp_image,
)
from cris_tpu.engine import EVAL_THRESHOLD, Evaluator
from cris_tpu.utils import setup_logger, tokenize
from cris_tpu.utils.logging import logger


def load_variables(cfg, model_dir):
    model, variables = cli.build_model_and_variables(cfg, load_clip=False)
    orbax_path = osp.join(model_dir, BEST_NAME)
    torch_path = osp.join(model_dir, "best_model.pth")
    if osp.isdir(orbax_path):
        variables = restore_model(
            orbax_path,
            {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        )
    elif osp.isfile(torch_path):
        from cris_tpu.checkpoint import load_cris_checkpoint

        variables, _ = load_cris_checkpoint(torch_path, cfg.num_layers)
    else:
        logger.warning(
            f"no checkpoint under '{model_dir}' -- using random weights"
        )
    return model, variables


def main():
    parser = argparse.ArgumentParser(description="CRIS-TPU single-image predict")
    parser.add_argument("--config", required=True)
    parser.add_argument("--image", required=True)
    parser.add_argument("--sent", action="append", required=True,
                        help="referring expression (repeatable)")
    parser.add_argument("--out", default="mask.png")
    parser.add_argument("--overlay", default="")
    parser.add_argument("--checkpoint", default="",
                        help="checkpoint dir (default {output_dir})")
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from cris_tpu.utils import config as config_lib

    cfg = config_lib.load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = config_lib.merge_cfg_from_list(cfg, args.opts)
    setup_logger(None)

    model_dir = args.checkpoint or osp.join(cfg.output_folder, cfg.exp_name)
    model, variables = load_variables(cfg, model_dir)

    bgr = cv2.imread(args.image, cv2.IMREAD_COLOR)
    if bgr is None:
        raise SystemExit(f"cannot read image {args.image}")
    rgb = bgr[:, :, ::-1]
    hw = (cfg.input_size, cfg.input_size)
    mat, inv = get_transform_mats(rgb.shape[:2], hw)
    net_in = normalize_image(warp_image(rgb, mat, hw))

    sents = args.sent
    words = tokenize(sents, cfg.word_len, True)
    images = np.repeat(net_in[None], len(sents), axis=0)

    evaluator = Evaluator(model, cfg.input_size, batch_size=len(sents))
    probs = evaluator.predict_probs(variables, images, words)

    base, ext = osp.splitext(args.out)
    for i, sent in enumerate(sents):
        warped = inverse_warp_prediction(probs[i], inv, rgb.shape[:2])
        mask = (warped > EVAL_THRESHOLD).astype(np.uint8) * 255
        out = args.out if len(sents) == 1 else f"{base}_{i}{ext}"
        cv2.imwrite(out, mask)
        logger.info(f"[{sent!r}] mask -> {out} "
                    f"({int(mask.sum() / 255)} px foreground)")
        if args.overlay:
            ov_base, ov_ext = osp.splitext(args.overlay)
            overlay = bgr.copy()
            overlay[mask > 0] = (
                0.5 * overlay[mask > 0] + 0.5 * np.array([0, 0, 255])
            ).astype(np.uint8)
            ov = args.overlay if len(sents) == 1 else f"{ov_base}_{i}{ov_ext}"
            cv2.imwrite(ov, overlay)
            logger.info(f"[{sent!r}] overlay -> {ov}")


if __name__ == "__main__":
    main()
