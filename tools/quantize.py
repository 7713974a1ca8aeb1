"""Offline activation-scale calibration for the static int8 serving path.

Loads the experiment's best checkpoint exactly like test.py, folds BN,
runs calibration forwards over the configured val split (or synthetic
data when none is available), and writes
``{output_dir}/quant_scales.npz`` -- which test.py and serving pick up
automatically under ``precision: int8``.

    python tools/quantize.py --config config/refcoco/cris_r50.yaml \
        [--opts TEST.test_lmdb <uri> ...] [--batches 8] [--batch-size 16]

The static path beats dynamic quantization on TPU because the quantize
pass has no per-conv maxabs reduce and fuses into producer epilogues
(ops/quant.py:int8_conv2d_static).
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    # mirror cli.get_parser's surface but add the calibration knobs
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--min-ch", type=int, default=64,
                    help="quantize convs with min(cin, cout) >= this; 64 "
                    "measured fastest for the STATIC path on v5e (952.8 "
                    "vs 919.8 img/s at 128, tools/ab_int8.py); recorded "
                    "in the .npz so serving matches")
    ap.add_argument("--pooled-min-ch", type=int, default=256,
                    help="pooled/s2d conv sites quantize at min(cin, cout)"
                    " >= this (ops measured per family in "
                    "tools/bench_int8_more.py: 128->512 k2s2 loses, "
                    ">=256-min-ch pooled sites win); recorded in the .npz")
    ap.add_argument("--upfold-min-ch", type=int, default=256,
                    help="upsample-fold (lhs_dilated) conv sites quantize "
                    "at min(cin, cout) >= this; recorded in the .npz")
    ap.add_argument("--pct", type=float, default=0.0,
                    help="calibrate to this percentile of |x| instead of "
                    "maxabs (e.g. 99.9; outlier-robust, clips the tail)")
    ap.add_argument("--opts", nargs=argparse.REMAINDER, default=None)
    args = ap.parse_args()
    if args.pct:
        os.environ["CRIS_INT8_CALIB_PCT"] = str(args.pct)
    os.environ["CRIS_INT8_MIN_CH"] = str(args.min_ch)
    os.environ["CRIS_INT8_POOLED_MIN_CH"] = str(args.pooled_min_ch)
    os.environ["CRIS_INT8_UPFOLD_MIN_CH"] = str(args.upfold_min_ch)

    from cris_tpu import cli
    from cris_tpu.utils.config import (
        load_cfg_from_cfg_file, merge_cfg_from_list,
    )

    cli.setup_compilation_cache()
    cfg = load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = merge_cfg_from_list(cfg, args.opts)
    cfg.output_dir = os.path.join(cfg.output_folder, cfg.exp_name)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from cris_tpu.checkpoint import (
        BEST_NAME, fold_batchnorm, calibrate_act_scales, restore_model,
        save_act_scales,
    )

    model, variables = cli.build_model_and_variables(cfg, load_clip=False)

    orbax_path = os.path.join(cfg.output_dir, BEST_NAME)
    torch_path = os.path.join(cfg.output_dir, "best_model.pth")
    if os.path.isdir(orbax_path):
        print(f"=> loading checkpoint '{orbax_path}'", flush=True)
        variables = restore_model(
            orbax_path,
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )
    elif os.path.isfile(torch_path):
        from cris_tpu.checkpoint import load_cris_checkpoint

        print(f"=> loading torch checkpoint '{torch_path}'", flush=True)
        variables, _ = load_cris_checkpoint(torch_path, cfg.num_layers)
    else:
        raise ValueError(f"no checkpoint at '{orbax_path}' or '{torch_path}'")

    model = dataclasses.replace(
        model, fold_bn=True, scan_unroll=0, quant_int8=True,
        pos_grid=cfg.input_size // 32,
    )
    variables = fold_batchnorm(
        jax.tree_util.tree_map(np.asarray, variables),
        input_resolution=cfg.input_size,
    )

    # calibration batches: configured val split when available, else
    # synthetic noise at the CLIP input statistics
    batches = []
    try:
        from cris_tpu.data import RefDataset

        ds = RefDataset(
            cfg.val_lmdb, cfg.mask_root, cfg.dataset, cfg.val_split,
            "val", cfg.input_size, cfg.word_len,
        )
        idx = 0
        for _ in range(args.batches):
            imgs, words = [], []
            for _ in range(args.batch_size):
                item = ds[idx % len(ds)]
                idx += 1
                imgs.append(item["image"])
                words.append(item["word"])
            batches.append((jnp.asarray(np.stack(imgs)),
                            jnp.asarray(np.stack(words))))
        print(f"=> calibrating on {args.batches} x {args.batch_size} "
              f"val images", flush=True)
    except Exception as e:  # noqa: BLE001 -- fall back to synthetic
        print(f"=> val split unavailable ({e!r}); calibrating on "
              "synthetic inputs", flush=True)
        batches = []
        for i in range(args.batches):
            k = jax.random.PRNGKey(500 + i)
            ki, kw = jax.random.split(k)
            batches.append((
                jax.random.normal(
                    ki, (args.batch_size, cfg.input_size, cfg.input_size, 3),
                    jnp.float32),
                jax.random.randint(
                    kw, (args.batch_size, cfg.word_len), 1, 49000, jnp.int32),
            ))

    scales = calibrate_act_scales(model, variables, batches)
    out = os.path.join(cfg.output_dir, "quant_scales.npz")
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_act_scales(out, scales, min_ch=args.min_ch,
                    pooled_min_ch=args.pooled_min_ch,
                    upfold_min_ch=args.upfold_min_ch)
    n = len(jax.tree_util.tree_leaves(scales))
    print(f"=> wrote {n} activation scales to {out}", flush=True)


if __name__ == "__main__":
    main()
