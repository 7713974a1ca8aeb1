"""Turnkey released-checkpoint parity report vs BASELINE.md.

One command between "assets arrive" and "+-0.1 verified": given a config,
a trained CRIS checkpoint (reference-format .pth or our orbax dir) and the
prepared LMDB/RefPack shards + mask PNGs, evaluates every requested split
through the production eval path (all-sentences test protocol,
/root/reference/test.py:41-86 / engine/engine.py:146-215) and prints the
BASELINE.md table with diffs and a PASS/FAIL verdict at +-0.1 mIoU.

    python tools/parity_report.py --config config/refcoco/cris_r50.yaml \
        --ckpt exp/refcoco/CRIS_R50/best_model.pth \
        [--splits val testA testB] [--lmdb-root datasets/lmdb/refcoco] \
        [--mask-root datasets/masks/refcoco] [--json report.json]

Split LMDB paths default to <dirname(cfg.val_lmdb)>/<split>.lmdb (the
layout tools/prepare_datasets.md produces); --lmdb-root overrides the
directory. Runs on whatever platform jax selects (TPU under axon;
CRIS_PLATFORM=cpu forces CPU).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# README "Main Results" (/root/reference/README.md:27-48), IoU x100.
EXPECTED = {
    ("refcoco", "val", "RN50"): 69.52,
    ("refcoco", "testA", "RN50"): 72.72,
    ("refcoco", "testB", "RN50"): 64.70,
    ("refcoco", "val", "RN101"): 70.47,
    ("refcoco", "testA", "RN101"): 73.18,
    ("refcoco", "testB", "RN101"): 66.10,
    ("refcoco+", "val", "RN50"): 61.39,
    ("refcoco+", "testA", "RN50"): 67.10,
    ("refcoco+", "testB", "RN50"): 52.48,
    ("refcoco+", "val", "RN101"): 62.27,
    ("refcoco+", "testA", "RN101"): 68.08,
    ("refcoco+", "testB", "RN101"): 53.68,
    # G-Ref rows are the UMD split (the google partition has no test set)
    ("refcocog_u", "val", "RN50"): 59.35,
    ("refcocog_u", "test", "RN50"): 59.39,
    ("refcocog_u", "val", "RN101"): 59.87,
    ("refcocog_u", "test", "RN101"): 60.36,
}

DEFAULT_SPLITS = {
    "refcoco": ["val", "testA", "testB"],
    "refcoco+": ["val", "testA", "testB"],
    "refcocog_u": ["val", "test"],
    "refcocog_g": ["val"],
}


def backbone_name(cfg) -> str:
    """R50 and R101 CLIP differ in text width: word_dim 1024 vs 512
    (config/refcoco/cris_r50.yaml:13 vs cris_r101.yaml)."""
    return "RN50" if int(cfg.word_dim) == 1024 else "RN101"


def load_variables(cfg, ckpt: str):
    import jax
    import numpy as np

    from cris_tpu import cli
    from cris_tpu.checkpoint import load_cris_checkpoint, restore_model

    model, variables = cli.build_model_and_variables(cfg, load_clip=False)
    if os.path.isdir(ckpt):
        variables = restore_model(
            ckpt,
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
        )
    else:
        variables, _ = load_cris_checkpoint(ckpt, cfg.num_layers)

    if cfg.get("fold_bn_eval", True):
        import dataclasses

        from cris_tpu.checkpoint import fold_batchnorm

        model = dataclasses.replace(model, fold_bn=True, scan_unroll=0,
                                    pos_grid=cfg.input_size // 32)
        variables = fold_batchnorm(
            jax.tree_util.tree_map(np.asarray, variables),
            input_resolution=cfg.input_size,
        )
    return model, variables


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", required=True,
                    help=".pth (reference format) or orbax checkpoint dir")
    ap.add_argument("--splits", nargs="*", default=None)
    ap.add_argument("--lmdb-root", default=None,
                    help="directory holding <split>.lmdb / <split>.refpack")
    ap.add_argument("--mask-root", default=None)
    ap.add_argument("--tolerance", type=float, default=0.1)
    ap.add_argument("--json", dest="json_out", default=None)
    args = ap.parse_args(argv)

    from cris_tpu.data import RefDataset
    from cris_tpu.engine import Evaluator
    from cris_tpu.parallel import make_param_shardings, put_global
    from cris_tpu.utils.config import load_cfg_from_cfg_file
    from cris_tpu.utils.logging import logger, setup_logger

    cfg = load_cfg_from_cfg_file(args.config)
    setup_logger(None, process_index=0)
    backbone = backbone_name(cfg)
    splits = args.splits or DEFAULT_SPLITS.get(cfg.dataset, ["val"])
    lmdb_root = args.lmdb_root or os.path.dirname(cfg.val_lmdb)
    mask_root = args.mask_root or cfg.mask_root

    def split_uri(split: str) -> str:
        if "://" in lmdb_root:  # e.g. synthetic://N?seed=S (smoke tests)
            return lmdb_root
        for ext in (".lmdb", ".refpack"):
            path = os.path.join(lmdb_root, split + ext)
            if os.path.exists(path):
                return path
        return os.path.join(lmdb_root, split + ".lmdb")

    model, variables = load_variables(cfg, args.ckpt)

    from cris_tpu import cli as _cli

    mesh = _cli.make_mesh_from_cfg(cfg)
    variables = put_global(variables, make_param_shardings(mesh, variables))
    evaluator = Evaluator(model, cfg.input_size, mesh,
                          cfg.get("batch_size_val", 32))

    rows = []
    for split in splits:
        # test-mode 'val' uses the published val-test length table entry
        ds_split = "val-test" if split == "val" else split
        dataset = RefDataset(
            split_uri(split), mask_root, cfg.dataset, ds_split,
            "test", cfg.input_size, cfg.word_len,
        )
        logger.info(f"=> evaluating {cfg.dataset}/{split} "
                    f"({len(dataset)} refs, all sentences)")
        iou, prec = evaluator.inference(dataset, variables, cfg.word_len)
        expected = EXPECTED.get((cfg.dataset, split, backbone))
        rows.append({
            "dataset": cfg.dataset, "split": split, "backbone": backbone,
            "expected_iou": expected, "iou": 100.0 * iou,
            "diff": None if expected is None else 100.0 * iou - expected,
            **{k: 100.0 * v for k, v in prec.items()},
        })

    print(f"\n{'split':8s} {'expected':>9s} {'got':>8s} {'diff':>7s}  verdict")
    all_ok = True
    for r in rows:
        if r["expected_iou"] is None:
            print(f"{r['split']:8s} {'-':>9s} {r['iou']:8.2f} {'-':>7s}  "
                  f"(no published number)")
            continue
        ok = abs(r["diff"]) <= args.tolerance
        all_ok &= ok
        print(f"{r['split']:8s} {r['expected_iou']:9.2f} {r['iou']:8.2f} "
              f"{r['diff']:+7.2f}  {'PASS' if ok else 'FAIL'}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"rows": rows, "tolerance": args.tolerance,
                       "all_ok": all_ok}, f, indent=2)
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
