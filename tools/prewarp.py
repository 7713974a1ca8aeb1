"""Pre-warp a dataset shard: bake the deterministic letterbox transform.

The reference pipeline (and ours) applies the same aspect-preserving affine
warp to every sample on every epoch (utils/dataset.py:147-163) -- there is
no random spatial augmentation, so the warp can be computed once offline.
This tool reads any backend URI (.lmdb / .refpack / synthetic://) and
writes a .refpack whose records carry:

  warped      : uint8 input_size x input_size x 3 RGB (pre-normalization)
  warped_mask : float32 warped GT mask in [0,1] (same INTER_LINEAR warp,
                stored exactly -- bit-identical to the live pipeline)
  inverse     : float64 2x3 inverse affine  |  ori_size : int32 {h, w}
  seg_id / sents / num_sents / cat / img_name  (unchanged)
  img         : original JPEG bytes (only with --keep-ori, for test-mode
                visualization dumps)

The runtime fast path (RefDataset._getitem_prewarped) then does only
normalize + tokenize per sample, removing JPEG decode + warp from the
training/eval hot loop entirely.

  python tools/prewarp.py -i datasets/pack/refcoco/train.refpack \
      -o datasets/prewarped/refcoco/train.refpack --input-size 416
"""

import argparse
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tqdm import tqdm

from cris_tpu.data.dataset import open_backend
from cris_tpu.data.records import RefPackWriter
from cris_tpu.data.transforms import (
    decode_image,
    decode_mask,
    get_transform_mats,
    warp_image,
    warp_mask,
)


def prewarp(src_uri: str, out_path: str, input_size: int, keep_ori: bool):
    backend = open_backend(src_uri)
    os.makedirs(osp.dirname(osp.abspath(out_path)), exist_ok=True)
    hw = (input_size, input_size)
    with RefPackWriter(out_path) as writer:
        for i in tqdm(range(len(backend)), desc="prewarp", ncols=100):
            rec = backend[i]
            ori_img = decode_image(rec["img"])
            img = ori_img[:, :, ::-1]  # RGB
            mat, inv = get_transform_mats(img.shape[:2], hw)
            warped = warp_image(img, mat, hw)
            mask = warp_mask(decode_mask(rec["mask"]), mat, hw)
            out = {
                "warped": np.ascontiguousarray(warped).tobytes(),
                "warped_mask": mask.astype(np.float32)[..., None].tobytes(),
                "inverse": inv.astype(np.float64).tobytes(),
                "ori_size": np.array(img.shape[:2], np.int32).tobytes(),
                "seg_id": rec["seg_id"],
                "img_name": rec["img_name"],
                "cat": rec["cat"],
                "num_sents": rec["num_sents"],
                "sents": rec["sents"],
            }
            if keep_ori:
                out["img"] = rec["img"]
            writer.write(out)
    print(f"wrote {out_path}")


def main():
    parser = argparse.ArgumentParser(description="Pre-warp a dataset shard.")
    parser.add_argument("-i", "--input", required=True, help="source URI")
    parser.add_argument("-o", "--output", required=True, help=".refpack out")
    parser.add_argument("--input-size", type=int, default=416)
    parser.add_argument(
        "--keep-ori", action="store_true",
        help="keep original JPEG bytes (test-mode visualization)",
    )
    args = parser.parse_args()
    prewarp(args.input, args.output, args.input_size, args.keep_ori)


if __name__ == "__main__":
    main()
