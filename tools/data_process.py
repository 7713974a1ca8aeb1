"""Offline dataset preparation: refs pickles + COCO instances -> per-split
annotation JSONs + GT mask PNGs.

Same CLI and outputs as the reference tools/data_process.py:11-137:
  python tools/data_process.py --data_root <dir> --output_dir <dir> \
      --dataset refcoco --split unc --generate_mask

Outputs {output_dir}/anns/{dataset}/{split}.json (list of
{bbox, cat, segment_id, img_name, sentences[], sentences_num}) and
{output_dir}/masks/{dataset}/{segment_id}.png (0/255), consumed by
tools/folder2pack.py and by the eval loops (mask_root).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
from tqdm import tqdm

from cris_tpu.data.refer import REFER


def cat_process(cat: int) -> int:
    """COCO category id -> contiguous 0..79 (same table as the reference
    tools/data_process.py:51-70)."""
    if 1 <= cat <= 11:
        return cat - 1
    if 13 <= cat <= 25:
        return cat - 2
    if 27 <= cat <= 28:
        return cat - 3
    if 31 <= cat <= 44:
        return cat - 5
    if 46 <= cat <= 65:
        return cat - 6
    if cat == 67:
        return cat - 7
    if cat == 70:
        return cat - 9
    if 72 <= cat <= 82:
        return cat - 10
    if 84 <= cat <= 90:
        return cat - 11
    return cat


def bbox_process(bbox):
    x_min, y_min = int(bbox[0]), int(bbox[1])
    return [x_min, y_min, x_min + int(bbox[2]), y_min + int(bbox[3])]


def prepare_dataset(refer, dataset, splits, output_dir, generate_mask=False):
    ann_path = os.path.join(output_dir, "anns", dataset)
    mask_path = os.path.join(output_dir, "masks", dataset)
    os.makedirs(ann_path, exist_ok=True)
    os.makedirs(mask_path, exist_ok=True)

    for split in splits:
        dataset_array = []
        ref_ids = refer.getRefIds(split=split)
        print(f"Processing split:{split} - Len: {len(ref_ids)}")
        for ref_id in tqdm(ref_ids):
            ref = refer.Refs[ref_id]
            img = refer.loadImgs(image_ids=ref["image_id"])[0]
            img_name = img["file_name"]
            if dataset == "refclef" and img_name in (
                "19579.jpg", "17975.jpg", "19575.jpg"
            ):
                continue

            if generate_mask:
                cv2.imwrite(
                    os.path.join(mask_path, f"{ref_id}.png"),
                    refer.getMask(ref)["mask"] * 255,
                )

            sentences = [
                {"idx": i, "sent_id": s["sent_id"], "sent": s["sent"].strip()}
                for i, s in enumerate(ref["sentences"])
            ]
            dataset_array.append(
                {
                    "bbox": bbox_process(refer.getRefBox(ref_id)),
                    "cat": cat_process(ref["category_id"]),
                    "segment_id": ref_id,
                    "img_name": img_name,
                    "sentences": sentences,
                    "sentences_num": len(sentences),
                }
            )
        print("Dumping json file...")
        with open(os.path.join(ann_path, f"{split}.json"), "w") as f:
            json.dump(dataset_array, f)


def main():
    parser = argparse.ArgumentParser(description="Data preparation")
    parser.add_argument("--data_root", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument(
        "--dataset",
        type=str,
        choices=["refcoco", "refcoco+", "refcocog", "refclef"],
        default="refcoco",
    )
    parser.add_argument("--split", type=str, default="umd")
    parser.add_argument("--generate_mask", action="store_true")
    args = parser.parse_args()

    refer = REFER(args.data_root, args.dataset, args.split)
    print(f"dataset [{args.dataset}_{args.split}] contains: ")
    print(
        f"{len(refer.Sents)} expressions for {len(refer.getRefIds())} refs "
        f"in {len(refer.getImgIds())} images."
    )

    if args.dataset == "refclef":
        splits = (
            ["train", "val", "testA", "testB", "testC"]
            if args.split == "unc"
            else ["train", "val", "test"]
        )
    elif args.dataset in ("refcoco", "refcoco+"):
        splits = ["train", "val", "testA", "testB"]
    else:  # refcocog
        splits = ["train", "val", "test"]

    for split in splits:
        print(f"{len(refer.getRefIds(split=split))} refs are in split [{split}].")

    prepare_dataset(refer, args.dataset, splits, args.output_dir, args.generate_mask)


if __name__ == "__main__":
    main()
