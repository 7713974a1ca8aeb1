"""Pack annotation JSON + image/mask folders into RefPack shards.

TPU-native equivalent of the reference tools/folder2lmdb.py:36-100 (same
record schema), writing cris_tpu's mmap-friendly RefPack format. Can also
convert existing reference-format LMDB shards (--from-lmdb) so users of
the reference can reuse their prepared data unchanged.

  python tools/folder2pack.py -j anns/refcoco/train.json \
      -i images/train2014 -m masks/refcoco -o datasets/pack/refcoco
  python tools/folder2pack.py --from-lmdb datasets/lmdb/refcoco/train.lmdb \
      -o datasets/pack/refcoco
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from tqdm import tqdm

from cris_tpu.data.records import RefPackWriter


def raw_reader(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def folder2pack(json_data, img_dir, mask_dir, output_dir, split):
    path = osp.join(output_dir, f"{split}.refpack")
    print(f"Generate RefPack to {path}")
    with RefPackWriter(path) as writer:
        for item in tqdm(json_data):
            writer.write(
                {
                    "img": raw_reader(osp.join(img_dir, item["img_name"])),
                    "mask": raw_reader(
                        osp.join(mask_dir, f"{item['segment_id']}.png")
                    ),
                    "cat": item["cat"],
                    "seg_id": item["segment_id"],
                    "img_name": item["img_name"],
                    "num_sents": item["sentences_num"],
                    "sents": [s["sent"] for s in item["sentences"]],
                }
            )
    print("Done.")


def lmdb2pack(lmdb_path, output_dir):
    from cris_tpu.data.lmdb_backend import LmdbBackend

    split = osp.basename(lmdb_path).split(".")[0]
    backend = LmdbBackend(lmdb_path)
    path = osp.join(output_dir, f"{split}.refpack")
    print(f"Convert {lmdb_path} ({len(backend)} records) -> {path}")
    with RefPackWriter(path) as writer:
        for i in tqdm(range(len(backend))):
            writer.write(backend[i])
    print("Done.")


def main():
    parser = argparse.ArgumentParser(description="COCO folder to RefPack.")
    parser.add_argument("-j", "--json-dir", type=str, default="")
    parser.add_argument("-i", "--img-dir", type=str, default="")
    parser.add_argument("-m", "--mask-dir", type=str, default="")
    parser.add_argument("-o", "--output-dir", type=str, required=True)
    parser.add_argument("--from-lmdb", type=str, default="")
    args = parser.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)

    if args.from_lmdb:
        lmdb2pack(args.from_lmdb, args.output_dir)
        return

    split = osp.basename(args.json_dir).split(".")[0]
    with open(args.json_dir, "r") as f:
        json_data = json.load(f)
    folder2pack(json_data, args.img_dir, args.mask_dir, args.output_dir, split)


if __name__ == "__main__":
    main()
