"""REFER: the referring-expression dataset API (offline prep).

Dependency-light reimplementation of the behavior of the reference's
tools/refer.py:41-314 (itself derived from the UNC ReferItGame API): loads
``refs(unc|umd|google).p`` pickles + COCO ``instances.json``, exposes
ref/ann/img/cat lookups and split filtering, and rasterizes reference
masks. pycocotools is replaced by:
- polygon segmentations -> cv2.fillPoly rasterization;
- uncompressed COCO RLE ({'counts': [...], 'size': [h, w]}) -> a pure
  NumPy column-major run-length decoder (the same semantics pycocotools
  implements in C);
- compressed COCO RLE ({'counts': b'...' string}) -> a pure-Python port
  of the pycocotools rleFrString varint decoding (base-48, 5 bits per
  char, sign-extended, runs delta-coded against counts[i-2]).
"""

from __future__ import annotations

import itertools
import json
import os
import pickle
import time
from typing import Any, Dict, List

import numpy as np


def decode_uncompressed_rle(counts: List[int], h: int, w: int) -> np.ndarray:
    """COCO uncompressed RLE -> (h, w) uint8 mask (column-major runs,
    starting with zeros)."""
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for run in counts:
        flat[pos : pos + run] = val
        pos += run
        val = 1 - val
    return flat.reshape((w, h)).T  # column-major


def decode_compressed_counts(data) -> List[int]:
    """COCO compressed RLE counts string -> run lengths.

    The format (pycocotools rleFrString): each run length is a varint of
    base-48 chars carrying 5 payload bits (bit 0x20 = continuation); the
    final chunk sign-extends when bit 0x10 is set; every run after the
    second is delta-coded against the run two positions back.
    """
    if isinstance(data, str):
        data = data.encode("ascii")
    counts: List[int] = []
    pos = 0
    n = len(data)
    while pos < n:
        x = 0
        k = 0
        while True:
            c = data[pos] - 48
            x |= (c & 0x1F) << (5 * k)
            pos += 1
            k += 1
            if not c & 0x20:
                if c & 0x10:
                    x |= -1 << (5 * k)
                break
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rasterize_polygons(polygons: List[List[float]], h: int, w: int) -> np.ndarray:
    """COCO polygon list -> (h, w) uint8 mask via cv2 (replaces
    pycocotools.frPyObjects+decode+sum at tools/refer.py:295-308)."""
    import cv2

    mask = np.zeros((h, w), np.uint8)
    for poly in polygons:
        pts = np.asarray(poly, np.float64).reshape(-1, 2)
        cv2.fillPoly(mask, [np.round(pts).astype(np.int32)], 1)
    return mask


class REFER:
    def __init__(self, data_root: str, dataset: str = "refcoco", splitBy: str = "unc"):
        print(f"loading dataset {dataset} into memory...")
        self.DATA_DIR = os.path.join(data_root, dataset)
        if dataset in ("refcoco", "refcoco+", "refcocog"):
            self.IMAGE_DIR = os.path.join(data_root, "images/mscoco/images/train2014")
        elif dataset == "refclef":
            self.IMAGE_DIR = os.path.join(data_root, "images/saiapr_tc-12")
        else:
            raise KeyError(f"No refer dataset is called [{dataset}]")

        tic = time.time()
        ref_file = os.path.join(self.DATA_DIR, f"refs({splitBy}).p")
        with open(ref_file, "rb") as f:
            self.data = {"dataset": dataset, "refs": pickle.load(f)}
        with open(os.path.join(self.DATA_DIR, "instances.json"), "r") as f:
            instances = json.load(f)
        self.data["images"] = instances["images"]
        self.data["annotations"] = instances["annotations"]
        self.data["categories"] = instances["categories"]

        self._create_index()
        print(f"DONE (t={time.time() - tic:.2f}s)")

    def _create_index(self):
        self.Anns = {a["id"]: a for a in self.data["annotations"]}
        self.Imgs = {i["id"]: i for i in self.data["images"]}
        self.Cats = {c["id"]: c["name"] for c in self.data["categories"]}
        self.imgToAnns: Dict[Any, list] = {}
        for a in self.data["annotations"]:
            self.imgToAnns.setdefault(a["image_id"], []).append(a)

        self.Refs = {}
        self.imgToRefs: Dict[Any, list] = {}
        self.catToRefs: Dict[Any, list] = {}
        self.annToRef = {}
        self.Sents = {}
        self.sentToRef = {}
        self.sentToTokens = {}
        for ref in self.data["refs"]:
            self.Refs[ref["ref_id"]] = ref
            self.imgToRefs.setdefault(ref["image_id"], []).append(ref)
            self.catToRefs.setdefault(ref["category_id"], []).append(ref)
            self.annToRef[ref["ann_id"]] = ref
            for sent in ref["sentences"]:
                self.Sents[sent["sent_id"]] = sent
                self.sentToRef[sent["sent_id"]] = ref
                self.sentToTokens[sent["sent_id"]] = sent["tokens"]

    # ----------------------------------------------------------- getters

    def getRefIds(self, image_ids=None, cat_ids=None, ref_ids=None, split=""):
        refs = self.data["refs"]
        if image_ids:
            image_ids = set(np.atleast_1d(image_ids).tolist())
            refs = [r for r in refs if r["image_id"] in image_ids]
        if cat_ids:
            cat_ids = set(np.atleast_1d(cat_ids).tolist())
            refs = [r for r in refs if r["category_id"] in cat_ids]
        if ref_ids:
            ref_ids_set = set(np.atleast_1d(ref_ids).tolist())
            refs = [r for r in refs if r["ref_id"] in ref_ids_set]
        if split:
            if split in ("testA", "testB", "testC"):
                refs = [r for r in refs if split[-1] in r["split"]]
            elif split in ("testAB", "testBC", "testAC"):
                refs = [r for r in refs if r["split"] == split]
            elif split == "test":
                refs = [r for r in refs if "test" in r["split"]]
            elif split in ("train", "val"):
                refs = [r for r in refs if r["split"] == split]
            else:
                raise KeyError(f"No such split [{split}]")
        return [r["ref_id"] for r in refs]

    def getAnnIds(self, image_ids=None, ref_ids=None):
        if image_ids:
            image_ids = np.atleast_1d(image_ids).tolist()
            anns = itertools.chain.from_iterable(
                self.imgToAnns.get(i, []) for i in image_ids
            )
            ids = [a["id"] for a in anns]
        else:
            ids = [a["id"] for a in self.data["annotations"]]
        if ref_ids:
            ref_ids = np.atleast_1d(ref_ids).tolist()
            ids = list(set(ids) & {self.Refs[r]["ann_id"] for r in ref_ids})
        return ids

    def getImgIds(self, ref_ids=None):
        if ref_ids:
            ref_ids = np.atleast_1d(ref_ids).tolist()
            return list({self.Refs[r]["image_id"] for r in ref_ids})
        return list(self.Imgs.keys())

    def getCatIds(self):
        return list(self.Cats.keys())

    def loadRefs(self, ref_ids):
        return [self.Refs[r] for r in np.atleast_1d(ref_ids).tolist()]

    def loadAnns(self, ann_ids):
        return [self.Anns[a] for a in np.atleast_1d(ann_ids).tolist()]

    def loadImgs(self, image_ids):
        return [self.Imgs[i] for i in np.atleast_1d(image_ids).tolist()]

    def loadCats(self, cat_ids):
        return [self.Cats[c] for c in np.atleast_1d(cat_ids).tolist()]

    def getRefBox(self, ref_id):
        return self.Anns[self.Refs[ref_id]["ann_id"]]["bbox"]  # [x, y, w, h]

    # ------------------------------------------------------ visualization

    def showRef(self, ref, seg_box: str = "seg", ax=None):
        """Debug plot of a ref on its image: prints the referring sentences
        and overlays the segmentation (``seg_box='seg'``: thick-yellow /
        thin-red polygon outlines for polygon annotations, a half-alpha
        green tint for RLE masks) or the green annotation box
        (``seg_box='box'``) -- reference tools/refer.py:240-293 behavior,
        rendered via our pycocotools-free decoders."""
        import cv2
        import matplotlib.pyplot as plt
        from matplotlib.collections import PatchCollection
        from matplotlib.patches import Polygon, Rectangle

        ax = ax or plt.gca()
        image = self.Imgs[ref["image_id"]]
        img = cv2.imread(os.path.join(self.IMAGE_DIR, image["file_name"]))
        if img is not None:
            ax.imshow(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        for sid, sent in enumerate(ref["sentences"]):
            print(f"{sid + 1}. {sent['sent']}")

        ann = self.Anns[ref["ann_id"]]
        if seg_box == "seg":
            seg = ann["segmentation"]
            if isinstance(seg, list):  # polygons (refcoco*)
                polygons = [
                    Polygon(np.asarray(p, np.float64).reshape(-1, 2))
                    for p in seg
                ]
                for edge, width in (((1, 1, 0, 0.8), 3), ((1, 0, 0, 0.8), 1)):
                    ax.add_collection(
                        PatchCollection(
                            polygons, facecolors="none", edgecolors=(edge,),
                            linewidths=width,
                        )
                    )
            else:  # RLE mask (refclef)
                m = self.getMask(ref)["mask"].astype(np.float32)
                tint = np.empty(m.shape + (4,), np.float32)
                tint[..., :3] = np.array([2.0, 166.0, 101.0]) / 255.0
                tint[..., 3] = m * 0.5
                ax.imshow(tint)
        elif seg_box == "box":
            x, y, w, h = self.getRefBox(ref["ref_id"])
            ax.add_patch(
                Rectangle((x, y), w, h, fill=False, edgecolor="green",
                          linewidth=3)
            )
        else:
            raise ValueError(f"seg_box must be 'seg' or 'box', got {seg_box!r}")
        return ax

    def showMask(self, ref, ax=None):
        """Plot the rasterized binary mask (tools/refer.py:316-320)."""
        import matplotlib.pyplot as plt

        ax = ax or plt.gca()
        ax.imshow(self.getMask(ref)["mask"])
        return ax

    # -------------------------------------------------------------- masks

    def getMask(self, ref) -> Dict[str, Any]:
        """Binary mask for a ref (tools/refer.py:295-314 semantics)."""
        ann = self.Anns[ref["ann_id"]]
        image = self.Imgs[ref["image_id"]]
        h, w = image["height"], image["width"]
        seg = ann["segmentation"]
        if isinstance(seg, list):  # polygons
            mask = rasterize_polygons(seg, h, w)
        else:  # RLE dict
            counts = seg["counts"]
            if not isinstance(counts, (list, tuple)):  # compressed string
                counts = decode_compressed_counts(counts)
            mask = decode_uncompressed_rle(counts, *seg["size"])
        return {"mask": mask.astype(np.uint8), "area": int(mask.sum())}
