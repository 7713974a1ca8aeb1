"""Validation and test-time inference.

Device side (jitted once per Evaluator): eval forward -> sigmoid -> bicubic
align_corners=True upsample to the network input size, matching
/root/reference/engine/engine.py:100-106. Host side: per-sample inverse
affine warp to original resolution (cv2, cubic), 0.35 binarization, IoU
against the GT mask PNG read from disk -- operator-for-operator the
reference eval chain (engine.py:108-143).

Test mode evaluates *every* sentence of every ref (engine.py:166). The
reference does this at batch size 1; here the (image, sentence) pairs are
flattened into a stream and packed into fixed-size device batches, which
keeps XLA shapes static and the TPU saturated while computing identical
per-pair IoUs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..data.transforms import inverse_warp_prediction
from ..ops.resize import resize2d
from ..utils.logging import logger
from ..utils.tokenizer import tokenize
from .metrics import EVAL_THRESHOLD, mask_inter_union, mask_iou, summarize_ious


class Evaluator:
    def __init__(self, model, input_size: int, mesh=None, batch_size: int = 32):
        self.model = model
        self.input_size = int(input_size)
        self.mesh = mesh
        self.batch_size = int(batch_size)
        self._sharding = None
        if mesh is not None:
            from ..parallel import batch_sharding

            self._sharding = batch_sharding(mesh)

        @jax.jit
        def eval_step(variables, image, word):
            pred = model.apply(variables, image, word, train=False)
            probs = jax.nn.sigmoid(pred[..., 0].astype(jnp.float32))
            return resize2d(
                probs[..., None], (self.input_size, self.input_size),
                "bicubic", align_corners=True,
            )[..., 0]

        self._eval_step = eval_step

    def _put(self, arr):
        if self._sharding is not None:
            from ..parallel import put_global

            return put_global(arr, self._sharding)
        return jnp.asarray(arr)

    def predict_probs(self, variables, image: np.ndarray, word: np.ndarray):
        """(B, input, input) float32 probabilities at network input size.

        image/word are this process's local rows; multi-host, the jitted
        step runs on the global batch and only the host's own (addressable)
        rows are fetched back, in local-batch order."""
        out = self._eval_step(variables, self._put(image), self._put(word))
        if jax.process_count() == 1:
            return np.asarray(out)
        seen = {}  # batch offset -> rows (dedupes tp-replicated shards)
        for s in out.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = np.asarray(s.data)
        rows = np.concatenate([seen[k] for k in sorted(seen)])
        return rows[: image.shape[0]]

    # ------------------------------------------------------------------ val

    def validate(self, loader, variables, epoch: int = 0, epochs: int = 0):
        """Per-epoch distributed validation (engine.py:90-143); additionally
        reports overall IoU (cumulative intersection / cumulative union)."""
        iou_list: List[float] = []
        inter_sum = 0
        union_sum = 0
        for batch in loader:
            probs = self.predict_probs(variables, batch["image"], batch["word"])
            valid = batch.get("valid")
            for i in range(probs.shape[0]):
                if valid is not None and not valid[i]:
                    continue
                iou, inter, union = self._finish_sample(
                    probs[i],
                    np.asarray(batch["inverse"][i]),
                    np.asarray(batch["ori_size"][i]),
                    batch["mask_path"][i],
                )
                iou_list.append(iou)
                inter_sum += inter
                union_sum += union
        iou_list, inter_sum, union_sum = self._allgather(
            iou_list, inter_sum, union_sum
        )
        iou, prec = summarize_ious(iou_list)
        prec["oIoU"] = inter_sum / (union_sum + 1e-6)
        header = f"Evaluation: Epoch=[{epoch}/{epochs}]  IoU={100.0 * iou:.2f}"
        parts = "  ".join(
            f"{k}: {100.0 * v:.2f}" for k, v in prec.items()
        )
        logger.info(f"{header}  {parts}")
        return iou, prec

    @staticmethod
    def _allgather(iou_list: List[float], inter_sum: int, union_sum: int):
        """Concatenate per-sample IoUs (and sum inter/union counts) across
        hosts (the reference's concat_all_gather, utils/misc.py:45-58). The
        per-process loader shards are padded to equal length, so every host
        contributes the same count and the gather is fixed-shape over DCN."""
        if jax.process_count() == 1:
            return iou_list, inter_sum, union_sum
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            np.asarray(iou_list, np.float64)
        )
        sums = multihost_utils.process_allgather(
            np.asarray([inter_sum, union_sum], np.float64)
        ).reshape(-1, 2).sum(axis=0)
        return (
            list(np.asarray(gathered).reshape(-1)),
            float(sums[0]),
            float(sums[1]),
        )

    def _finish_sample(self, probs, inv_mat, ori_size, mask_path):
        h, w = int(ori_size[0]), int(ori_size[1])
        warped = inverse_warp_prediction(probs, inv_mat, (h, w))
        pred = warped > EVAL_THRESHOLD
        mask = cv2.imread(mask_path, flags=cv2.IMREAD_GRAYSCALE)
        mask = mask / 255.0
        inter, union = mask_inter_union(pred, mask)
        return mask_iou(pred, mask), inter, union

    # ----------------------------------------------------------------- test

    def inference(
        self,
        dataset,
        variables,
        word_len: int,
        visualize: bool = False,
        vis_dir: Optional[str] = None,
        progress: bool = True,
    ):
        """All-sentences test evaluation (engine.py:146-215), batched."""
        pend_img: List[np.ndarray] = []
        pend_word: List[np.ndarray] = []
        pend_meta: List[Dict[str, Any]] = []
        iou_list: List[float] = []
        sums = [0, 0]  # cumulative intersection / union (oIoU)

        def flush():
            if not pend_img:
                return
            n = len(pend_img)
            pad = self.batch_size - n
            images = np.stack(pend_img + [pend_img[-1]] * pad)
            words = np.stack(pend_word + [pend_word[-1]] * pad)
            probs = self.predict_probs(variables, images, words)
            for i in range(n):
                meta = pend_meta[i]
                h, w = meta["ori_size"]
                warped = inverse_warp_prediction(
                    probs[i], meta["inverse"], (int(h), int(w))
                )
                pred = warped > EVAL_THRESHOLD
                iou = mask_iou(pred, meta["mask"])
                inter, union = mask_inter_union(pred, meta["mask"])
                iou_list.append(iou)
                sums[0] += inter
                sums[1] += union
                if visualize and vis_dir:
                    sent_tag = "_".join(meta["sent"].split(" "))
                    name = f"{meta['seg_id']}-iou={iou * 100:.2f}-{sent_tag}.png"
                    cv2.imwrite(
                        os.path.join(vis_dir, name),
                        (pred * 255).astype(np.uint8),
                    )
            pend_img.clear()
            pend_word.clear()
            pend_meta.clear()

        iterator = range(len(dataset))
        if progress:
            try:
                from tqdm import tqdm

                iterator = tqdm(iterator, desc="Inference:", ncols=100)
            except ImportError:  # pragma: no cover
                pass

        warned_no_ori = False
        for idx in iterator:
            sample = dataset[idx]
            mask = cv2.imread(sample["mask_path"], flags=cv2.IMREAD_GRAYSCALE)
            mask = mask / 255.0
            if visualize and vis_dir:
                seg_id = sample["seg_id"]
                # prewarped records carry the original image only when
                # packed with --keep-ori (dataset._getitem_prewarped); skip
                # the -img.jpg dump rather than crash without it
                if "ori_img" in sample:
                    cv2.imwrite(
                        os.path.join(vis_dir, f"{seg_id}-img.jpg"),
                        sample["ori_img"],
                    )
                elif not warned_no_ori:
                    warned_no_ori = True
                    logger.warning(
                        "visualize: records lack original images (prewarped "
                        "without --keep-ori); skipping -img.jpg dumps"
                    )
                cv2.imwrite(
                    os.path.join(vis_dir, f"{seg_id}-mask.png"),
                    (mask * 255).astype(np.uint8),
                )
            for sent in sample["sents"]:
                pend_img.append(sample["image"])
                pend_word.append(tokenize(sent, word_len, True)[0])
                pend_meta.append(
                    {
                        "mask": mask,
                        "inverse": np.asarray(sample["inverse"]),
                        "ori_size": np.asarray(sample["ori_size"]),
                        "seg_id": sample["seg_id"],
                        "sent": sent,
                    }
                )
                if len(pend_img) == self.batch_size:
                    flush()
        flush()

        logger.info("=> Metric Calculation <=")
        iou, prec = summarize_ious(iou_list)
        prec["oIoU"] = sums[0] / (sums[1] + 1e-6)
        logger.info(f"IoU={100.0 * iou:.2f}")
        for k, v in prec.items():
            logger.info(f"{k}: {100.0 * v:.2f}.")
        return iou, prec
