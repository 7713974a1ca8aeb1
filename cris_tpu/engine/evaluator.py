"""Validation and test-time inference.

Device side (jitted once per Evaluator): eval forward -> sigmoid -> bicubic
align_corners=True upsample to the network input size, matching
/root/reference/engine/engine.py:100-106. Host side: per-sample inverse
affine warp to original resolution (cv2, cubic), 0.35 binarization, IoU
against the GT mask PNG read from disk -- operator-for-operator the
reference eval chain (engine.py:108-143).

Test mode evaluates *every* sentence of every ref (engine.py:166). The
reference does this at batch size 1 on one GPU; here the (image, sentence)
pairs are flattened into a stream, packed into fixed-size device batches
(static XLA shapes), and sharded round-robin across hosts.

Throughput structure (the device must never wait for the host):
- dispatch is asynchronous -- up to two device batches stay in flight
  while the host reads records, tokenizes, warps and scores the previous
  batch (JAX async dispatch gives the overlap; only the fetch blocks);
- the per-sample host tail (inverse warp + mask read + IoU) runs on a
  thread pool (cv2/numpy release the GIL).
"""

from __future__ import annotations

import os
from collections import deque
from concurrent.futures import ThreadPoolExecutor
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

# device batches allowed in flight before the host blocks on a fetch
_PIPELINE_DEPTH = 2


class Evaluator:
    def __init__(
        self,
        model,
        input_size: int,
        mesh=None,
        batch_size: int = 32,
        host_workers: Optional[int] = None,
    ):
        self.model = model
        self.input_size = int(input_size)
        self.mesh = mesh
        self.batch_size = int(batch_size)
        self.host_workers = host_workers or min(8, os.cpu_count() or 1)
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

    def _dispatch(self, variables, image: np.ndarray, word: np.ndarray):
        """Enqueue one device batch; returns the (not-yet-ready) device
        array. Does not block: the host keeps preparing the next batch
        while the TPU computes."""
        return self._eval_step(variables, self._put(image), self._put(word))

    def _fetch(self, out, n: int) -> np.ndarray:
        """Device output -> this host's local rows (blocks until ready)."""
        if jax.process_count() == 1:
            return np.asarray(out)[:n]
        seen = {}  # batch offset -> rows (dedupes tp-replicated shards)
        for s in out.addressable_shards:
            start = s.index[0].start or 0
            if start not in seen:
                seen[start] = np.asarray(s.data)
        rows = np.concatenate([seen[k] for k in sorted(seen)])
        return rows[:n]

    def predict_probs(self, variables, image: np.ndarray, word: np.ndarray):
        """(B, input, input) float32 probabilities at network input size.

        image/word are this process's local rows; multi-host, the jitted
        step runs on the global batch and only the host's own (addressable)
        rows are fetched back, in local-batch order."""
        return self._fetch(
            self._dispatch(variables, image, word), image.shape[0]
        )

    # ------------------------------------------------------------------ val

    def validate(self, loader, variables, epoch: int = 0, epochs: int = 0):
        """Per-epoch distributed validation (engine.py:90-143); additionally
        reports overall IoU (cumulative intersection / cumulative union)."""
        iou_list: List[float] = []
        sums = [0.0, 0.0]  # cumulative intersection / union

        def finish(probs_i, inv, ori, mask_path):
            iou, inter, union = self._finish_sample(probs_i, inv, ori, mask_path)
            return iou, inter, union

        with ThreadPoolExecutor(self.host_workers) as pool:
            inflight: deque = deque()

            def drain_one():
                out, batch = inflight.popleft()
                probs = self._fetch(out, batch["image"].shape[0])
                valid = batch.get("valid")
                tasks = [
                    pool.submit(
                        finish,
                        probs[i],
                        np.asarray(batch["inverse"][i]),
                        np.asarray(batch["ori_size"][i]),
                        batch["mask_path"][i],
                    )
                    for i in range(probs.shape[0])
                    if valid is None or valid[i]
                ]
                for t in tasks:
                    iou, inter, union = t.result()
                    iou_list.append(iou)
                    sums[0] += inter
                    sums[1] += union

            for batch in loader:
                inflight.append(
                    (self._dispatch(variables, batch["image"], batch["word"]),
                     batch)
                )
                if len(inflight) >= _PIPELINE_DEPTH:
                    drain_one()
            while inflight:
                drain_one()

        iou_list, inter_sum, union_sum = self._allgather(
            iou_list, sums[0], sums[1]
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
    def _allgather(iou_list: List[float], inter_sum: float, union_sum: float):
        """Concatenate per-sample IoUs (and sum inter/union counts) across
        hosts (the reference's concat_all_gather, utils/misc.py:45-58).
        Per-host counts may differ (test-mode round-robin sharding, or
        valid-masked padding rows), so rows are length-prefixed and padded
        to the global max before the fixed-shape DCN gather."""
        if jax.process_count() == 1:
            return iou_list, inter_sum, union_sum
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([len(iou_list)], np.int64)
        ).reshape(-1)
        width = int(counts.max())
        padded = np.zeros(max(width, 1), np.float64)
        padded[: len(iou_list)] = np.asarray(iou_list, np.float64)
        gathered = np.asarray(
            multihost_utils.process_allgather(padded)
        ).reshape(len(counts), -1)
        merged: List[float] = []
        for row, cnt in zip(gathered, counts):
            merged.extend(row[: int(cnt)])
        sums = multihost_utils.process_allgather(
            np.asarray([inter_sum, union_sum], np.float64)
        ).reshape(-1, 2).sum(axis=0)
        return merged, float(sums[0]), float(sums[1])

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
        """All-sentences test evaluation (engine.py:146-215), batched.

        Multi-host: records are sharded round-robin across processes; every
        process participates in every (collective) device batch, padding
        with dummy rows once its own stream runs dry, and the per-pair IoUs
        are allgathered at the end. Single-host this degenerates to the
        plain pipelined loop."""
        nproc = jax.process_count()
        pid = jax.process_index()
        my_indices = range(pid, len(dataset), nproc)

        iou_list: List[float] = []
        sums = [0.0, 0.0]  # cumulative intersection / union (oIoU)
        size = self.input_size

        def finish_pair(probs_i, meta):
            h, w = meta["ori_size"]
            warped = inverse_warp_prediction(
                probs_i, meta["inverse"], (int(h), int(w))
            )
            pred = warped > EVAL_THRESHOLD
            iou = mask_iou(pred, meta["mask"])
            inter, union = mask_inter_union(pred, meta["mask"])
            if visualize and vis_dir:
                sent_tag = "_".join(meta["sent"].split(" "))
                name = f"{meta['seg_id']}-iou={iou * 100:.2f}-{sent_tag}.png"
                cv2.imwrite(
                    os.path.join(vis_dir, name),
                    (pred * 255).astype(np.uint8),
                )
            return iou, inter, union

        def pair_stream():
            iterator = my_indices
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
                    # packed with --keep-ori (dataset._getitem_prewarped);
                    # skip the -img.jpg dump rather than crash without it
                    if "ori_img" in sample:
                        cv2.imwrite(
                            os.path.join(vis_dir, f"{seg_id}-img.jpg"),
                            sample["ori_img"],
                        )
                    elif not warned_no_ori:
                        warned_no_ori = True
                        logger.warning(
                            "visualize: records lack original images "
                            "(prewarped without --keep-ori); skipping "
                            "-img.jpg dumps"
                        )
                    cv2.imwrite(
                        os.path.join(vis_dir, f"{seg_id}-mask.png"),
                        (mask * 255).astype(np.uint8),
                    )
                for sent in sample["sents"]:
                    yield (
                        sample["image"],
                        tokenize(sent, word_len, True)[0],
                        {
                            "mask": mask,
                            "inverse": np.asarray(sample["inverse"]),
                            "ori_size": np.asarray(sample["ori_size"]),
                            "seg_id": sample["seg_id"],
                            "sent": sent,
                        },
                    )

        def next_local_batch(stream):
            imgs, words, metas = [], [], []
            for img, word, meta in stream:
                imgs.append(img)
                words.append(word)
                metas.append(meta)
                if len(imgs) == self.batch_size:
                    break
            n = len(imgs)
            if n == 0:
                return None, None, [], 0
            pad = self.batch_size - n
            return (
                np.stack(imgs + [imgs[-1]] * pad),
                np.stack(words + [words[-1]] * pad),
                metas,
                n,
            )

        def others_have_data(local_n: int) -> bool:
            if nproc == 1:
                return local_n > 0
            from jax.experimental import multihost_utils

            return bool(
                multihost_utils.process_allgather(
                    np.asarray([local_n], np.int64)
                ).sum()
                > 0
            )

        dummy_img = np.zeros((self.batch_size, size, size, 3), np.float32)
        dummy_word = np.zeros((self.batch_size, word_len), np.int32)

        with ThreadPoolExecutor(self.host_workers) as pool:
            inflight: deque = deque()

            def drain_one():
                out, metas, n = inflight.popleft()
                probs = self._fetch(out, max(n, 1))
                tasks = [
                    pool.submit(finish_pair, probs[i], metas[i])
                    for i in range(n)
                ]
                for t in tasks:
                    iou, inter, union = t.result()
                    iou_list.append(iou)
                    sums[0] += inter
                    sums[1] += union

            stream = pair_stream()
            while True:
                images, words, metas, n = next_local_batch(stream)
                # lockstep across hosts: everyone checks whether any host
                # still has pairs this round, and all-or-none dispatches
                if not others_have_data(n):
                    break
                if images is None:  # dummy collective participation
                    images, words = dummy_img, dummy_word
                inflight.append(
                    (self._dispatch(variables, images, words), metas, n)
                )
                if len(inflight) >= _PIPELINE_DEPTH:
                    drain_one()
            while inflight:
                drain_one()

        iou_list, inter_sum, union_sum = self._allgather(
            iou_list, sums[0], sums[1]
        )
        logger.info("=> Metric Calculation <=")
        iou, prec = summarize_ious(iou_list)
        prec["oIoU"] = inter_sum / (union_sum + 1e-6)
        logger.info(f"IoU={100.0 * iou:.2f}")
        for k, v in prec.items():
            logger.info(f"{k}: {100.0 * v:.2f}.")
        return iou, prec
