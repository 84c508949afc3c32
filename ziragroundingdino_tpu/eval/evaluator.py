"""Dataset evaluation loop.

Parity with `inference_on_dataset` (`evaluation/evaluator.py:82-158`:
warmup-excluded s/img timing, per-batch device sync) + `COCOEvaluator`
(`evaluation/coco_evaluation.py:25-269`) feeding our numpy COCOeval.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Dict, Iterable, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from ziragroundingdino_tpu.eval.coco_map import CocoMeanAP
from ziragroundingdino_tpu.eval.postprocess import scale_to_original, top_k_detections
from ziragroundingdino_tpu.text.masks import recover_to_cls_logits


def make_inference_fn(model, select_k: int = 200):
    """jitted (params, batch) -> detections in original-image coords."""

    def fn(params, batch):
        text = {
            k: batch[k]
            for k in (
                "input_ids", "text_token_mask", "position_ids",
                "text_self_attention_masks",
            )
        }
        out = model.apply(
            params, batch["pixels"], batch["mask"], text,
            train=False, deterministic=True,
        )
        t = batch["cate_to_token_mask"].shape[-1]
        cls_logits = recover_to_cls_logits(
            out["pred_logits"][..., :t], batch["cate_to_token_mask"], fill=-100.0
        )
        det = top_k_detections(cls_logits, out["pred_boxes"], k=select_k)
        boxes = scale_to_original(det["boxes_cxcywh"], batch["orig_sizes"])
        return {"scores": det["scores"], "labels": det["labels"], "boxes": boxes}

    return jax.jit(fn)


def inference_on_dataset(
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    inference_fn: Callable,
    num_classes: int,
    num_warmup: int = 2,
    score_floor: float = 0.0,
    class_names: Optional[Sequence[str]] = None,
) -> Dict[str, float]:
    """Runs eval, returns COCO metrics + timing (s/img like the reference's
    'pure compute time')."""
    evaluator = CocoMeanAP(num_classes=num_classes)
    n_images = 0
    compute_time = 0.0
    timed_images = 0
    for it, batch in enumerate(loader):
        real = int(batch.pop("real_count", len(batch["pixels"])))
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if not k.startswith("crowd_") and k != "gt_areas"}
        t0 = time.perf_counter()
        det = jax.block_until_ready(inference_fn(params, jbatch))
        dt = time.perf_counter() - t0
        if it >= num_warmup:
            compute_time += dt
            timed_images += real
        scores = np.asarray(det["scores"])[:real]
        labels = np.asarray(det["labels"])[:real]
        boxes = np.asarray(det["boxes"])[:real]
        gt_boxes_n = np.asarray(batch["gt_boxes"])[:real]
        gt_labels = np.asarray(batch["gt_labels"])[:real]
        gt_valid = np.asarray(batch["gt_valid"])[:real]
        sizes = np.asarray(batch["sizes"])[:real]
        orig = np.asarray(batch["orig_sizes"])[:real]
        ids = np.asarray(batch["image_ids"])[:real]
        def denorm(g, i):
            # normalized cxcywh (by resized size) -> absolute xyxy in the
            # original frame
            if not g.size:
                return np.zeros((0, 4), np.float32)
            cx, cy, w, h = g.T
            gx = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
            oh, ow = orig[i]
            return gx * np.array([ow, oh, ow, oh], np.float32)

        cb = batch.get("crowd_boxes")
        for i in range(real):
            keep = scores[i] > score_floor
            v = gt_valid[i]
            crowd_kw = {}
            if cb is not None:
                cv = np.asarray(batch["crowd_valid"])[i]
                crowd_kw = dict(
                    crowd_boxes=denorm(np.asarray(cb)[i][cv], i),
                    crowd_labels=np.asarray(batch["crowd_labels"])[i][cv],
                )
            if "gt_areas" in batch:
                crowd_kw["gt_areas"] = np.asarray(batch["gt_areas"])[i][v]
            evaluator.add(
                int(ids[i]), boxes[i][keep], scores[i][keep], labels[i][keep],
                denorm(gt_boxes_n[i][v], i), gt_labels[i][v], **crowd_kw,
            )
            n_images += 1
    res = evaluator.summarize()
    res["n_images"] = float(n_images)
    if timed_images:
        res["sec_per_img"] = compute_time / timed_images
        res["images_per_sec"] = timed_images / compute_time
    if class_names is not None:
        # the per-category AP table the reference prints per eval
        # (`evaluation/coco_evaluation.py:205-269`)
        logger.info("per-category AP:\n%s", evaluator.per_category_table(class_names))
        res["per_category_AP"] = {
            n: float(v)
            for n, v in zip(class_names, evaluator.per_category_ap())
        }
    return res
