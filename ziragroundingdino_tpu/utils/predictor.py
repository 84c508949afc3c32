"""Serving-grade batched predictor.

Production inference surface (beyond the reference's per-image demo): a
persistent predictor that
  * routes inputs to static shape buckets (image + text-length) so every
    (bucket) pair compiles once and stays cached for the process lifetime;
  * batches multiple images with per-image captions in one device call;
  * returns per-image detections in original-image coordinates.

The reference's closest analogue is `util/inference.py:48` (`predict`, one
image per call, recompiling torch graphs is free there; under jit the bucket
discipline is what makes a long-running service viable).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.config import DataConfig
from ziragroundingdino_tpu.data.transforms import (
    Sample, eval_transform, pad_to_bucket, pick_bucket,
)
from ziragroundingdino_tpu.eval.postprocess import scale_to_original, top_k_detections
from ziragroundingdino_tpu.text.masks import recover_to_cls_logits
from ziragroundingdino_tpu.text.tokenizer import WordPieceTokenizer, tokenize_captions

logger = logging.getLogger("ziragroundingdino_tpu")


class Predictor:
    def __init__(
        self,
        model,
        params,
        tokenizer: WordPieceTokenizer,
        data_cfg: Optional[DataConfig] = None,
        select_k: int = 200,
        text_len_buckets: Sequence[int] = (32, 64, 128, 256),
        batch_buckets: Sequence[int] = (1, 2, 4, 8),
        category_buckets: Sequence[int] = (4, 8, 16, 32, 90),
    ):
        self.model = model
        self.params = params
        self.tokenizer = tokenizer
        self.dcfg = data_cfg or DataConfig()
        self.select_k = select_k
        self.text_len_buckets = tuple(text_len_buckets)
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.category_buckets = tuple(sorted(category_buckets))
        self._compiled: Dict[Tuple, object] = {}

    # ------------------------------------------------------------------
    def _fn(self, shapes_key: Tuple) -> object:
        if shapes_key not in self._compiled:
            logger.info("predictor: compiling bucket %s", shapes_key)

            @jax.jit
            def fn(params, pixels, mask, text, c2t, orig_sizes):
                out = self.model.apply(params, pixels, mask, text, train=False)
                t = c2t.shape[-1]
                cls_logits = recover_to_cls_logits(
                    out["pred_logits"][..., :t], c2t, fill=-100.0
                )
                det = top_k_detections(cls_logits, out["pred_boxes"], k=self.select_k)
                boxes = scale_to_original(det["boxes_cxcywh"], orig_sizes)
                return det["scores"], det["labels"], boxes

            self._compiled[shapes_key] = fn
        return self._compiled[shapes_key]

    def _pad_batch(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        return self.batch_buckets[-1]

    # ------------------------------------------------------------------
    def __call__(
        self,
        images: Sequence[np.ndarray],  # uint8 HWC RGB
        class_lists: Sequence[Sequence[str]],
        score_threshold: float = 0.3,
    ) -> List[Dict[str, np.ndarray]]:
        """Returns per image: {boxes [N,4] xyxy abs, scores [N], labels [N]}."""
        assert len(images) == len(class_lists)
        n = len(images)
        max_b = self.batch_buckets[-1]
        if n > max_b:  # split oversized requests across device calls
            out: List[Dict[str, np.ndarray]] = []
            for i in range(0, n, max_b):
                out.extend(self(images[i : i + max_b], class_lists[i : i + max_b],
                                score_threshold))
            return out
        bsz = self._pad_batch(n)

        samples = []
        for img in images:
            s = Sample(image=np.asarray(img), boxes=np.zeros((0, 4), np.float32),
                       labels=np.zeros((0,), np.int64), orig_size=img.shape[:2])
            samples.append(eval_transform(s, self.dcfg))
        bucket = max(
            (pick_bucket(s.image.shape[0], s.image.shape[1], self.dcfg.shape_buckets)
             for s in samples),
            key=lambda b: b[0] * b[1],
        )
        # ship uint8 and normalize on device (4x less host->device traffic
        # and no host fp32 normalize pass — the model's uint8 path,
        # models/groundingdino.py; same trick as the training loader's
        # transfer_uint8)
        pixels = np.zeros((bsz, *bucket, 3), np.uint8)
        mask = np.zeros((bsz, *bucket), bool)
        orig = np.zeros((bsz, 2), np.int32)
        for i, s in enumerate(samples):
            pixels[i], mask[i] = pad_to_bucket(s.image.astype(np.uint8), bucket)
            orig[i] = s.orig_size
        for i in range(n, bsz):  # repeat-pad
            pixels[i], mask[i], orig[i] = pixels[n - 1], mask[n - 1], orig[n - 1]

        captions = [".".join(c.lower().strip() for c in cl) + "." for cl in class_lists]
        captions += [captions[-1]] * (bsz - n)
        need_c = max(max(len(cl) for cl in class_lists), 1)
        max_c = next((b for b in self.category_buckets if b >= need_c),
                     self.category_buckets[-1])
        tb = tokenize_captions(
            self.tokenizer, captions, max_text_len=self.text_len_buckets[-1],
            max_categories=max_c, text_len_buckets=self.text_len_buckets,
        )

        key = (bsz, bucket, tb.input_ids.shape[1], max_c)
        fn = self._fn(key)
        text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
        scores, labels, boxes = fn(
            self.params, jnp.asarray(pixels), jnp.asarray(mask), text,
            jnp.asarray(tb.cate_to_token_mask), jnp.asarray(orig),
        )
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        boxes = np.asarray(boxes)

        results = []
        for i in range(n):
            keep = scores[i] > score_threshold
            names = list(class_lists[i])
            results.append({
                "boxes": boxes[i][keep],
                "scores": scores[i][keep],
                "labels": labels[i][keep],
                "label_names": [
                    names[j] if j < len(names) else f"cls{j}"
                    for j in labels[i][keep]
                ],
            })
        return results
