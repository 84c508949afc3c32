"""Detection post-processing.

Parity with `dt_inference` (`groundingdino_dt.py:701-742` /
`groundingdino_dual_zero_rep_branch.py:634-675`): sigmoid the per-category
logits, take the global top-k over (query x class), gather boxes, convert
cxcywh->xyxy and scale to the original image size (the combination of
`Boxes.scale(image_size)` + `detector_postprocess(height, width)` — boxes are
normalized w.r.t. the resized image, so scaling straight to the original
size is the same composition, with clipping)."""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.ops.box_ops import box_cxcywh_to_xyxy


def top_k_detections(
    class_logits: jnp.ndarray,  # [B, Q, C] per-category logits
    pred_boxes: jnp.ndarray,  # [B, Q, 4] cxcywh normalized
    k: int = 200,
) -> Dict[str, jnp.ndarray]:
    b, q, c = class_logits.shape
    prob = jax.nn.sigmoid(class_logits.astype(jnp.float32)).reshape(b, q * c)
    # the reference's select_box_nums_for_evaluation=200 can exceed Q*C for
    # tiny dev configs; clamp like torch.topk(min(k, n)) would require
    k = min(k, q * c)
    scores, idx = jax.lax.top_k(prob, k)  # [B, K]
    query = idx // c
    labels = idx % c
    boxes = jnp.take_along_axis(pred_boxes, query[..., None], axis=1)  # [B, K, 4]
    return {"scores": scores, "labels": labels, "boxes_cxcywh": boxes}


def scale_to_original(
    boxes_cxcywh: jnp.ndarray,  # [B, K, 4] normalized
    orig_sizes: jnp.ndarray,  # [B, 2] (h, w)
) -> jnp.ndarray:
    """xyxy absolute in the original image frame, clipped."""
    xyxy = box_cxcywh_to_xyxy(boxes_cxcywh.astype(jnp.float32))
    h = orig_sizes[:, 0:1].astype(jnp.float32)
    w = orig_sizes[:, 1:2].astype(jnp.float32)
    scale = jnp.concatenate([w, h, w, h], axis=-1)[:, None, :]
    xyxy = xyxy * scale
    lo = jnp.zeros_like(scale)
    return jnp.clip(xyxy, lo, scale)
