"""Box coordinate utilities.

Functional JAX counterparts of the reference's `util/box_ops.py:9-144`
(cxcywh<->xyxy conversion, pairwise IoU / generalized IoU) plus elementwise
variants used by the criterion. All functions are shape-polymorphic over
leading batch dims and jit-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x0, y0, x1, y1); `util/box_ops.py:9-14`."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    """(x0, y0, x1, y1) -> (cx, cy, w, h); `util/box_ops.py:17-22`."""
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes [..., 4] -> [...]."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_pairwise_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """All-pairs IoU of xyxy boxes: [N, 4] x [M, 4] -> ([N, M] iou, [N, M] union).

    Mirrors `util/box_ops.py:26-41`.
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-6)
    return iou, union


def generalized_box_iou_matrix(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs GIoU of xyxy boxes; `util/box_ops.py:44-65`.

    Degenerate boxes (x1 < x0) are NOT asserted against (jit); callers mask.
    """
    iou, union = box_iou_pairwise_matrix(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-6)


def box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of aligned xyxy boxes [..., 4]; `util/box_ops.py:68-83`."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    return inter / jnp.maximum(union, 1e-6), union


def generalized_box_iou_elementwise(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned xyxy boxes; `util/box_ops.py:86-108`."""
    iou, union = box_iou_elementwise(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / jnp.maximum(area, 1e-6)


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks [N, H, W]; `util/box_ops.py:111-144`."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    big = 1e8
    m = masks.astype(jnp.float32)
    x_mask = m * xs
    x_max = x_mask.max(axis=(1, 2))
    x_min = jnp.where(masks, x_mask, big).min(axis=(1, 2))
    y_mask = m * ys
    y_max = y_mask.max(axis=(1, 2))
    y_min = jnp.where(masks, y_mask, big).min(axis=(1, 2))
    return jnp.stack([x_min, y_min, x_max, y_max], axis=1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Logit with the reference's clamping (`util/misc.py:704-709`)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)
