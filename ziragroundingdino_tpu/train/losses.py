"""Standalone loss library (mmdet-style).

Parity with `models/GroundingDINO/losses/*.py` (~700 LoC of FocalLoss /
GIoULoss / L1Loss / CrossEntropyLoss / DiceLoss feeding the alternative
`BaseCriterion`, `criterion/base_criterion.py`). Functional jnp versions with
the same reduction/avg_factor semantics.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.ops.box_ops import (
    box_cxcywh_to_xyxy,
    generalized_box_iou_elementwise,
)


def reduce_loss(loss: jnp.ndarray, weight: Optional[jnp.ndarray], reduction: str,
                avg_factor: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "mean":
        if avg_factor is None:
            return jnp.mean(loss)
        return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-12)
    raise ValueError(reduction)


def sigmoid_focal_loss(
    pred: jnp.ndarray, target: jnp.ndarray, weight=None,
    alpha: float = 0.25, gamma: float = 2.0,
    reduction: str = "mean", avg_factor=None,
) -> jnp.ndarray:
    """Elementwise binary focal loss on logits (targets are one-hot floats)."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    ce = jnp.maximum(pred, 0.0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    p_t = p * t + (1 - p) * (1 - t)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * t + (1 - alpha) * (1 - t)) * loss
    return reduce_loss(loss, weight, reduction, avg_factor)


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    return reduce_loss(jnp.abs(pred - target), weight, reduction, avg_factor)


def smooth_l1_loss(pred, target, beta: float = 1.0, weight=None,
                   reduction="mean", avg_factor=None):
    d = jnp.abs(pred - target)
    loss = jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)
    return reduce_loss(loss, weight, reduction, avg_factor)


def giou_loss(pred_cxcywh, target_cxcywh, weight=None, reduction="mean",
              avg_factor=None):
    giou = generalized_box_iou_elementwise(
        box_cxcywh_to_xyxy(pred_cxcywh), box_cxcywh_to_xyxy(target_cxcywh)
    )
    return reduce_loss(1.0 - giou, weight, reduction, avg_factor)


def cross_entropy_loss(pred_logits, target_idx, weight=None, reduction="mean",
                       avg_factor=None):
    logp = jax.nn.log_softmax(pred_logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, target_idx[..., None], axis=-1)[..., 0]
    return reduce_loss(loss, weight, reduction, avg_factor)


def dice_loss(pred, target, weight=None, eps: float = 1e-3, reduction="mean",
              avg_factor=None):
    """pred: logits over flattened masks [N, M]; target in {0,1}."""
    p = jax.nn.sigmoid(pred.astype(jnp.float32))
    t = target.astype(jnp.float32)
    num = 2.0 * jnp.sum(p * t, axis=-1) + eps
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1) + eps
    return reduce_loss(1.0 - num / den, weight, reduction, avg_factor)
