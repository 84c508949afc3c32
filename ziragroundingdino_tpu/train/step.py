"""Functional train/eval steps.

Replaces `Trainer.run_step` (`train_multidatasets.py:150-200`,
`train_net.py:92-142`): one pure function params->loss, differentiated and
jitted; AMP is bf16-native (no GradScaler — `train_net.py:75-131`'s scaler
exists only for fp16), grad accumulation lives in the optimizer
(optax.MultiSteps), DDP is a sharded batch under jit (psum emitted by XLA).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ziragroundingdino_tpu.config import GroundingDINOConfig
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO
from ziragroundingdino_tpu.text.masks import recover_to_cls_logits
from ziragroundingdino_tpu.train.criterion import set_criterion, weighted_total


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Optional[Any] = None


def class_logits_from_tokens(token_logits, cate_to_token_mask, fill=-100.0):
    """Token-level [B,Q,max_text_len] -> per-category [B,Q,C] logits
    (`recover_to_cls_logits`, `utils.py:312-320`; the dt/ZiRa training path
    feeds these to the criterion, `groundingdino_dual_zero_rep_branch.py:
    547-552`)."""
    t = cate_to_token_mask.shape[-1]
    return recover_to_cls_logits(token_logits[..., :t], cate_to_token_mask, fill=fill)


def compute_losses(
    model: GroundingDINO,
    params,
    batch: Dict[str, jnp.ndarray],
    train: bool = True,
    matcher_impl: str = "jax",
    rngs: Optional[Dict] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    cfg = model.cfg
    text = {
        k: batch[k]
        for k in (
            "input_ids", "text_token_mask", "position_ids",
            "text_self_attention_masks",
        )
    }
    out = model.apply(
        params, batch["pixels"], batch["mask"], text,
        train=train, deterministic=rngs is None, rngs=rngs,
    )
    c2t = batch["cate_to_token_mask"]

    def to_cls(o):
        return dict(o, pred_logits=class_logits_from_tokens(o["pred_logits"], c2t))

    outputs = to_cls(out)
    if "aux_outputs" in out:
        outputs["aux_outputs"] = [to_cls(a) for a in out["aux_outputs"]]
        outputs["interm_outputs"] = to_cls(out["interm_outputs"])

    losses = set_criterion(
        outputs, batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"],
        matcher_impl=matcher_impl,
    )
    total = weighted_total(losses)

    # ZiRa zero-interference losses (`groundingdino_dual_zero_rep_branch.py:
    # 584-587`), weight `loss_adapter_weight`
    al = out["adapter_losses"]
    if cfg.use_project_adapter and cfg.use_zero_inter_loss_for_conv:
        losses["loss_conv_adapter"] = al["loss_conv_adapter"] * cfg.loss_adapter_weight
        total = total + losses["loss_conv_adapter"]
    if cfg.use_cet and cfg.use_zero_inter_loss:
        losses["loss_linear_adapter"] = al["loss_linear_adapter"] * cfg.loss_adapter_weight
        total = total + losses["loss_linear_adapter"]
    if cfg.use_adapter:
        losses["loss_adapter"] = al["loss_adapter"] * cfg.loss_adapter_weight
        total = total + losses["loss_adapter"]
    losses["total_loss"] = total
    return total, losses


def make_train_step(
    model: GroundingDINO,
    tx: optax.GradientTransformation,
    matcher_impl: str = "jax",
    ema_decay: Optional[float] = None,
    donate: bool = True,
    trainable: Optional[Any] = None,
):
    """Returns jitted (state, batch, rng) -> (state, metrics).

    `trainable` (bool pytree over params) stops gradients INTO frozen leaves
    at trace time, so XLA never emits their weight-gradient matmuls — the
    reference's requires_grad=False equivalent (`groundingdino_dual_zero_
    rep_branch.py:722-737`); the optimizer's set_to_zero partition remains
    the safety net when no mask is given. Activation gradients still flow
    THROUGH frozen modules (side branches upstream need them)."""

    def step_fn(state: TrainState, batch, rng):
        rngs = {"dropout": rng, "gating": jax.random.fold_in(rng, 1)}

        def loss_fn(params):
            if trainable is not None:
                params = jax.tree_util.tree_map(
                    lambda p, t: p if t else jax.lax.stop_gradient(p),
                    params, trainable,
                )
            return compute_losses(
                model, params, batch, train=True,
                matcher_impl=matcher_impl, rngs=rngs,
            )

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = state.ema_params
        if ema is not None and ema_decay is not None:
            ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p, ema, params
            )
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model: GroundingDINO):
    """jitted (params, batch) -> raw outputs (token logits + boxes)."""

    def eval_fn(params, batch):
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
        return {
            "pred_logits": out["pred_logits"],
            "pred_boxes": out["pred_boxes"],
        }

    return jax.jit(eval_fn)
