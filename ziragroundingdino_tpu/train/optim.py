"""Optimizer / LR schedule / trainable-leaf selection (optax).

Capability parity:
  * AdamW lr=1e-3, wd=1e-4 + grad clip 0.1 — `config/configs/common/optim.py:
    16-28` and task configs (`test_odinw13_softfreeze/for_train/
    test_aquarium.py:20-26`)
  * per-parameter LR factors replacing detectron2 `lr_factor_func`
    ("soft-freeze": x0.2 on params whose path contains "freeze";
    backbone x0.1 in COCO configs)
  * multi-step schedule: x0.1 at 8/9 and 17/18 of the run
    (`coco_schedule.py:91-125` modified_coco_scheduler) + the multistep/
    cosine/linear/constant factories of `common_schedule.py:15-184`
  * trainable-subset selection replacing `before_train` freeze/unfreeze
    (`groundingdino_dual_zero_rep_branch.py:722-737`): the frozen base is
    masked out of the optimizer: frozen-leaf grads are zeroed at the head
    of the optax chain — BEFORE the global-norm clip, so the clip norm
    matches the reference's trainable-only norm (`train_net.py:144-150`)
  * grad accumulation `batch_size_scale` via optax.MultiSteps
    (`train_net.py:128-140`)
  * EMA — `util/ema.py:36-263`.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ziragroundingdino_tpu.config import OptimizerConfig, ScheduleConfig


def path_of(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def label_tree(params, fn: Callable[[str], str]):
    return jax.tree_util.tree_map_with_path(lambda p, _: fn(path_of(p)), params)


# ---------------------------------------------------------------------------
# trainable-leaf selection (the reference's before_train hook)
# ---------------------------------------------------------------------------

# patterns matching the reference's 'unfreeze "adapter"-named params'
# (`groundingdino_dual_zero_rep_branch.py:722-737`); our param paths use the
# same vocabulary (rep_linear_adapter, input_proj_conv_adapter, cet_adapter...)
ZIRA_TRAINABLE_PATTERNS = ("adapter",)


def trainable_patterns_for_cfg(cfg) -> Tuple[str, ...]:
    """The reference's full before_train unfreeze matrix
    (`groundingdino_dt.py:775-783`): "adapter" always, plus per-PET-baseline
    module groups. Prompt memory lives outside the param tree here
    (IncrementalState.prompt_memory), so use_prompt_tuning adds nothing to
    the PARAM mask."""
    pats = ["adapter"]
    if getattr(cfg, "use_bert_tuning", False):
        pats += ["bert", "feat_map"]
    if getattr(cfg, "use_cls_linear", False):
        pats += ["class_embed", "bbox_embed"]
    if getattr(cfg, "use_project_tuning", False):
        pats += ["input_proj"]
    return tuple(pats)


def trainable_mask(params, patterns: Sequence[str], freeze_all: bool = True):
    """bool pytree: True = optimize this leaf. freeze_all=False trains
    everything (the finetune preset, `GroundingDINO_SwinT_OGC_dt_finetuning`).
    Patterns are substring matches on the slash-joined path, like the
    reference's `if "adapter" in name` loops."""
    if not freeze_all:
        return jax.tree_util.tree_map(lambda _: True, params)
    return label_tree(params, lambda p: any(pat in p for pat in patterns))


def lr_factor_fn(lr_factors: Tuple[Tuple[str, float], ...]) -> Callable[[str], float]:
    def fn(path: str) -> float:
        f = 1.0
        for pat, factor in lr_factors:
            if pat in path:
                f *= factor
        return f

    return fn


# ---------------------------------------------------------------------------
# schedules
# ---------------------------------------------------------------------------


def make_schedule(cfg: ScheduleConfig) -> optax.Schedule:
    if cfg.name == "multistep":
        bounds = {
            int(round(f * cfg.max_iter)): cfg.gamma for f in cfg.milestones_frac
        }
        sched = optax.piecewise_constant_schedule(1.0, bounds)
    elif cfg.name == "cosine":
        sched = optax.cosine_decay_schedule(1.0, cfg.max_iter)
    elif cfg.name == "linear":
        sched = optax.linear_schedule(1.0, 0.0, cfg.max_iter)
    elif cfg.name == "constant":
        sched = optax.constant_schedule(1.0)
    elif cfg.name == "exponential":
        sched = optax.exponential_decay(1.0, cfg.max_iter, cfg.gamma)
    else:
        raise ValueError(cfg.name)

    if cfg.warmup_iter > 0:
        warm = optax.linear_schedule(cfg.warmup_factor, 1.0, cfg.warmup_iter)
        return optax.join_schedules([warm, sched], [cfg.warmup_iter])
    return sched


# ---------------------------------------------------------------------------
# optimizer
# ---------------------------------------------------------------------------


def build_optimizer(
    cfg: OptimizerConfig,
    schedule_cfg: ScheduleConfig,
    params,
    trainable: Optional[object] = None,  # bool pytree; None = all trainable
    batch_size_scale: int = 1,
) -> optax.GradientTransformation:
    sched = make_schedule(schedule_cfg)
    factor = lr_factor_fn(cfg.lr_factors)

    def one_group(lr_mult: float) -> optax.GradientTransformation:
        if cfg.name == "adamw":
            return optax.adamw(
                learning_rate=lambda step: cfg.lr * lr_mult * sched(step),
                b1=cfg.betas[0], b2=cfg.betas[1],
                weight_decay=cfg.weight_decay,
            )
        if cfg.name == "sgd":
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.sgd(lambda step: cfg.lr * lr_mult * sched(step), momentum=0.9),
            )
        raise ValueError(cfg.name)

    # distinct lr-factor groups via multi_transform
    factors = sorted({1.0} | {
        f for f in jax.tree_util.tree_leaves(label_tree(params, factor))
    })
    label_of = {f: f"lr_{i}" for i, f in enumerate(factors)}
    labels = label_tree(params, lambda p: label_of[factor(p)])
    if trainable is not None:
        labels = jax.tree_util.tree_map(
            lambda lbl, t: lbl if t else "frozen", labels, trainable
        )
    transforms = {label_of[f]: one_group(f) for f in factors}
    transforms["frozen"] = optax.set_to_zero()
    # grad clip over the GLOBAL norm of TRAINABLE leaves only: the reference
    # builds the optimizer from requires_grad params and clips that set
    # (`train_net.py:144-150`), so frozen-base gradients must not inflate the
    # clip norm. Zero them BEFORE clip_by_global_norm.
    chain = []
    if trainable is not None:
        frozen = jax.tree_util.tree_map(lambda t: not t, trainable)
        chain.append(optax.masked(optax.set_to_zero(), frozen))
    if cfg.grad_clip:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip))
    chain.append(optax.multi_transform(transforms, labels))
    tx = optax.chain(*chain)
    if batch_size_scale > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=batch_size_scale)
    return tx


# ---------------------------------------------------------------------------
# EMA (`util/ema.py:36-263`)
# ---------------------------------------------------------------------------


def ema_init(params):
    return jax.tree_util.tree_map(lambda x: x, params)


def ema_update(ema, params, decay: float = 0.999):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params
    )
