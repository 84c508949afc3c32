"""Incremental (IVLOD) driver: sequential tasks + ZiRa lifecycle.

Capability parity with `train_multidatasets.py`:
  * task loop with optional shuffle, chaining params task->task
    (`:473-494`);
  * `before_train` = trainable-leaf masking (freeze all, unfreeze adapters,
    `groundingdino_dual_zero_rep_branch.py:722-737`);
  * `after_train` = `__rep__` merge of every RepZero module (`:739-745`)
    + `add_cls_prompt` for the task's classes (`train_multidatasets.py:
    221-228` -> `groundingdino_dt.py:379-437`);
  * prompt-memory pool: per-class text-token embeddings captured after each
    task; `replay_memory` text-side distillation (`groundingdino_dt.py:
    786-838`) driven by `MemoryReplayer` (`train_multidatasets.py:257-312`);
  * learned-name caption augmentation (`groundingdino_dt.py:452-460`);
  * final eval over all tasks + COCO zero-shot retention, avg-AP report
    (`train_multidatasets.py:509-561`).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.config import (
    DataConfig,
    GroundingDINOConfig,
    OptimizerConfig,
    ScheduleConfig,
    TrainConfig,
)
from ziragroundingdino_tpu.models.groundingdino import GroundingDINO, TextEncoderOnly
from ziragroundingdino_tpu.models.zira import rep_merge
from ziragroundingdino_tpu.text.tokenizer import WordPieceTokenizer, tokenize_captions

logger = logging.getLogger("ziragroundingdino_tpu")


# ---------------------------------------------------------------------------
# prompt memory
# ---------------------------------------------------------------------------


def encode_class_tokens(
    cfg: GroundingDINOConfig,
    params,
    tokenizer: WordPieceTokenizer,
    class_names: Sequence[str],
    max_text_len: int = 256,
):
    """Runs the text path on '.'.join(classes), returns (encoded_text [T,E],
    cate_to_token_mask [C, T]) for batch row 0."""
    caption = ".".join(class_names) + "."
    tb = tokenize_captions(
        tokenizer, [caption], max_text_len=max_text_len,
        max_categories=max(len(class_names), 1),
    )
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}
    enc = TextEncoderOnly(cfg)
    encoded, _ = enc.apply({"params": params}, text, train=False)
    return np.asarray(encoded[0], np.float32), tb.cate_to_token_mask[0], tb


def add_cls_prompt(
    prompt_memory: Dict[str, np.ndarray],
    cfg: GroundingDINOConfig,
    params,
    tokenizer: WordPieceTokenizer,
    class_names: Sequence[str],
    max_text_len: int = 256,
) -> Dict[str, np.ndarray]:
    """Captures per-class token embeddings into the pool (keys "-name-",
    only for unseen classes — `groundingdino_dt.py:424-432`)."""
    encoded, c2t, _ = encode_class_tokens(cfg, params, tokenizer, class_names, max_text_len)
    for i, name in enumerate(class_names):
        key = f"-{name}-"
        if key not in prompt_memory:
            prompt_memory[key] = encoded[c2t[i]]
    return prompt_memory


def replay_memory_loss(
    cfg: GroundingDINOConfig,
    params,
    tokenizer: WordPieceTokenizer,
    learned_classes: Sequence[str],
    prompt_memory: Dict[str, np.ndarray],
    max_text_len: int = 256,
) -> Dict[str, jnp.ndarray]:
    """Data-free text replay: L1-distill the current text features of learned
    class names toward their stored embeddings (`groundingdino_dt.py:786-838`).
    Differentiable w.r.t. params (side branches)."""
    caption = ".".join(learned_classes) + "."
    tb = tokenize_captions(
        tokenizer, [caption], max_text_len=max_text_len,
        max_categories=max(len(learned_classes), 1),
    )
    text = {k: jnp.asarray(v) for k, v in tb.asdict().items()}

    # host-side: stored embedding per replaced token position + mask
    t, e = tb.input_ids.shape[1], cfg.hidden_dim
    target_vals = np.zeros((t, e), np.float32)
    replace = np.zeros((t,), bool)
    c2t = tb.cate_to_token_mask[0]
    for i, name in enumerate(learned_classes):
        key = f"-{name}-"
        if key in prompt_memory:
            pos = np.flatnonzero(c2t[i])
            stored = prompt_memory[key]
            n = min(len(pos), len(stored))
            target_vals[pos[:n]] = stored[:n]
            replace[pos[:n]] = True
    target_vals = jnp.asarray(target_vals)
    replace = jnp.asarray(replace)

    enc = TextEncoderOnly(cfg)
    encoded, adapter_loss = enc.apply({"params": params}, text, train=True)
    encoded = encoded[0].astype(jnp.float32)  # [T, E]

    # the reference's target is encoded.clone() with replaced positions
    # (`:818-833`): non-replaced positions contribute 0 loss and 0 grad
    diff = jnp.where(replace[:, None], encoded - target_vals, 0.0)
    losses = {"loss_prompt_memory": jnp.mean(jnp.abs(diff)) * 0.5}
    if cfg.use_zero_inter_loss:
        losses["loss_adapter_text"] = adapter_loss * cfg.loss_adapter_weight
    return losses


def build_prompt_injection(
    prompt_memory: Dict[str, np.ndarray],
    category_names: Sequence[Sequence[str]],  # per batch row
    cate_to_token_mask: np.ndarray,  # [B, C, T]
    hidden_dim: int,
):
    """(values [B,T,E], mask [B,T]) replacing learned classes' token features
    at inference (`groundingdino_dt.py:521-531`). Pass to the model's
    `prompt_replace_values/mask`."""
    b, c, t = cate_to_token_mask.shape
    values = np.zeros((b, t, hidden_dim), np.float32)
    mask = np.zeros((b, t), bool)
    for bi, names in enumerate(category_names):
        for ci, name in enumerate(names[:c]):
            key = f"-{name}-"
            if key not in prompt_memory:
                continue
            pos = np.flatnonzero(cate_to_token_mask[bi, ci])
            stored = prompt_memory[key]
            n = min(len(pos), len(stored))
            values[bi, pos[:n]] = stored[:n]
            mask[bi, pos[:n]] = True
    return values, mask


def augment_caption_with_learned_names(
    category_names: Sequence[str],
    learned_classes: Sequence[str],
    num_select: int = 20,
    rng: Optional[np.random.RandomState] = None,
) -> List[str]:
    """use_add_names/use_learned_names (`groundingdino_dt.py:452-460`):
    append up to `num_select` previously-learned class names not in the
    current task to the caption's category list."""
    extra = [c for c in learned_classes if c not in category_names]
    if rng is not None and len(extra) > num_select:
        extra = list(rng.choice(extra, num_select, replace=False))
    else:
        extra = extra[:num_select]
    return list(category_names) + extra


# ---------------------------------------------------------------------------
# the incremental loop
# ---------------------------------------------------------------------------


@dataclass
class TaskSpec:
    name: str
    train_loader_fn: Callable  # (caption_names) -> iterable of batches
    eval_fn: Callable  # (params) -> metrics dict with "AP"
    class_names: List[str] = field(default_factory=list)
    max_iter: int = 2000


@dataclass
class IncrementalState:
    params: Dict
    prompt_memory: Dict[str, np.ndarray] = field(default_factory=dict)
    learned_classes: List[str] = field(default_factory=list)
    per_task_results: List[Dict] = field(default_factory=list)


def save_incremental_state(path: str, state: IncrementalState) -> str:
    """Persist {params, prompt_memory, learned_classes} — the reference's
    task-chained model_final.pth incl. the prompt_memory_pool keys its
    load_state_dict resurrects (`groundingdino_dual_zero_rep_branch.py:
    700-711`)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params}
    if state.prompt_memory:
        payload["prompt_memory"] = {k: np.asarray(v) for k, v in state.prompt_memory.items()}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    with open(path + ".classes.json", "w") as f:
        import json

        json.dump(state.learned_classes, f)
    return path


def load_incremental_state(path: str) -> IncrementalState:
    import json
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    learned: List[str] = []
    if os.path.exists(path + ".classes.json"):
        with open(path + ".classes.json") as f:
            learned = json.load(f)
    return IncrementalState(
        params=restored["params"],
        prompt_memory=dict(restored.get("prompt_memory", {}) or {}),
        learned_classes=learned,
    )


def run_task(
    state: IncrementalState,
    task: TaskSpec,
    model: GroundingDINO,
    make_trainer: Callable,  # (params, task) -> (trainer, extract_params_fn)
    tokenizer: WordPieceTokenizer,
) -> IncrementalState:
    """One incremental step: train on the task with frozen base, then merge
    side branches and capture prompts. Resumes from the task's last mid-task
    checkpoint when one exists (`train_net.py:298-305` resume-at-iter+1);
    the driver's loader fast-forward keeps the data stream aligned."""
    trainer, extract = make_trainer(state.params, task)
    start = trainer.resume_or_load()
    if start:
        logger.info("task %s: resuming at iter %d", task.name, start)
    trainer.train(start, task.max_iter)
    params = extract(trainer.state)

    # after_train hooks (`train_multidatasets.py:221-246`); scaling resets
    # to the CONFIG's init values, not the library defaults
    from ziragroundingdino_tpu.models.zira import scale_reset_for_cfg

    params = rep_merge(params, scale_reset=scale_reset_for_cfg(model.cfg))
    state.prompt_memory = add_cls_prompt(
        state.prompt_memory, model.cfg, params, tokenizer, task.class_names,
        max_text_len=model.cfg.max_text_len,
    )
    for c in task.class_names:
        if c not in state.learned_classes:
            state.learned_classes.append(c)
    state.params = params
    return state


def run_replay_phase(
    state: IncrementalState,
    cfg: GroundingDINOConfig,
    tokenizer: WordPieceTokenizer,
    iters: int = 100,
    lr: float = 1e-4,
    image_batch_fn: Optional[Callable] = None,
    image_loss_fn: Optional[Callable] = None,
) -> IncrementalState:
    """The MemoryReplayer phase (`train_multidatasets.py:257-312`): after the
    task sequence, optimize the side branches against the text-side replay
    distillation (`model.replay_memory()`), optionally combined with image
    losses on a replay dataset (pass image_batch_fn/image_loss_fn for the
    reference's COCO-replay configuration)."""
    import optax

    from ziragroundingdino_tpu.train.optim import (
        ZIRA_TRAINABLE_PATTERNS, trainable_mask,
    )

    if not state.learned_classes:
        return state
    params = state.params
    mask = trainable_mask(params, ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    labels = jax.tree_util.tree_map(lambda t: "train" if t else "frozen", mask)
    tx = optax.multi_transform(
        {"train": optax.adamw(lr), "frozen": optax.set_to_zero()}, labels
    )
    opt_state = tx.init(params)
    learned = list(state.learned_classes)
    pm = state.prompt_memory

    def loss_fn(p, batch=None):
        losses = replay_memory_loss(
            cfg, p, tokenizer, learned, pm, cfg.max_text_len
        )
        total = sum(jax.tree_util.tree_leaves(losses))
        if image_loss_fn is not None and batch is not None:
            total = total + image_loss_fn(p, batch)
        return total

    grad_text = jax.jit(jax.value_and_grad(lambda p: loss_fn(p)))
    grad_image = jax.jit(jax.value_and_grad(loss_fn))  # batch is a traced arg
    for it in range(iters):
        batch = image_batch_fn() if image_batch_fn is not None else None
        if batch is None:
            total, grads = grad_text(params)
        else:
            total, grads = grad_image(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if (it + 1) % 20 == 0 or it == 0:
            logger.info("replay iter %d loss %.6f", it + 1, float(total))
    # merge the replay-phase side-branch deltas like any other task
    from ziragroundingdino_tpu.models.zira import scale_reset_for_cfg

    state.params = rep_merge(jax.device_get(params),
                             scale_reset=scale_reset_for_cfg(cfg))
    return state


def final_report(
    state: IncrementalState,
    tasks: Sequence[TaskSpec],
    coco_eval_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """`train_multidatasets.py:509-561`: eval every task + COCO retention,
    log avg AP."""
    aps = []
    report: Dict[str, float] = {}
    for task in tasks:
        res = task.eval_fn(state.params)
        report[f"AP/{task.name}"] = res["AP"]
        aps.append(res["AP"])
        state.per_task_results.append({task.name: res})
    report["avg_AP"] = float(np.mean(aps)) if aps else float("nan")
    if coco_eval_fn is not None:
        report["coco_zero_shot_AP"] = coco_eval_fn(state.params)["AP"]
    logger.info("incremental final: %s", report)
    return report
