"""Single-task trainer: loop, logging, checkpoint/resume, eval hook.

Capability parity with the reference engine:
  * `Trainer(SimpleTrainer)` loop + AMP + grad-accum (`train_net.py:53-161`)
    — AMP is bf16-native, accumulation lives in optax.MultiSteps;
  * hooks: IterationTimer / LRScheduler / PeriodicCheckpointer / EvalHook /
    PeriodicWriter (`train_net.py:259-295`) — collapsed into the loop;
  * checkpoint state {model, optimizer, scaler, iteration}
    (`train_net.py:152-161`) -> Orbax {params, opt_state, step, ema};
  * resume at iter+1 (`train_net.py:298-305`);
  * metric writers: CommonMetricPrinter + JSONWriter(metrics.json)
    (`train_net.py:271-278`) -> stdout lines + metrics.jsonl;
  * `fast_dev_run` shrink-to-20-iters knob (`train_net.py:313-317`).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.config import TrainConfig
from ziragroundingdino_tpu.train.step import TrainState

logger = logging.getLogger("ziragroundingdino_tpu")


class JSONLWriter:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.f = open(path, "a")

    def write(self, step: int, metrics: Dict[str, float]):
        rec = {"iteration": step}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


# ---------------------------------------------------------------------------
# Orbax checkpointing (SURVEY §5 checkpoint/resume)
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state: TrainState, step: int, extra: Optional[dict] = None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step}"))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "step": np.asarray(step),
        "params": state.params,
        "opt_state": state.opt_state,
    }
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    if extra:
        payload["extra"] = extra
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    # last-checkpoint marker (detectron2 writes `last_checkpoint`)
    with open(os.path.join(ckpt_dir, "last_checkpoint"), "w") as f:
        f.write(f"step_{step}")
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    marker = os.path.join(ckpt_dir, "last_checkpoint")
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        return os.path.join(ckpt_dir, f.read().strip())


def restore_checkpoint(path: str, template: dict) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


# ---------------------------------------------------------------------------


class Trainer:
    """Minimal-state loop driving a jitted step function."""

    def __init__(
        self,
        step_fn: Callable,  # (state, batch, rng) -> (state, metrics)
        state: TrainState,
        loader: Iterable[Dict[str, np.ndarray]],
        cfg: TrainConfig,
        eval_fn: Optional[Callable] = None,  # (state) -> dict, run at eval_period
        rng: Optional[jax.Array] = None,
    ):
        self.step_fn = step_fn
        self.state = state
        self.loader = iter(loader)
        self.cfg = cfg
        self.eval_fn = eval_fn
        self.rng = rng if rng is not None else jax.random.PRNGKey(cfg.seed)
        self.writer = JSONLWriter(os.path.join(cfg.output_dir, "metrics.jsonl"))
        self.eval_results: list = []

    def train(self, start_iter: int = 0, max_iter: Optional[int] = None):
        cfg = self.cfg
        max_iter = max_iter or cfg.max_iter
        if cfg.fast_dev_run:
            max_iter = min(max_iter, 20)  # `train_net.py:313-317`
        t_data = t_step = 0.0
        t0 = time.perf_counter()
        for it in range(start_iter, max_iter):
            batch = next(self.loader)
            batch = {k: jnp.asarray(v) for k, v in batch.items() if k != "real_count"}
            t1 = time.perf_counter()
            # per-iteration key derived by COUNTER, not by sequential splits:
            # a mid-task resume at start_iter then draws the same dropout/
            # gating randomness an uninterrupted run would, without having to
            # checkpoint the key (`train_net.py:298-305` resume semantics)
            sub = jax.random.fold_in(self.rng, it)
            self.state, metrics = self.step_fn(self.state, batch, sub)
            t_data += t1 - t0  # accumulated EVERY iteration over the period
            t_step += time.perf_counter() - t1
            if (it + 1) % cfg.log_period == 0 or it + 1 == max_iter:
                metrics = jax.device_get(metrics)
                line = {
                    k: float(np.asarray(v)) for k, v in metrics.items()
                }
                line["data_time"] = t_data
                line["step_time"] = t_step
                t_data = t_step = 0.0
                self.writer.write(it + 1, line)
                logger.info(
                    "iter %d/%d total_loss %.4f", it + 1, max_iter,
                    line.get("total_loss", float("nan")),
                )
            if (it + 1) % cfg.checkpoint_period == 0 or it + 1 == max_iter:
                save_checkpoint(
                    os.path.join(cfg.output_dir, "ckpt"), self.state, it + 1
                )
            if self.eval_fn is not None and (it + 1) % cfg.eval_period == 0:
                self.eval_results.append((it + 1, self.eval_fn(self.state)))
            t0 = time.perf_counter()
        return self.state

    def resume_or_load(self) -> int:
        """Resume from the last checkpoint in output_dir/ckpt, returning the
        start iteration (`train_net.py:298-305`)."""
        path = latest_checkpoint(os.path.join(self.cfg.output_dir, "ckpt"))
        if path is None:
            return 0
        template = {
            "step": np.asarray(0),
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        if self.state.ema_params is not None:
            template["ema_params"] = self.state.ema_params
        restored = restore_checkpoint(path, template)
        self.state = self.state.replace(
            step=jnp.asarray(restored["step"]),
            params=restored["params"],
            opt_state=restored["opt_state"],
            ema_params=restored.get("ema_params", self.state.ema_params),
        )
        return int(restored["step"])
