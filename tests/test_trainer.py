"""Trainer loop mechanics: logging, periodic checkpointing, resume-at-iter
(`train_net.py:152-161,298-305` semantics) — with a stub step function so the
test stays fast."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.config import TrainConfig
from ziragroundingdino_tpu.train.step import TrainState
from ziragroundingdino_tpu.train.trainer import (
    Trainer,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)


def fake_loader():
    while True:
        yield {"x": np.ones((2, 4), np.float32)}


def fake_step(state, batch, rng):
    params = jax.tree_util.tree_map(lambda p: p + 1.0, state.params)
    new = state.replace(step=state.step + 1, params=params)
    return new, {"total_loss": jnp.sum(params["w"]) * 0.0 + 1.0 / (state.step + 1)}


def make_state():
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params={"w": jnp.zeros((3,), jnp.float32)},
        opt_state={"momentum": jnp.ones((3,), jnp.float32)},
    )


def test_train_checkpoint_resume(tmp_path):
    cfg = TrainConfig(
        output_dir=str(tmp_path), max_iter=10, checkpoint_period=5, log_period=2,
    )
    tr = Trainer(fake_step, make_state(), fake_loader(), cfg)
    assert tr.resume_or_load() == 0
    tr.train(0, 10)

    metrics = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert metrics[-1]["iteration"] == 10
    assert latest_checkpoint(str(tmp_path / "ckpt")).endswith("step_10")
    assert float(np.asarray(tr.state.params["w"])[0]) == 10.0

    # fresh trainer resumes from step 10 with restored params
    tr2 = Trainer(fake_step, make_state(), fake_loader(), cfg)
    start = tr2.resume_or_load()
    assert start == 10
    np.testing.assert_allclose(np.asarray(tr2.state.params["w"]), 10.0)
    np.testing.assert_allclose(np.asarray(tr2.state.opt_state["momentum"]), 1.0)


def test_midtask_preemption_resume(tmp_path):
    """Kill-and-restart mid-task: a crash between periodic checkpoints must
    resume at the checkpointed iter+1 (`train_net.py:298-305`), not replay
    the task from 0."""
    cfg = TrainConfig(
        output_dir=str(tmp_path), max_iter=10, checkpoint_period=2, log_period=5,
    )
    calls = {"n": 0}

    def crashing_step(state, batch, rng):
        if calls["n"] == 5:
            raise RuntimeError("preempted")
        calls["n"] += 1
        return fake_step(state, batch, rng)

    tr = Trainer(crashing_step, make_state(), fake_loader(), cfg)
    try:
        tr.train(0, 10)
        raise AssertionError("expected preemption")
    except RuntimeError:
        pass
    assert latest_checkpoint(str(tmp_path / "ckpt")).endswith("step_4")

    tr2 = Trainer(fake_step, make_state(), fake_loader(), cfg)
    start = tr2.resume_or_load()
    assert start == 4
    np.testing.assert_allclose(np.asarray(tr2.state.params["w"]), 4.0)
    tr2.train(start, 10)
    np.testing.assert_allclose(np.asarray(tr2.state.params["w"]), 10.0)


def test_fast_dev_run(tmp_path):
    cfg = TrainConfig(output_dir=str(tmp_path), max_iter=1000, fast_dev_run=True,
                      checkpoint_period=1000, log_period=10)
    tr = Trainer(fake_step, make_state(), fake_loader(), cfg)
    tr.train()
    assert float(np.asarray(tr.state.params["w"])[0]) == 20.0
