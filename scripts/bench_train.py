"""Training-step benchmark: ZiRa full-size, b=1, 800x1216, encoder remat.

Mirrors the reference's hot loop (`train_multidatasets.py:150-198`) at the
canonical scale; prints per-step wall time on the attached accelerator.

Usage: python scripts/bench_train.py [--batch 1] [--no-remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _text_arrays
    from ziragroundingdino_tpu.config import OptimizerConfig, ScheduleConfig
    from ziragroundingdino_tpu.models import build_model
    from ziragroundingdino_tpu.train.optim import (
        ZIRA_TRAINABLE_PATTERNS, build_optimizer, trainable_mask,
    )
    from ziragroundingdino_tpu.train.step import TrainState, make_train_step
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])

    b, h, w, t = args.batch, args.height, args.width, 64
    model = build_model(
        "dualzerorepbranchgroundingdino",
        use_checkpoint=not args.no_remat,
        use_transformer_ckpt=not args.no_remat,
    )

    rng = np.random.RandomState(0)
    text_np, c2t = _text_arrays(np, 1, t, vocab=30000)
    n_gt = 8
    batch = {
        "pixels": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "mask": jnp.ones((b, h, w), bool),
        **{k: jnp.asarray(np.repeat(v, b, axis=0)) for k, v in text_np.items()},
        "cate_to_token_mask": jnp.asarray(np.repeat(c2t[:, :16], b, axis=0)),
        "gt_labels": jnp.asarray(rng.randint(0, 8, size=(b, n_gt)), jnp.int32),
        "gt_boxes": jnp.asarray(
            np.clip(rng.rand(b, n_gt, 4) * [1, 1, 0.2, 0.2] + [0, 0, 0.05, 0.05], 0, 1),
            jnp.float32),
        "gt_valid": jnp.ones((b, n_gt), bool),
    }

    pixels1 = batch["pixels"][:1]
    mask1 = batch["mask"][:1]
    text1 = {k: jnp.asarray(v) for k, v in text_np.items()}
    log("init params...")
    t0 = time.time()
    params = jax.jit(lambda k: model.init(k, pixels1, mask1, text1))(
        jax.random.PRNGKey(0)
    )
    jax.block_until_ready(params)
    log(f"init {time.time()-t0:.1f}s")

    mask = trainable_mask(params["params"], ZIRA_TRAINABLE_PATTERNS, freeze_all=True)
    tx = build_optimizer(
        OptimizerConfig(lr=1e-3, grad_clip=0.1, lr_factors=(("freeze", 0.2),)),
        ScheduleConfig(max_iter=1000), params["params"], trainable=mask,
    )

    class Wrap:
        cfg = model.cfg

        @staticmethod
        def apply(p, *a, **k):
            return model.apply({"params": p}, *a, **k)

    state = TrainState(step=jnp.zeros((), jnp.int32), params=params["params"],
                       opt_state=tx.init(params["params"]))
    step = make_train_step(Wrap, tx, matcher_impl="jax", trainable=mask)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, metrics = step(state, batch, key)
    loss = float(metrics["total_loss"])
    log(f"compile+first step {time.time()-t0:.1f}s loss={loss:.3f}")

    times = []
    for i in range(args.iters):
        key = jax.random.fold_in(key, i)
        t0 = time.time()
        state, metrics = step(state, batch, key)
        loss = float(metrics["total_loss"])  # forces full sync
        times.append(time.time() - t0)
        log(f"step {i}: {times[-1]*1e3:.0f} ms loss={loss:.3f}")
    best = min(times)
    log(f"best step: {best*1e3:.0f} ms  ({'remat' if not args.no_remat else 'no-remat'}, b={b})")
    print(f'{{"train_step_ms": {best*1e3:.1f}, "batch": {b}}}')


if __name__ == "__main__":
    main()
