"""Single-config inference bench: one batch size, full-model jit forward.

Companion to bench.py for perf experiments (e.g. MSDA batch-strategy A/B via
ZGDINO_MSDA_BH_MAX_B — trace-time knob, so each setting needs a fresh
process). Follows the axon-relay measurement rules (BASELINE.md): value-fetch
sync, fresh jitter operand per call.

Usage: [ENV...] python scripts/bench_infer.py --batch 8 [--iters 10]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--profile", default=None,
                    help="directory for a jax.profiler trace of 3 calls")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _text_arrays
    from ziragroundingdino_tpu.models import build_model
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])
    b, h, w, t = args.batch, args.height, args.width, 64
    model = build_model("dualzerorepbranchgroundingdino")
    text_np, _ = _text_arrays(np, 1, t, vocab=30000)
    rng = np.random.RandomState(0)
    pixels = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    mask = jnp.ones((b, h, w), bool)
    text = {k: jnp.asarray(np.repeat(v, b, axis=0)) for k, v in text_np.items()}
    text1 = {k: jnp.asarray(v) for k, v in text_np.items()}

    t0 = time.time()
    params = jax.jit(lambda k: model.init(k, pixels[:1], mask[:1], text1))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    log(f"init {time.time()-t0:.1f}s")

    @jax.jit
    def fwd(params, pixels, mask, text, jitter):
        out = model.apply(params, pixels + jitter * 1e-6, mask, text)
        return jnp.sum(out["pred_boxes"]) + jnp.sum(out["pred_logits"][..., :4])

    t0 = time.time()
    float(fwd(params, pixels, mask, text, jnp.float32(0)))
    log(f"compile+first {time.time()-t0:.1f}s")
    # warmup: the first post-compile execution carries one-off buffer /
    # dispatch costs (~140 ms at b=1) — without this, the 10-iter average
    # reads ~14 ms high (r3: 88.4 vs bench.py's 74.0 on identical code)
    t0 = time.time()
    float(fwd(params, pixels, mask, text, jnp.float32(0.5)))
    log(f"warm single-call {time.time()-t0:.3f}s")
    # Per-call value-fetch timing, min over iters: the r4 relay PENALIZES
    # pipelined dispatch (async 8-deep measured 166 ms/call vs 97-107 ms
    # fully synced on identical code), so an async loop underreads
    # throughput; min-of-n synced calls is robust to relay RTT jitter and
    # still charges every call the full host->device->host round trip.
    times = []
    check = 0.0
    for i in range(args.iters):
        t0 = time.time()
        check += float(fwd(params, pixels, mask, text, jnp.float32(1 + i)))
        times.append(time.time() - t0)
    dt = min(times)
    # upper median for even iteration counts — kept (not statistics.median)
    # so r4/r5 campaign legs stay comparable; min is the primary metric
    med = sorted(times)[len(times) // 2]
    log(f"b={b}: min {dt*1e3:.1f} / med {med*1e3:.1f} ms/batch -> "
        f"{b/dt:.2f} img/s (check={check:.3e})")
    print(f'{{"ms_per_batch": {dt*1e3:.1f}, "ms_per_batch_med": {med*1e3:.1f}, '
          f'"img_per_sec": {b/dt:.3f}, "batch": {b}}}')

    if args.profile:
        with jax.profiler.trace(args.profile):
            for i in range(3):
                float(fwd(params, pixels, mask, text, jnp.float32(100 + i)))
        log("trace written to", args.profile)


if __name__ == "__main__":
    main()
