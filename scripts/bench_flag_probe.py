"""Probe one LIBTPU_INIT_ARGS setting against the MSDA hot paths.

Usage: LIBTPU_INIT_ARGS="--xla_tpu_...=true" python scripts/bench_flag_probe.py [fwd|bwd|both]

Times (axon measurement rules: value fetch, fresh jitter per call, pipelined
to amortize relay RTT):
  fwd — production `ms_deform_attn_xla_quad` at encoder scale b=1
  bwd — `jax.grad` of sum(ms_deform_attn_quad) wrt value (scatter-dominated)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    import jax
    import jax.numpy as jnp

    from ziragroundingdino_tpu.ops import msda

    log("device:", jax.devices()[0])
    log("LIBTPU_INIT_ARGS:", os.environ.get("LIBTPU_INIT_ARGS", "<unset>"))

    h, w = 800, 1216
    shapes = tuple((-(-h // s), -(-w // s)) for s in (8, 16, 32, 64))
    S = sum(a * b for a, b in shapes)
    B, H, D, L, P = 1, 8, 32, 4, 4
    Q = S
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Q, H, L, P), jnp.float32).reshape(B, Q, H, -1)
    ).reshape(B, Q, H, L, P)

    def timed(f, *a, iters=8):
        t0 = time.time()
        float(f(*a, jnp.float32(0)))
        log(f"  compile {time.time()-t0:.1f}s")
        float(f(*a, jnp.float32(0.5)))
        times = []
        for rep in range(3):
            t0 = time.time()
            acc = [f(*a, jnp.float32(1 + rep * iters + i)) for i in range(iters)]
            float(jnp.stack(acc).sum())
            times.append((time.time() - t0) / iters)
        return min(times) * 1e3

    if which in ("fwd", "both"):
        fwd = jax.jit(lambda v, l, a, j: jnp.sum(
            msda.ms_deform_attn_xla_quad(v + j * 1e-6, shapes, l, a
                                         ).astype(jnp.float32)))
        ms = timed(fwd, value, loc, aw)
        print(f"fwd: {ms:.2f} ms/call", flush=True)

    if which in ("bwd", "both"):
        def loss(v, l, a, j):
            return jnp.sum(msda.ms_deform_attn_quad(
                v + j * 1e-6, shapes, l, a).astype(jnp.float32))
        bwd = jax.jit(lambda v, l, a, j: jnp.sum(
            jax.grad(loss)(v, l, a, j).astype(jnp.float32)))
        ms = timed(bwd, value, loc, aw, iters=4)
        print(f"fwd+bwd(value): {ms:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
