"""Do per-head MSDA gather and weighted-reduce chains overlap on device?

A: 8 per-head gathers only (engine-bound)
B: 8 weighted reduces on pre-gathered row blocks (VPU/HBM-bound)
C: 8 full gather->reduce chains (the production `_quad_small_batch` shape)

If C ~= A + B the core serializes the engine against the VPU; if C ~= max(A, B)
the DMA engine runs the gathers asynchronously. In-jit scan reps amortize the
relay RTT; indices vary with the rep AND the jitter (axon measurement rules).
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
    import jax
    import jax.numpy as jnp

    from ziragroundingdino_tpu.ops import msda

    log("device:", jax.devices()[0])
    h, w = 800, 1216
    shapes = tuple((-(-h // s), -(-w // s)) for s in (8, 16, 32, 64))
    S = sum(a * b for a, b in shapes)
    sq = sum(msda._quad_sizes(shapes))
    H, D, K = 8, 32, 16
    Q = S
    reps = 20
    rng = np.random.RandomState(0)
    tables = jnp.asarray(rng.randn(H, sq, 4 * D), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, sq, size=(H, Q, K)), jnp.int32)
    w4 = jnp.asarray(rng.rand(H, Q, K, 4), jnp.bfloat16)
    blocks = jnp.asarray(rng.randn(H, Q, K, 4 * D), jnp.bfloat16)

    def gather_h(tb, ci):
        return jax.lax.gather(
            tb, ci.reshape(-1, 1), msda._GATHER_DNUMS, slice_sizes=(1, 4 * D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(Q, K, 4 * D)

    def reduce_h(g, wh):
        return jnp.sum(g * msda._lane_expand(wh, D), axis=1, dtype=jnp.float32)

    @jax.jit
    def run_a(tables, idx, jitter):
        def step(carry, r):
            acc = carry
            for hh in range(H):
                ci = (idx[hh] + r + jitter.astype(jnp.int32)) % sq
                acc = acc + gather_h(tables[hh], ci).sum(dtype=jnp.float32)
            return acc, None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out

    @jax.jit
    def run_b(blocks, w4, jitter):
        def step(carry, r):
            acc = carry
            sc = (r + jitter).astype(jnp.bfloat16) * 1e-6
            for hh in range(H):
                acc = acc + reduce_h(blocks[hh] + sc, w4[hh])[0].sum(dtype=jnp.float32)
            return acc, None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out

    @jax.jit
    def run_c(tables, idx, w4, jitter):
        def step(carry, r):
            acc = carry
            for hh in range(H):
                ci = (idx[hh] + r + jitter.astype(jnp.int32)) % sq
                acc = acc + reduce_h(gather_h(tables[hh], ci), w4[hh])[0].sum(
                    dtype=jnp.float32)
            return acc, None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(reps))
        return out

    def timed(f, *a):
        t0 = time.time()
        float(f(*a, jnp.float32(0)))
        log(f"  compile {time.time()-t0:.1f}s")
        best = None
        for trial in range(3):
            t0 = time.time()
            float(f(*a, jnp.float32(trial + 1)))
            dt = (time.time() - t0) / reps
            best = dt if best is None else min(best, dt)
        return best * 1e3

    ta = timed(run_a, tables, idx)
    log(f"A gathers only      : {ta:.2f} ms")
    tb = timed(run_b, blocks, w4)
    log(f"B reduces only      : {tb:.2f} ms")
    tc = timed(run_c, tables, idx, w4)
    log(f"C gather+reduce     : {tc:.2f} ms  (serial={ta+tb:.2f}, overlap={max(ta,tb):.2f})")
    print(f"{{\"A_ms\": {ta:.2f}, \"B_ms\": {tb:.2f}, \"C_ms\": {tc:.2f}}}")


if __name__ == "__main__":
    main()
