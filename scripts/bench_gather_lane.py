"""Microbench: 2-D-start gather (row, lane_offset) vs plain row gather.

Decides whether the flat [B*sq, H*4D] table + lane-offset gather
(`ZGDINO_MSDA_FLAT_GATHER=1`, ops/msda.py) can replace the per-(b,h)
128-lane tables: it removes the head-major relayout copies from the quad
table build entirely, but only pays off if the gather engine slices
(1, 128) windows out of 1024-lane rows at (close to) the plain-row rate.

Usage: python scripts/bench_gather_lane.py [--rows 20674] [--heads 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), os.pardir))

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_CALL = [0]


def timed(fn, *args, iters=5):
    def call():
        _CALL[0] += 1
        return float(jnp.asarray(fn(*args, jnp.int32(_CALL[0]))).sum())

    call()
    call()  # warm: first post-compile execution carries ~140 ms one-off cost
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        call()
        best = min(best, time.perf_counter() - t0)
    return best


D1 = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
D2 = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20674)  # encoder sq
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--width", type=int, default=128)   # 4*D lanes per head
    ap.add_argument("--n-idx", type=int, default=323152)  # Q*K per chain
    ap.add_argument("--reps", type=int, default=8,
                    help="chains per call (amortizes the ~25 ms relay RTT)")
    args = ap.parse_args()
    H, W, R, N = args.heads, args.width, args.rows, args.n_idx
    log("device:", jax.devices()[0])

    rng = np.random.default_rng(0)
    wide = jnp.asarray(rng.standard_normal((R, H * W)), jnp.bfloat16)
    narrow = jnp.asarray(
        np.asarray(wide, np.float32).reshape(R, H, W).transpose(1, 0, 2)
        .reshape(H * R, W), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, R, (N,)), jnp.int32)

    @jax.jit
    def plain(tab, ix, jitter):
        def step(c, r):
            i = (ix + r + jitter) % (H * R)
            g = jax.lax.gather(tab, i.reshape(-1, 1), D1, slice_sizes=(1, W),
                               mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            return c + g.sum(dtype=jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(args.reps))
        return out

    @jax.jit
    def lane(tab, ix, jitter):
        def step(c, r):
            i = (ix + r + jitter) % R
            starts = jnp.stack(
                (i, jnp.full_like(i, (r % H) * W)), axis=1)
            g = jax.lax.gather(tab, starts, D2, slice_sizes=(1, W),
                               mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
            return c + g.sum(dtype=jnp.float32), None
        out, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32),
                              jnp.arange(args.reps))
        return out

    tp = timed(plain, narrow, idx, iters=5)
    tl = timed(lane, wide, idx, iters=5)
    tp2 = timed(plain, narrow, idx, iters=5)  # bracket
    rows = N * args.reps
    log(f"plain row gather  ({H*R}x{W}):   {tp*1e3:7.2f} ms  "
        f"{rows/tp/1e6:6.0f} rows/us-ish (bracket {tp2*1e3:.2f})")
    log(f"lane-offset gather ({R}x{H*W}): {tl*1e3:7.2f} ms  "
        f"{rows/tl/1e6:6.0f} rows/us-ish")
    import json

    print(json.dumps({"plain_ms": round(tp * 1e3, 2),
                      "lane_ms": round(tl * 1e3, 2),
                      "bracket_ms": round(tp2 * 1e3, 2)}))


if __name__ == "__main__":
    main()
