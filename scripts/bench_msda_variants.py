"""MSDA forward strategy shootout at encoder scale (round-3 perf push).

Compares the production per-(b,h) scan against an unrolled-over-heads
variant (and friends) on the canonical 800x1216 encoder shape, b=1.
A lax.scan lowers to a sequential while loop, so the ~527us gather and
~171us weighted-reduce per (b,h) iteration cannot overlap across heads
and the scan boundary forces wts/idx relayout copies (~0.8 ms/layer in
the r2 trace). Unrolling lets XLA software-pipeline the 8 heads.

Timing rule (BASELINE.md): fetch the VALUE, fresh jitter operand per call.
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
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ziragroundingdino_tpu.ops import msda
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])

    h, w = args.height, args.width
    shapes = tuple((-(-h // s), -(-w // s)) for s in (8, 16, 32, 64))
    S = sum(a * b for a, b in shapes)
    B, H, D, L, P = args.batch, 8, 32, 4, 4
    Q = S
    k = L * P
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, S, H, D), jnp.bfloat16)
    loc = jnp.asarray(rng.rand(B, Q, H, L, P, 2), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Q, H, L, P), jnp.float32).reshape(B, Q, H, -1)
    ).reshape(B, Q, H, L, P)
    log(f"B={B} S={S} Q={Q} H={H} D={D} K={k}")

    def run(name, fn):
        g = lambda value, loc, aw, j: jnp.sum(fn(value, loc, aw, j).astype(jnp.float32))
        f = jax.jit(g)
        t0 = time.time()
        float(f(value, loc, aw, jnp.float32(0)))
        log(f"{name}: compile {time.time()-t0:.1f}s")
        float(f(value, loc, aw, jnp.float32(0.5)))  # warm
        # amortize the ~28 ms relay RTT: pipeline iters calls, one fetch
        times = []
        for rep in range(3):
            t0 = time.time()
            acc = [f(value, loc, aw, jnp.float32(1 + rep * args.iters + i))
                   for i in range(args.iters)]
            float(jnp.stack(acc).sum())
            times.append((time.time() - t0) / args.iters)
        ms = min(times) * 1e3
        log(f"{name}: best {ms:.2f} ms/call (pipelined x{args.iters})")
        return ms

    def production(value, loc, aw, jit_):
        return msda.ms_deform_attn_xla_quad(value + jit_ * 1e-6, shapes, loc, aw)

    def unrolled_h(value, loc, aw, jit_):
        # per-head tables, python-loop unrolled; idx/wts sliced per head
        value = value + jit_ * 1e-6
        quad_table, idx_flat, wts, sq = msda._quad_prep(value, shapes, loc, aw)
        table_bh = quad_table.reshape(B * H, sq, 4 * D)
        bh_base = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]) * sq
        idx_loc = idx_flat - bh_base[:, None, :, None]  # [B,Q,H,k] local rows
        outs = []
        for b in range(B):
            for hh in range(H):
                ci = idx_loc[b, :, hh]  # [Q,k]
                w4 = wts[b, :, hh]      # [Q,k,4]
                g = jax.lax.gather(
                    table_bh[b * H + hh], ci.reshape(-1, 1), msda._GATHER_DNUMS,
                    slice_sizes=(1, 4 * D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                ).reshape(Q, k, 4 * D)
                outs.append(
                    jnp.sum(g * msda._lane_expand(w4, D), axis=1, dtype=jnp.float32)
                )
        out = jnp.stack(outs).reshape(B, H, Q, 4 * D)
        out = jnp.moveaxis(out, 1, 2).reshape(B, Q, H, 4, D).sum(3)
        return out.reshape(B, Q, H * D).astype(value.dtype)

    def one_flat(value, loc, aw, jit_):
        # single gather over the whole B*H table (crosses the 43 MB cliff?)
        value = value + jit_ * 1e-6
        quad_table, idx_flat, wts, sq = msda._quad_prep(value, shapes, loc, aw)
        g = jax.lax.gather(
            quad_table, idx_flat.reshape(-1, 1), msda._GATHER_DNUMS,
            slice_sizes=(1, 4 * D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(B, Q, H, k, 4 * D)
        out = jnp.sum(g * msda._lane_expand(wts, D), axis=3, dtype=jnp.float32)
        out = out.reshape(B, Q, H, 4, D).sum(3)
        return out.reshape(B, Q, H * D).astype(value.dtype)

    def unrolled_chunked(value, loc, aw, jit_, qc=4096):
        # per-head AND per-q-chunk unrolled: each gather output is
        # qc*K rows (small), aiming for DMA pipelining across chunks
        value = value + jit_ * 1e-6
        quad_table, idx_flat, wts, sq = msda._quad_prep(value, shapes, loc, aw)
        table_bh = quad_table.reshape(B * H, sq, 4 * D)
        bh_base = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]) * sq
        idx_loc = idx_flat - bh_base[:, None, :, None]
        n_c = -(-Q // qc)
        outs = []
        for b in range(B):
            for hh in range(H):
                chunks = []
                for c in range(n_c):
                    lo = c * qc
                    hi = min(Q, lo + qc)
                    ci = idx_loc[b, lo:hi, hh]
                    w4 = wts[b, lo:hi, hh]
                    g = jax.lax.gather(
                        table_bh[b * H + hh], ci.reshape(-1, 1), msda._GATHER_DNUMS,
                        slice_sizes=(1, 4 * D),
                        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                    ).reshape(hi - lo, k, 4 * D)
                    chunks.append(
                        jnp.sum(g * msda._lane_expand(w4, D), axis=1, dtype=jnp.float32)
                    )
                outs.append(jnp.concatenate(chunks, axis=0))
        out = jnp.stack(outs).reshape(B, H, Q, 4 * D)
        out = jnp.moveaxis(out, 1, 2).reshape(B, Q, H, 4, D).sum(3)
        return out.reshape(B, Q, H * D).astype(value.dtype)

    results = {}
    import json as _json
    which = os.environ.get("ZGDINO_VARIANTS", "production,2048,1024,512")
    for v in which.split(","):
        v = v.strip()
        if v == "production":
            results["production"] = run("production", production)
        elif v == "unrolled":
            results["unrolled_h"] = run("unrolled_h", unrolled_h)
        elif v == "flat":
            results["one_flat_gather"] = run("one_flat_gather", one_flat)
        else:
            qc = int(v)
            results[f"chunk{qc}"] = run(
                f"chunk{qc}", lambda vv, l, a, j, qc=qc: unrolled_chunked(vv, l, a, j, qc))
    for n, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"{n}: {v:.2f} ms")


if __name__ == "__main__":
    main()
