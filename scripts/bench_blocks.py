"""Per-block profile of the GDINO-T forward at canonical eval scale.

Times each architectural block standalone on the attached accelerator, at
one or more batch sizes, so the non-MSDA tail can be attacked with data
(VERDICT round-1 item 1b). Every call carries a fresh jitter operand and
the timing fetches the result value (relay-cache-proof).

Usage: python scripts/bench_blocks.py [--batches 1,8]
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
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--height", type=int, default=800)
    ap.add_argument("--width", type=int, default=1216)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ziragroundingdino_tpu.config import MODEL_PRESETS
    from ziragroundingdino_tpu.models.bert import BertEncoder
    from ziragroundingdino_tpu.models.fusion import BiAttentionBlock
    from ziragroundingdino_tpu.models.swin import SwinTransformer
    from ziragroundingdino_tpu.models.transformer import (
        DeformableDecoderLayer,
        DeformableEncoderLayer,
        TextEnhancerLayer,
    )
    from ziragroundingdino_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    log("device:", jax.devices()[0])

    cfg = MODEL_PRESETS["dualzerorepbranchgroundingdino"]
    cd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    h, w, t = args.height, args.width, 64
    shapes = tuple(( -(-h // s), -(-w // s)) for s in (8, 16, 32, 64))
    S = sum(a * b for a, b in shapes)
    E = cfg.hidden_dim
    rng = np.random.RandomState(0)
    calls = [0]

    def bench(name, module, make_args, b, iters=4, static=()):
        arrs = make_args(b)
        # static (non-array) args like spatial_shapes are closed over, not
        # traced through jit
        static_at = {i: arrs[i] for i in static}
        dyn = tuple(a for i, a in enumerate(arrs) if i not in static_at)

        def apply(params, dyn_args):
            it = iter(dyn_args)
            full = [static_at[i] if i in static_at else next(it)
                    for i in range(len(arrs))]
            return module.apply(params, *full)

        params = jax.jit(lambda key: module.init(key, *arrs))(jax.random.PRNGKey(0))

        @jax.jit
        def run(params, dyn_args, jit_):
            # perturb the first float input so no relay/XLA layer can cache
            dyn_args = list(dyn_args)
            for i, a in enumerate(dyn_args):
                if jnp.issubdtype(a.dtype, jnp.floating):
                    dyn_args[i] = a + jit_.astype(a.dtype) * 1e-6
                    break
            else:  # all-int inputs: perturb params instead
                params = jax.tree_util.tree_map(
                    lambda p: p + jit_.astype(p.dtype) * 1e-9
                    if jnp.issubdtype(p.dtype, jnp.floating) else p, params)
            out = apply(params, dyn_args)
            return jax.tree_util.tree_reduce(
                lambda c, x: c + jnp.sum(x.astype(jnp.float32)),
                out, jnp.float32(0),
            )

        best = 1e9
        for i in range(iters + 1):
            calls[0] += 1
            t0 = time.perf_counter()
            float(run(params, dyn, jnp.int32(calls[0])))
            dt = time.perf_counter() - t0
            if i:  # skip compile call
                best = min(best, dt)
        log(f"b={b} {name:<28} {best*1e3:8.2f} ms")
        return best

    for b in (int(x) for x in args.batches.split(",")):
        log(f"--- batch {b} (800x1216, S={S}) ---")
        bench("swin-T", SwinTransformer(cfg=cfg.swin, dtype=cd),
              lambda b: (jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
                         jnp.ones((b, h, w), bool)), b)
        bench("bert-base", BertEncoder(cfg=cfg.bert, dtype=cd),
              lambda b: (jnp.asarray(rng.randint(0, 30000, (b, t))),
                         jnp.ones((b, t, t), bool),
                         jnp.asarray(np.tile(np.arange(t), (b, 1)))), b)
        bench("fusion (BiAttention) x1", BiAttentionBlock(
                  v_dim=E, l_dim=E, embed_dim=cfg.dim_feedforward // 2,
                  num_heads=cfg.nheads // 2, dropout=0.0, drop_path=0.0, dtype=cd),
              lambda b: (jnp.asarray(rng.randn(b, S, E), cd),
                         jnp.asarray(rng.randn(b, t, E), cd),
                         jnp.ones((b, S), bool), jnp.ones((b, t), bool)), b)
        bench("text-enhancer x1", TextEnhancerLayer(cfg, dtype=cd),
              lambda b: (jnp.asarray(rng.randn(b, t, E), cd),
                         jnp.ones((b, t, t), bool),
                         jnp.asarray(rng.randn(b, t, E), cd)), b)
        ref_enc = jnp.asarray(np.clip(rng.rand(1, S, len(shapes), 2), 0, 1), jnp.float32)
        bench("deform-enc-layer x1", DeformableEncoderLayer(cfg, dtype=cd),
              lambda b: (jnp.asarray(rng.randn(b, S, E), cd),
                         jnp.asarray(rng.randn(b, S, E), cd),
                         jnp.broadcast_to(ref_enc, (b, S, len(shapes), 2)),
                         shapes, jnp.ones((b, S), bool)), b, static=(3,))
        q = cfg.num_queries
        ref_dec = jnp.asarray(np.clip(rng.rand(1, q, len(shapes), 4), 0.05, 0.6), jnp.float32)
        bench("deform-dec-layer x1", DeformableDecoderLayer(cfg, dtype=cd),
              lambda b: (jnp.asarray(rng.randn(b, q, E), cd),
                         jnp.asarray(rng.randn(b, q, E), cd),
                         jnp.broadcast_to(ref_dec, (b, q, len(shapes), 4)),
                         jnp.asarray(rng.randn(b, S, E), cd),
                         jnp.ones((b, S), bool),
                         shapes,
                         jnp.asarray(rng.randn(b, t, E), cd),
                         jnp.ones((b, t), bool)), b, static=(5,))


if __name__ == "__main__":
    main()
