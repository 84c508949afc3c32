"""Pallas MSDA experiments.

The reference's CUDA kernel (`csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh:
237-299`) is a thread-per-(b,q,h,c) random-gather — a shape GPUs love and
TPUs don't. What we established on v5e (see BASELINE.md):

  * Mosaic cannot lower multi-vreg table gathers: `jnp.take`/
    `take_along_axis` inside a kernel fails with "Multiple source vregs
    along gather dimension" — in-VMEM vectorized gather is off the table.
  * XLA:TPU's gather engine moves ~170-190 rows/us for 128-lane rows. The
    quad-packed formulation in `ops/msda.py` rides that engine and is the
    production path.

This module implements the one Pallas-expressible alternative — a
scalar-prefetch grid gather: the flat sample indices are prefetched, and the
quad table's BlockSpec `index_map` reads them to DMA exactly one 128-lane row
per grid step, with the bilinear reduce fused in VMEM. It exists to (a) keep
an on-ramp for future Mosaic gather support, (b) document the measured
comparison. Grid-step overhead makes it ~row-rate-bound like XLA's engine;
use `multi_scale_deformable_attention(..., impl="pallas")` to benchmark on
new hardware generations, `impl="xla"` for production.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather_rows_pallas(table: jnp.ndarray, idx: jnp.ndarray, block: int = 8):
    """out[i] = table[idx[i]] via scalar-prefetch DMA. table [R, C] (C = one
    tile of lanes), idx [N] int32, N % block == 0. Each grid step DMAs
    `block` rows picked by the prefetched indices (one BlockSpec per row
    offset within the block)."""
    n = idx.shape[0]
    r, c = table.shape
    assert n % block == 0, (n, block)
    # Mosaic requires the trailing block dims to tile (8, 128); a [R, 1, C]
    # view makes a single row a legal (1, 1, C) block
    table3 = table.reshape(r, 1, c)

    def kernel(idx_ref, *refs):
        out_ref = refs[block]
        for j in range(block):
            out_ref[j, :] = refs[j][0, 0, :]

    grid = (n // block,)
    in_specs = [
        pl.BlockSpec(
            (1, 1, c),
            index_map=functools.partial(
                lambda i, idx_ref, j=j: (idx_ref[i * block + j], 0, 0)
            ),
            memory_space=pltpu.VMEM,
        )
        for j in range(block)
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[in_specs[j] for j in range(block)],
        out_specs=pl.BlockSpec(
            (block, c), index_map=lambda i, idx_ref: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), table.dtype),
        grid_spec=grid_spec,
    )(idx, *([table3] * block))


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Quad-packed MSDA with the gather done by the Pallas scalar-prefetch
    kernel; numerics identical to `ms_deform_attn_xla_quad`."""
    from ziragroundingdino_tpu.ops import msda as _m

    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    value_bh = jnp.swapaxes(value, 1, 2)

    quads, idx_parts, wts_parts = [], [], []
    start = 0
    quad_start = 0
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        h_l, w_l = int(h_l), int(w_l)
        v = jax.lax.dynamic_slice_in_dim(value_bh, start, h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l, D)
        start += h_l * w_l
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            (vp[:, :, :-1, :-1], vp[:, :, :-1, 1:], vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]),
            axis=-1,
        )
        qh, qw = h_l + 1, w_l + 1
        quads.append(quad.reshape(B, H, qh * qw, 4 * D))

        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)
        x = loc[..., 0] * w_l - 0.5
        y = loc[..., 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1, wy1 = x - x0, y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), -1, w_l - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), -1, h_l - 1)
        idx_parts.append(quad_start + (y0i + 1) * qw + (x0i + 1))
        quad_start += qh * qw
        cws = []
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            w = (wx1 if dx else (1.0 - wx1)) * (wy1 if dy else (1.0 - wy1))
            valid = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            cws.append(jnp.where(valid, w, 0.0) * attn)
        wts_parts.append(jnp.stack(cws, axis=-1))

    sq = quad_start
    table = jnp.concatenate(quads, axis=2).reshape(B * H * sq, 4 * D)
    k = L * P
    idx = jnp.stack(idx_parts, axis=3).reshape(B, Q, H, k)
    wts = jnp.stack(wts_parts, axis=3).reshape(B, Q, H, k, 4)
    bh_base = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]) * sq
    idx_flat = (idx + bh_base[:, None, :, None]).reshape(-1)

    n = idx_flat.shape[0]
    pad = (-n) % 8
    if pad:
        idx_flat = jnp.pad(idx_flat, (0, pad))
    g = _gather_rows_pallas(table, idx_flat, block=8)
    if pad:
        g = g[:n]
    g = g.reshape(B, Q, H, k, 4, D)
    out = jnp.sum(
        g * wts.astype(g.dtype)[..., None], axis=(3, 4), dtype=jnp.float32
    )
    return out.reshape(B, Q, H * D).astype(value.dtype)
