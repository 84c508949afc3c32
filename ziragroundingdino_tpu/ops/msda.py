"""Multi-scale deformable attention (MSDA) — the hot op of GroundingDINO.

TPU-native replacement for the reference's custom CUDA extension
(`csrc/MsDeformAttn/ms_deform_im2col_cuda.cuh:237-299` forward, six backward
variants at `:301-921`). Numerics follow the reference's pure-PyTorch golden
path `multi_scale_deformable_attn_pytorch`
(`models/GroundingDINO/ms_deform_attn.py:90-130`), i.e. `F.grid_sample` with
``mode='bilinear', padding_mode='zeros', align_corners=False``.

Two implementations:
  * ``xla``   — vectorized gather + bilinear lerp composed in jnp. XLA lowers
                the gathers to TPU dynamic-gather; backward comes from autodiff
                (scatter-add), replacing the reference's hand-written col2im
                kernels.
  * ``pallas``— a hand-tiled VMEM kernel (see ``msda_pallas.py``) used on TPU
                for the large-Q encoder self-attention case.

Shapes (batch-first, like the reference's `im2col` layout):
  value:              [B, S, H, D]   S = sum(H_l * W_l) flattened multi-scale
  spatial_shapes:     static tuple ((H_0, W_0), ...) — python ints; under jit
                      every shape bucket compiles once, so these are constants
  sampling_locations: [B, Q, H, L, P, 2]  normalized to [0, 1] (x, y)
  attention_weights:  [B, Q, H, L, P]     softmaxed over L*P
  returns:            [B, Q, H * D]
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _level_splits(spatial_shapes: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    sizes = tuple(int(h) * int(w) for h, w in spatial_shapes)
    return sizes


def ms_deform_attn_xla_quad(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int = 4096,
) -> jnp.ndarray:
    """Quad-packed MSDA — the TPU fast path (numerics identical to
    `ms_deform_attn_xla`).

    XLA's TPU gather costs ~constant time per gathered ROW (~10 ns measured
    on v5e), independent of row width up to a tile. The naive formulation
    gathers 4 corner rows per sample: B*H*Q*L*P*4 rows. Here each level's
    value map is re-packed once into a "quad" table
    ``quad[y+1, x+1] = (V[y,x], V[y,x+1], V[y+1,x], V[y+1,x+1])`` (zero
    padded border) so one gathered row of 4*D channels carries the whole
    bilinear footprint -> 4x fewer rows for a 4x wider row, plus one cheap
    elementwise repack per call. Per-corner validity masks on the weights
    keep `padding_mode='zeros'` semantics exact even for clamped
    out-of-range samples.

    The gather+reduce runs in Q chunks under `lax.scan` to bound the
    gathered temporary (full-Q materialization OOMs at encoder scale).
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    compute_dtype = value.dtype

    value_bh = jnp.swapaxes(value, 1, 2)  # [B, H, S, D]

    # ---- build the flat quad table + per-sample indices/weights
    quads = []
    idx_parts = []  # [B, Q, H, P] each
    wts_parts = []  # [B, Q, H, P, 4]
    start = 0
    quad_start = 0
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        h_l, w_l = int(h_l), int(w_l)
        v = jax.lax.dynamic_slice_in_dim(value_bh, start, h_l * w_l, axis=2)
        v = v.reshape(B, H, h_l, w_l, D)
        start += h_l * w_l
        # zero-pad all four borders, then shift-concat the 2x2 footprint
        vp = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        quad = jnp.concatenate(
            (vp[:, :, :-1, :-1], vp[:, :, :-1, 1:], vp[:, :, 1:, :-1], vp[:, :, 1:, 1:]),
            axis=-1,
        )  # [B, H, h+1, w+1, 4D]; index (y0+1, x0+1)
        qh, qw = h_l + 1, w_l + 1
        quads.append(quad.reshape(B, H, qh * qw, 4 * D))

        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # [B,Q,H,P,2]
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)  # [B,Q,H,P]
        x = loc[..., 0] * w_l - 0.5
        y = loc[..., 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        x0i = jnp.clip(x0.astype(jnp.int32), -1, w_l - 1)
        y0i = jnp.clip(y0.astype(jnp.int32), -1, h_l - 1)
        idx_parts.append(quad_start + (y0i + 1) * qw + (x0i + 1))
        quad_start += qh * qw

        corner_ws = []
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0.astype(jnp.int32) + dx
            yi = y0.astype(jnp.int32) + dy
            w = (wx1 if dx else (1.0 - wx1)) * (wy1 if dy else (1.0 - wy1))
            valid = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            corner_ws.append(jnp.where(valid, w, 0.0) * attn)
        wts_parts.append(jnp.stack(corner_ws, axis=-1))  # [B,Q,H,P,4]

    # flat 2D table [(B*H*Sq), 4D]: a plain single-axis `take` hits XLA:TPU's
    # fast gather path (~170 rows/us for 128-lane bf16 rows, measured);
    # batched take_along_axis is ~4x slower for identical bytes
    sq = quad_start
    quad_table = jnp.concatenate(quads, axis=2).reshape(B * H * sq, 4 * D)
    k = L * P
    idx = jnp.stack(idx_parts, axis=3).reshape(B, Q, H, k)  # [B,Q,H,K]
    # NOTE on layouts: wts as [..., K, 4] tile-pads 32x (4-lane last dim) —
    # a transient cost per layer that remat keeps bounded in training; the
    # "clean" [..., K*4]-with-in-chunk-broadcast alternative measured 15x
    # slower forward (Mosaic handles the broadcast+reshape badly), so the
    # compact-lane layout stays.
    wts = jnp.stack(wts_parts, axis=3).reshape(B, Q, H, k, 4)
    wts = wts.astype(compute_dtype)

    bh_base = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]) * sq  # [B,H]
    idx_flat = idx + bh_base[:, None, :, None]  # [B, Q, H, K] global rows

    qc = min(Q, q_chunk)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc - Q
    if q_pad:
        idx_flat = jnp.pad(idx_flat, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
        wts = jnp.pad(wts, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
    idx_c = idx_flat.reshape(B, n_chunks, qc, H, k).transpose(1, 0, 2, 3, 4)
    wts_c = wts.reshape(B, n_chunks, qc, H, k, 4).transpose(1, 0, 2, 3, 4, 5)

    gather_dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
    )

    def chunk(_, iw):
        ci, cw = iw  # [B,qc,H,K], [B,qc,H,K,4]
        g = jax.lax.gather(
            quad_table, ci.reshape(-1, 1), gather_dnums,
            slice_sizes=(1, 4 * D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(B, qc, H, k, 4, D)
        # multiply in the input dtype, single fused f32-accumulating reduce
        # over (points*levels, corners) — measured fastest on v5e (einsum
        # with preferred f32 makes XLA materialize an f32 copy of g)
        o = jnp.sum(g * cw[..., None], axis=(3, 4), dtype=jnp.float32)
        return None, o

    _, out = jax.lax.scan(chunk, None, (idx_c, wts_c))  # [Nc, B, qc, H, D]
    out = out.transpose(1, 0, 2, 3, 4).reshape(B, n_chunks * qc, H, D)
    if q_pad:
        out = out[:, :Q]
    return out.reshape(B, Q, H * D).astype(compute_dtype)


def ms_deform_attn_xla(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """XLA-composed MSDA forward, numerics-identical to the reference fallback
    (`ms_deform_attn.py:90-130`).

    grid_sample(align_corners=False) maps a normalized coordinate g in [-1,1]
    to pixel space as ``p = ((g + 1) * size - 1) / 2``; with ``g = 2*loc - 1``
    that is ``p = loc * size - 0.5``. Out-of-range corner texels contribute 0
    (padding_mode='zeros').

    Performance shape (v5e profiling): this op is HBM-bound — ~16 samples x D
    channels per (query, head). The implementation therefore does exactly ONE
    gather over the flattened multi-scale S axis with all (level, point,
    corner) indices batched per (B, H), keeps the gathered values in the
    input dtype (bf16), folds the bilinear corner weights into the attention
    weights BEFORE the gather-side reduction, and transposes once at the end.
    The earlier 16-gather fp32 variant measured 430 ms/layer at encoder
    scale; this one is ~20x cheaper in bytes moved.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes), (L, spatial_shapes)
    sizes = _level_splits(spatial_shapes)
    assert sum(sizes) == S, (sizes, S)

    compute_dtype = value.dtype
    starts = []
    s0 = 0
    for sz in sizes:
        starts.append(s0)
        s0 += sz

    # ---- per (level, point, corner) flat indices + combined weights
    idx_parts = []  # each [B, Q, H, P]
    w_parts = []
    for lvl, (h_l, w_l) in enumerate(spatial_shapes):
        h_l, w_l = int(h_l), int(w_l)
        loc = sampling_locations[:, :, :, lvl].astype(jnp.float32)  # [B,Q,H,P,2]
        attn = attention_weights[:, :, :, lvl].astype(jnp.float32)  # [B,Q,H,P]
        x = loc[..., 0] * w_l - 0.5
        y = loc[..., 1] * h_l - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
            xi = x0i + dx
            yi = y0i + dy
            w = (wx1 if dx else (1.0 - wx1)) * (wy1 if dy else (1.0 - wy1))
            valid = (xi >= 0) & (xi < w_l) & (yi >= 0) & (yi < h_l)
            idx = starts[lvl] + jnp.clip(yi, 0, h_l - 1) * w_l + jnp.clip(xi, 0, w_l - 1)
            idx_parts.append(idx)
            w_parts.append(jnp.where(valid, w, 0.0) * attn)

    k = L * P * 4  # samples per (query, head)
    idx = jnp.stack(idx_parts, axis=-1).reshape(B, Q, H, k)  # [B,Q,H,K]
    wts = jnp.stack(w_parts, axis=-1).reshape(B, Q, H, k)

    value_bh = jnp.swapaxes(value, 1, 2)  # [B, H, S, D]
    idx_bh = jnp.swapaxes(idx, 1, 2)  # [B, H, Q, K]
    wts_bh = jnp.swapaxes(wts, 1, 2).astype(compute_dtype)

    # ---- chunked gather+reduce over Q: bounds the gathered temporary to
    # ~B*H*qc*K*D elements instead of the full Q (2.6 GB at encoder scale)
    qc = min(Q, 1024)
    n_chunks = -(-Q // qc)
    q_pad = n_chunks * qc - Q
    if q_pad:
        idx_bh = jnp.pad(idx_bh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
        wts_bh = jnp.pad(wts_bh, ((0, 0), (0, 0), (0, q_pad), (0, 0)))
    idx_c = idx_bh.reshape(B, H, n_chunks, qc, k).transpose(2, 0, 1, 3, 4)
    wts_c = wts_bh.reshape(B, H, n_chunks, qc, k).transpose(2, 0, 1, 3, 4)

    def chunk(_, iw):
        ci, cw = iw  # [B, H, qc, K]
        g = jnp.take_along_axis(
            value_bh, ci.reshape(B, H, qc * k, 1), axis=2, mode="promise_in_bounds"
        ).reshape(B, H, qc, k, D)
        o = jnp.einsum(
            "bhqkd,bhqk->bhqd", g, cw, preferred_element_type=jnp.float32
        )
        return None, o

    _, out = jax.lax.scan(chunk, None, (idx_c, wts_c))  # [Nc, B, H, qc, D]
    out = out.transpose(1, 0, 3, 2, 4).reshape(B, n_chunks * qc, H, D)
    if q_pad:
        out = out[:, :Q]
    return out.reshape(B, Q, H * D).astype(compute_dtype)


def multi_scale_deformable_attention(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """Dispatch to the requested MSDA implementation.

    Replaces the reference host-side dispatch (`csrc/MsDeformAttn/
    ms_deform_attn_cuda.cu:21-81`): under jit there is no per-call host logic,
    the chosen implementation is baked into the compiled program.
    """
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl == "pallas":
        from ziragroundingdino_tpu.ops.msda_pallas import ms_deform_attn_pallas

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "xla":
        return ms_deform_attn_xla_quad(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "xla_naive":
        return ms_deform_attn_xla(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown msda impl {impl!r}")
