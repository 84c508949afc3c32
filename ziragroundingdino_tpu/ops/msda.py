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
  * ``pallas``— a hand-tiled VMEM kernel (see ``msda_pallas.py``). Kept as a
                measured dead end: Mosaic cannot express multi-vreg table
                gathers, so ``xla`` is the production path on every shape
                (dispatch defaults to ``impl="xla"``; see msda_pallas.py:14).

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
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _level_splits(spatial_shapes: Sequence[Tuple[int, int]]) -> Tuple[int, ...]:
    sizes = tuple(int(h) * int(w) for h, w in spatial_shapes)
    return sizes


def _quad_sizes(spatial_shapes) -> Tuple[int, ...]:
    return tuple((int(h) + 1) * (int(w) + 1) for h, w in spatial_shapes)


def _quad_table_build_split(value: jnp.ndarray, spatial_shapes):
    """Per-level quad tables: ``quad[y+1, x+1] = (V[y,x], V[y,x+1],
    V[y+1,x], V[y+1,x+1])`` (zero padded border). Returns a list of
    [B, H, (h_l+1)*(w_l+1), 4D] arrays, one per level."""
    B, S, H, D = value.shape
    value_bh = jnp.swapaxes(value, 1, 2)  # [B, H, S, D]
    quads = []
    start = 0
    for h_l, w_l in spatial_shapes:
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
    return quads


def _quad_corner_kernel(H: int, D: int, dtype) -> jnp.ndarray:
    """One-hot 2x2 grouped-conv kernel [2, 2, D, H*4D] implementing the quad
    corner packing: out channel h*4D + c*D + d picks input channel d of head
    group h at window tap (dy, dx) = (c // 2, c % 2). Exact in any dtype
    (each output element is one product; no accumulation)."""
    k = np.zeros((2, 2, D, H * 4 * D), np.float32)
    for c in range(4):
        dy, dx = divmod(c, 2)
        for h in range(H):
            k[dy, dx, np.arange(D), h * 4 * D + c * D + np.arange(D)] = 1.0
    return jnp.asarray(k, dtype)


def _quad_table_build_conv(value: jnp.ndarray, spatial_shapes):
    """Quad tables via one 2x2 one-hot MXU convolution per level.

    Numerics-identical to `_quad_table_build_split` (zero-padded border,
    corner order v[y-1,x-1], v[y-1,x], v[y,x-1], v[y,x] at table row
    (y0+1, x0+1)); replaces its pad + 4-shifted-slice + lane-concat chain.
    Returns the per-level [B, H, qsize, 4D] list.
    """
    B, S, H, D = value.shape
    kern = _quad_corner_kernel(H, D, value.dtype)
    v_bl = value.reshape(B, S, H * D)
    quads = []
    start = 0
    for h_l, w_l in spatial_shapes:
        h_l, w_l = int(h_l), int(w_l)
        v = jax.lax.dynamic_slice_in_dim(v_bl, start, h_l * w_l, axis=1)
        start += h_l * w_l
        out = jax.lax.conv_general_dilated(
            v.reshape(B, h_l, w_l, H * D), kern,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=H,
            preferred_element_type=value.dtype,
        )  # [B, h+1, w+1, H*4D]
        qsize = (h_l + 1) * (w_l + 1)
        quads.append(jnp.moveaxis(out.reshape(B, qsize, H, 4 * D), 2, 1))
    return quads


def _quad_table_build(value: jnp.ndarray, spatial_shapes):
    """Flat all-level quad table ([B*H*Sq, 4D], sq); see
    `_quad_table_build_split` for the per-level packing rule.

    The builder is batch-dependent (r5 A/B, docs/ab_results.jsonl): the
    one-hot grouped conv measured -3.9/-13.9/-38 ms/batch at b=2/4/8 (its
    per-group MXU passes amortize at batch) but +7.4..+9.4 ms at b=1
    (min-of-30, `b1_convdec_i30`), where the shift-concat chain's copies
    hide under the gathers' DMA waits.
    """
    B, S, H, D = value.shape
    if B >= 2:
        quads = _quad_table_build_conv(value, spatial_shapes)
    else:
        quads = _quad_table_build_split(value, spatial_shapes)
    sq = sum(_quad_sizes(spatial_shapes))
    return jnp.concatenate(quads, axis=2).reshape(B * H * sq, 4 * D), sq


def _quad_table_adjoint(d_table: jnp.ndarray, spatial_shapes, B: int, H: int, D: int):
    """Adjoint of `_quad_table_build`: fold the 4 shifted corner copies of
    the cotangent back onto the value grid (replaces the reference's
    hand-written col2im accumulation, `ms_deform_im2col_cuda.cuh:301-921`,
    for the table-construction half). Returns d_value [B, S, H, D]."""
    sq = sum(_quad_sizes(spatial_shapes))
    d_table = d_table.reshape(B, H, sq, 4 * D)
    parts = []
    off = 0
    for h_l, w_l in spatial_shapes:
        h_l, w_l = int(h_l), int(w_l)
        qh, qw = h_l + 1, w_l + 1
        dq = d_table[:, :, off:off + qh * qw].reshape(B, H, qh, qw, 4, D)
        off += qh * qw
        # quad[Y, X] packs (v[Y-1,X-1], v[Y-1,X], v[Y,X-1], v[Y,X]), so the
        # adjoint at v[y, x] is a pure 4-slice sum — no scatter/pad (the
        # earlier .at[].add chain lowered to ~0.5 ms dynamic-update-slices
        # per (level, corner), ~38 ms per train step on v5e)
        d_v = (
            dq[:, :, 1:, 1:, 0, :]
            + dq[:, :, 1:, :-1, 1, :]
            + dq[:, :, :-1, 1:, 2, :]
            + dq[:, :, :-1, :-1, 3, :]
        )
        parts.append(d_v.reshape(B, H, h_l * w_l, D))
    return jnp.swapaxes(jnp.concatenate(parts, axis=2), 1, 2)


def _quad_coords(spatial_shapes, sampling_locations, attention_weights):
    """Per-sample quad-table indices and bilinear corner weights.

    Returns (idx [B,Q,H,K] int32 rows into one image-head's quad table,
    wts [B,Q,H,K,4] float32). Differentiable wrt (locations,
    weights) through `wts` — index derivatives are zero a.e. (floor),
    matching the reference CUDA backward which differentiates only the
    lerp weights."""
    B, Q, H, L, P, _ = sampling_locations.shape
    # Vectorized over levels: per-level constants ride a broadcast [L] axis
    # instead of a python loop of slices+stacks (the loop emitted per-level
    # relayout copies, ~1.6 ms/fwd in the r3 trace). One fused elementwise
    # chain produces idx/wts for all levels at once.
    wl = jnp.asarray([float(w_) for _, w_ in spatial_shapes], jnp.float32)
    hl = jnp.asarray([float(h_) for h_, _ in spatial_shapes], jnp.float32)
    qw_l = jnp.asarray([int(w_) + 1 for _, w_ in spatial_shapes], jnp.int32)
    starts_np = np.cumsum([0] + [ (int(h_) + 1) * (int(w_) + 1)
                                  for h_, w_ in spatial_shapes])[:-1]
    start_l = jnp.asarray(starts_np, jnp.int32)
    sh = (1, 1, 1, L, 1)  # broadcast shape for the level axis

    loc = sampling_locations.astype(jnp.float32)  # [B,Q,H,L,P,2]
    attn = attention_weights.astype(jnp.float32)  # [B,Q,H,L,P]
    x = loc[..., 0] * wl.reshape(sh) - 0.5
    y = loc[..., 1] * hl.reshape(sh) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    x0g = jax.lax.stop_gradient(x0).astype(jnp.int32)
    y0g = jax.lax.stop_gradient(y0).astype(jnp.int32)
    wli = jnp.asarray([int(w_) for _, w_ in spatial_shapes], jnp.int32).reshape(sh)
    hli = jnp.asarray([int(h_) for h_, _ in spatial_shapes], jnp.int32).reshape(sh)
    x0i = jnp.clip(x0g, -1, wli - 1)
    y0i = jnp.clip(y0g, -1, hli - 1)
    idx = start_l.reshape(sh) + (y0i + 1) * qw_l.reshape(sh) + (x0i + 1)

    corner_ws = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        xi = x0g + dx
        yi = y0g + dy
        w = (wx1 if dx else (1.0 - wx1)) * (wy1 if dy else (1.0 - wy1))
        valid = (xi >= 0) & (xi < wli) & (yi >= 0) & (yi < hli)
        corner_ws.append(jnp.where(valid, w, 0.0) * attn)
    wts = jnp.stack(corner_ws, axis=-1)  # [B,Q,H,L,P,4]

    k = L * P
    return idx.reshape(B, Q, H, k), wts.reshape(B, Q, H, k, 4)


def _quad_prep(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
):
    """Shared prep for the quad-packed formulations: builds the flat quad
    table, per-sample global row indices, and compact corner weights.

    Returns (quad_table [B*H*Sq, 4D], idx [B,Q,H,K] global rows,
    wts [B,Q,H,K,4] in the compute dtype, sq).
    """
    B, S, H, D = value.shape
    L = sampling_locations.shape[3]
    assert L == len(spatial_shapes), (L, spatial_shapes)
    compute_dtype = value.dtype

    # flat 2D table [(B*H*Sq), 4D]: a plain single-axis gather hits XLA:TPU's
    # fast gather path (~500 rows/us measured for 128-lane bf16 rows);
    # batched take_along_axis is ~4x slower for identical bytes
    quad_table, sq = _quad_table_build(value, spatial_shapes)
    idx, wts = _quad_coords(spatial_shapes, sampling_locations, attention_weights)
    wts = wts.astype(compute_dtype)

    bh_base = (jnp.arange(B)[:, None] * H + jnp.arange(H)[None, :]) * sq  # [B,H]
    idx_flat = idx + bh_base[:, None, :, None]  # [B, Q, H, K] global rows
    return quad_table, idx_flat, wts, sq


def _lane_expand(wts: jnp.ndarray, d: int) -> jnp.ndarray:
    """Lane-expand the 4 corner weights [..., K, 4] to the gathered row's
    4*d lanes [..., K, 4*d] via a constant one-hot matmul E[c, c*d+j] = 1 on
    the MXU. A VPU lane-broadcast (jnp.repeat / reshape of (4, d) sublanes)
    measured ~13 ms per encoder layer on v5e — the lane shuffle, not the
    gather, was the round-1 bottleneck; the MXU expansion is ~free and keeps
    every downstream op 128-lane aligned. Called INSIDE the gather body so
    the wide weights are materialized one batch-slice / q-chunk at a time."""
    expand_np = np.zeros((4, 4 * d), np.float32)
    for c in range(4):
        expand_np[c, c * d:(c + 1) * d] = 1.0
    expand = jnp.asarray(expand_np, wts.dtype)
    shape = wts.shape[:-1] + (4 * d,)
    return jnp.dot(
        wts.reshape(-1, 4), expand, preferred_element_type=wts.dtype
    ).reshape(shape)


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)
)


def _use_chains(B: int, rows: int, bh_max_b: int) -> bool:
    """Route to the unrolled per-(b,h) chain path?

    Encoder-scale calls (323k rows/chain at 800x1216) always ride chains at
    B <= bh_max_b — per-(b,h) ~10 MB tables gather at ~613 rows/us vs ~390
    for the whole-image table (measured cliff, BASELINE.md). Decoder-scale
    calls (Q=900 -> 115k rows) ride chains ONLY at B == 1: the r5 decision
    legs (docs/ab_results.jsonl) measured -3..-6.4 ms/call at b=1
    (`dec_small_i30` 92.9 / `b1_dec_k30` 96.2 vs 99.2/99.4 min-of-30 refs
    — the whole-table decoder gather runs at ~108 rows/us) but +6.6 ms at
    b=2 (`b2_dec`), where 16 chains' issue overhead beats the rate gain."""
    if rows >= (1 << 20) and B <= bh_max_b:
        return True
    return B == 1 and rows >= 65536


def _quad_small_batch(value, spatial_shapes, loc, attn, qc=0, save_rows_n=0):
    """Encoder-scale MSDA at small batch — the b<=2 inference fast path.

    Three r3 trace-driven refinements over the per-(b,h) `lax.scan`:
      * fully unrolled over (b, h) AND Q chunks of `qc`: a while-loop
        serializes the ~527 us gather against the ~171 us weighted reduce;
        unrolled+chunked the DMA pipelines (10.15 -> 9.0 ms/call at encoder
        scale, scripts/bench_msda_variants.py) and compile drops ~70x,
      * head-major coords: `_quad_coords` is called on [B,H,Q,...]-swapped
        inputs so per-head idx/wts slices are contiguous — the [B,Q,H,K,4]
        relayout copies (~0.3 ms/layer) disappear into the producer chain,
      * per-head outputs are lane-concatenated to [Q, H*4D] and the 4-corner
        fold becomes one constant block-one-hot MXU matmul fused with the
        head interleave — replacing the [B,H,Q,4D]->[B,Q,H,4D] transpose
        copy + strided fold-sum.
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = loc.shape
    k = L * P
    cd = value.dtype
    quad_table, sq = _quad_table_build(value, spatial_shapes)
    table_bh = quad_table.reshape(B * H, sq, 4 * D)
    # dims 1,2 of loc/attn are positional-only for _quad_coords
    idx, wts = _quad_coords(
        spatial_shapes, jnp.swapaxes(loc, 1, 2), jnp.swapaxes(attn, 1, 2)
    )  # idx [B,H,Q,K] rows local to one (b,h) table, wts [B,H,Q,K,4]
    wts = wts.astype(cd)
    n_c = -(-Q // qc) if qc else 1
    qc = qc or Q
    heads = []
    rows_saved = []
    for b in range(B):
        for hh in range(H):
            ci_c, w4_c = idx[b, hh], wts[b, hh]
            chunks = []
            for c in range(n_c):
                lo = c * qc
                hi = min(Q, lo + qc)
                ci = ci_c[lo:hi]
                w4 = w4_c[lo:hi]
                g = jax.lax.gather(
                    table_bh[b * H + hh], ci.reshape(-1, 1), _GATHER_DNUMS,
                    slice_sizes=(1, 4 * D),
                    mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                ).reshape(hi - lo, k, 4 * D)
                if b * H + hh < save_rows_n:
                    rows_saved.append(g)
                chunks.append(
                    jnp.sum(g * _lane_expand(w4, D), axis=1, dtype=jnp.float32)
                )
            heads.append(jnp.concatenate(chunks, 0) if n_c > 1 else chunks[0])
    out = _fold_heads(heads, B, Q, H, D, cd)
    if save_rows_n:
        # one [Q, K, 4D] gathered-row block for the first `save_rows_n`
        # (b, h) chains, b-major — the training residual that lets the
        # custom-VJP backward skip the regather for those chains (and the
        # quad-table rebuild entirely: the forward's table is returned for
        # the unsaved chains' regather — see _quad_bwd)
        assert n_c == 1
        return out, tuple(rows_saved), table_bh
    return out


def _fold_heads(heads, B, Q, H, D, cd):
    """Corner fold + head interleave as one constant one-hot matmul:
    fold[h*4D + c*D + d, h*D + d] = 1. `heads` is a length-B*H list of
    [Q, 4D] f32 per-head partial sums."""
    fold_np = np.zeros((H * 4 * D, H * D), np.float32)
    for hh in range(H):
        for c_ in range(4):
            cols = hh * D + np.arange(D)
            fold_np[hh * 4 * D + c_ * D + np.arange(D), cols] = 1.0
    fold = jnp.asarray(fold_np, cd)
    outs = []
    for b in range(B):
        # cast per-head BEFORE the concat: identical numerics (astype
        # commutes with concatenate), ~2.5x less concat traffic than
        # concatenating f32 and casting the [Q, H*4D] result
        wide = jnp.concatenate(
            [h_.astype(cd) for h_ in heads[b * H:(b + 1) * H]], axis=1)
        outs.append(jnp.dot(wide, fold, preferred_element_type=cd))
    return jnp.stack(outs).reshape(B, Q, H * D)


def ms_deform_attn_xla_quad(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    q_chunk: int = 0,
) -> jnp.ndarray:
    """Quad-packed MSDA — the TPU fast path (numerics identical to
    `ms_deform_attn_xla` up to f32 summation order).

    Each level's value map is re-packed once into a "quad" table
    ``quad[y+1, x+1] = (V[y,x], V[y,x+1], V[y+1,x], V[y+1,x+1])`` (zero
    padded border) so one gathered row of 4*D channels carries the whole
    bilinear footprint -> 4x fewer gathered rows. Per-corner validity masks
    on the weights keep `padding_mode='zeros'` semantics exact even for
    clamped out-of-range samples.

    The weighted reduction stays in the gathered row's native 4*D-lane
    layout: weights are lane-expanded on the MXU (see `_quad_prep`), the
    K = L*P sample axis is f32-sum-reduced per row, and the 4-corner fold
    happens once on the small [B,Q,H,4D] output — measured ~6 ms per encoder
    layer on v5e vs ~18 ms for the round-1 [...,K,4,D]-layout reduce.

    q_chunk > 0 bounds the gathered temporary (B*H*qc*K*4D elements) via a
    `lax.scan` over Q chunks — used under training remat; inference runs
    unchunked (q_chunk=0).
    """
    B, S, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    compute_dtype = value.dtype
    k = L * P

    # strategy knob for batch>2 experiments: raise to use the per-(b,h)
    # path at larger batches instead of per-image tables
    bh_max_b = int(os.environ.get("ZGDINO_MSDA_BH_MAX_B", "2"))
    if (not (q_chunk and q_chunk < Q)) and _use_chains(B, B * Q * H * k, bh_max_b):
        return _quad_small_batch(
            value, spatial_shapes, sampling_locations, attention_weights
        )

    quad_table, idx_flat, wts, sq = _quad_prep(
        value, spatial_shapes, sampling_locations, attention_weights
    )

    def weighted_gather(table, ci, w4, b, qn):
        # table [b*H*sq, 4D], ci [b,qn,H,K] rows into table, w4 [b,qn,H,K,4]
        g = jax.lax.gather(
            table, ci.reshape(-1, 1), _GATHER_DNUMS,
            slice_sizes=(1, 4 * D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(b, qn, H, k, 4 * D)
        return jnp.sum(g * _lane_expand(w4, D), axis=3, dtype=jnp.float32)

    if q_chunk and q_chunk < Q:
        qc = q_chunk
        n_chunks = -(-Q // qc)
        q_pad = n_chunks * qc - Q
        if q_pad:
            idx_flat = jnp.pad(idx_flat, ((0, 0), (0, q_pad), (0, 0), (0, 0)))
            wts = jnp.pad(wts, ((0, 0), (0, q_pad), (0, 0), (0, 0), (0, 0)))
        idx_c = idx_flat.reshape(B, n_chunks, qc, H, k).transpose(1, 0, 2, 3, 4)
        wts_c = wts.reshape(B, n_chunks, qc, H, k, 4).transpose(1, 0, 2, 3, 4, 5)

        def chunk(_, iw):
            ci, cw = iw
            return None, weighted_gather(quad_table, ci, cw, B, qc)

        _, out = jax.lax.scan(chunk, None, (idx_c, wts_c))  # [Nc, B, qc, H, 4D]
        out = out.transpose(1, 0, 2, 3, 4).reshape(B, n_chunks * qc, H, 4 * D)
        if q_pad:
            out = out[:, :Q]
        out = out.reshape(B, Q, H, 4, D).sum(3)
        return out.reshape(B, Q, H * D).astype(compute_dtype)

    if B > 1:
        # larger batches: per-IMAGE tables (43 MB, ~380 rows/us) amortize
        # scan overhead better than 8x more per-(b,h) iterations — the
        # round-1 "throughput anti-monotone in batch size" came from one
        # big batch-flattened table crossing the gather-rate cliff
        table_b = quad_table.reshape(B, H * sq, 4 * D)
        idx_b = idx_flat - (jnp.arange(B, dtype=idx_flat.dtype) * (H * sq))[:, None, None, None]

        # bound the per-step gathered temporary [qc, H, K, 4D]: the
        # unchunked encoder-scale row block is ~650 MB bf16/image, which is
        # FINE on 16 GB HBM and fastest (chunking this path measured -7%
        # img/s at b=4/8 and a 10x compile blowup from the nested scan), so
        # the bound only kicks in beyond ~1.5 GB temporaries — images much
        # larger than the 800x1216 eval bucket or K far above 64 — where
        # the unbounded path would OOM (ADVICE r2)
        max_elems = 3 << 28
        row_elems = H * k * 4 * D
        if Q * row_elems > max_elems:
            qc2 = max(1024, (max_elems // row_elems // 1024) * 1024)
        else:
            qc2 = Q
        n_c2 = -(-Q // qc2)
        q_pad2 = n_c2 * qc2 - Q
        if q_pad2:
            idx_b = jnp.pad(idx_b, ((0, 0), (0, q_pad2), (0, 0), (0, 0)))
            wts_b = jnp.pad(wts, ((0, 0), (0, q_pad2), (0, 0), (0, 0), (0, 0)))
        else:
            wts_b = wts
        idx_bc = idx_b.reshape(B, n_c2, qc2, H, k)
        wts_bc = wts_b.reshape(B, n_c2, qc2, H, k, 4)

        # One whole-image (43 MB, ~390 rows/us) gather per scan step.
        # Measured-and-deleted alternatives (docs/ab_results.jsonl, b=8):
        # head-grouped ~10 MB tables (+29/+23 ms — 2-8x more gather issues
        # beat the small-table rate gain) and a python-unrolled per-image
        # loop (+108 ms — the unroll defeats the scan's double-buffering).
        def per_img(_, tiw):
            tb, ci, cw = tiw  # [H*sq,4D], [n_c2,qc2,H,k], [n_c2,qc2,H,k,4]
            if n_c2 == 1:
                return None, weighted_gather(tb, ci[0][None], cw[0][None], 1, qc2)[0]

            def chunk2(_, iw):
                cci, ccw = iw
                return None, weighted_gather(tb, cci[None], ccw[None], 1, qc2)[0]

            _, o = jax.lax.scan(chunk2, None, (ci, cw))  # [n_c2, qc2, H, 4D]
            return None, o.reshape(n_c2 * qc2, H, 4 * D)

        _, out = jax.lax.scan(per_img, None, (table_b, idx_bc, wts_bc))
        if q_pad2:
            out = out[:, :Q]
    else:
        out = weighted_gather(quad_table, idx_flat, wts, B, Q)  # [B,Q,H,4D]

    out = out.reshape(B, Q, H, 4, D).sum(3)  # corner fold on the small output
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


# ---------------------------------------------------------------------------
# Custom VJP: the TPU answer to the reference's six hand-written col2im
# backward kernels (`ms_deform_im2col_cuda.cuh:301-921`).
#
# Autodiff through the quad forward would (a) save the 661 MB gathered-row
# tensor per encoder layer (or re-run the whole forward under remat) and
# (b) emit an unfused scatter chain. This rule instead:
#   * saves only the op INPUTS (value/locations/weights, ~150 MB total),
#   * recomputes indices/weights (measured ~free) and re-gathers rows ONCE
#     for the weight/location grads,
#   * scatter-adds the row cotangents into an f32 quad-table accumulator in
#     Q chunks (the scatter is the irreducible cost: ~57 rows/us on v5e vs
#     ~500 rows/us gather),
#   * un-quads the table cotangent densely (`_quad_table_adjoint`).
# Index derivatives are zero a.e. (floor); gradients w.r.t. sampling
# locations flow through the bilinear lerp weights exactly as in the
# reference's `ms_deform_attn_col2im_*` kernels.
# ---------------------------------------------------------------------------

_SCATTER_DNUMS = jax.lax.ScatterDimensionNumbers(
    update_window_dims=(1,), inserted_window_dims=(0,),
    scatter_dims_to_operand_dims=(0,),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def ms_deform_attn_quad(
    value, spatial_shapes, sampling_locations, attention_weights, q_chunk=0
):
    """`ms_deform_attn_xla_quad` with a hand-written backward (see above)."""
    return ms_deform_attn_xla_quad(
        value, spatial_shapes, sampling_locations, attention_weights, q_chunk
    )


def _quad_fwd(value, spatial_shapes, sampling_locations, attention_weights, q_chunk):
    B, S, H, D = value.shape
    Q, L, P = (sampling_locations.shape[1], sampling_locations.shape[3],
               sampling_locations.shape[4])
    # Saved-rows mode (default on, ZGDINO_MSDA_SAVE_ROWS=0 to disable):
    # keep the forward's gathered-row blocks alive as the residual
    # (~83 MB bf16 per encoder chain at 800x1216) so the backward skips the
    # regather — measured ~25 ms off the 6-layer b=1 train step on v5e
    # (`t_norows` +13.9 ms, docs/ab_results.jsonl). The per-call byte cap
    # (ZGDINO_MSDA_SAVE_ROWS_MAX_MB, default 800 — at b=1 the six encoder
    # layers then hold 6 x 662 MB next to params/activations on 16 GB HBM)
    # is a CHAIN BUDGET, not all-or-nothing: at b=2, where all 16 chains
    # (1.3 GB/layer) would OOM (relay crash-tested, r3), the first
    # floor(cap/chain_mb) chains save their rows and the rest regather in
    # the backward from the forward's quad table, which rides along in the
    # residual so the backward never rebuilds it. Only engages on the
    # unrolled chain path; under q-chunked remat or at larger batches the
    # memory-lean (value, loc, attn) residual below is kept.
    chain_mb = max(1, (Q * L * P * 4 * D * value.dtype.itemsize) >> 20)
    cap_mb = int(os.environ.get("ZGDINO_MSDA_SAVE_ROWS_MAX_MB", "800"))
    n_save = min(B * H, cap_mb // chain_mb)
    if (os.environ.get("ZGDINO_MSDA_SAVE_ROWS", "1") == "1"
            and not (q_chunk and q_chunk < Q) and B * H <= 16
            and _use_chains(B, B * Q * H * L * P,
                            int(os.environ.get("ZGDINO_MSDA_BH_MAX_B", "2")))
            and n_save > 0):
        out, rows, table_bh = _quad_small_batch(
            value, spatial_shapes, sampling_locations, attention_weights,
            save_rows_n=n_save,
        )
        res = {"rows": rows, "loc": sampling_locations,
               "attn": attention_weights}
        if n_save < B * H:
            # unsaved chains regather from the forward's table; when every
            # chain saved its rows the table is dropped from the residual
            # (XLA frees it after the forward)
            res["table_bh"] = table_bh
        return out, res
    out = ms_deform_attn_xla_quad(
        value, spatial_shapes, sampling_locations, attention_weights, q_chunk
    )
    return out, (value, sampling_locations, attention_weights)


def _quad_bwd(spatial_shapes, q_chunk, res, g):
    del q_chunk  # the (b, h) scan below bounds memory on its own
    saved_rows = None
    saved_table_bh = None
    if isinstance(res, dict):
        # saved-rows residual (see _quad_fwd): the forward's gathered-row
        # blocks are alive for the first len(rows) chains (no regather), and
        # the forward's quad table rides along for any unsaved chains (no
        # rebuild either way)
        saved_rows, loc, attn = res["rows"], res["loc"], res["attn"]
        saved_table_bh = res.get("table_bh")
        B, Q, H, L, P, _ = loc.shape
        D = saved_rows[0].shape[-1] // 4
        S = sum(int(h_) * int(w_) for h_, w_ in spatial_shapes)
        sq = sum((int(h_) + 1) * (int(w_) + 1) for h_, w_ in spatial_shapes)
        cd = saved_rows[0].dtype
        value_dtype = cd
    else:
        value, loc, attn = res
        B, S, H, D = value.shape
        _, Q, _, L, P, _ = loc.shape
        cd = value.dtype
        value_dtype = value.dtype
        quad_table, sq = _quad_table_build(value, spatial_shapes)
    k = L * P

    # recompute coords once for the whole call (a per-(b,h) recompute
    # variant measured +11.3 ms/step — `t_bwd_chain`, docs/ab_results.jsonl
    # — the 16x elementwise recompute costs more than the layout copies)
    idx, wts32 = _quad_coords(spatial_shapes, loc, attn)
    w4_src = wts32.astype(cd)

    # corner-unfold the output cotangent on the MXU (adjoint of the
    # final reshape(B,Q,H,4,D).sum(3)): g4[..., c*D+d] = g[..., d]
    unfold_np = np.zeros((D, 4 * D), np.float32)
    for c in range(4):
        unfold_np[np.arange(D), c * D + np.arange(D)] = 1.0
    unfold = jnp.asarray(unfold_np, cd)
    g4 = jnp.dot(
        g.reshape(-1, D).astype(cd), unfold, preferred_element_type=cd
    ).reshape(B, Q, H, 4 * D)

    # fold E^T into the corner-sum: d_w4[..., c] = sum_d d_w_wide[..., c*D+d]
    foldT_np = np.zeros((4 * D, 4), np.float32)
    for c in range(4):
        foldT_np[c * D:(c + 1) * D, c] = 1.0
    foldT = jnp.asarray(foldT_np, jnp.float32)

    # Scan over (b, h) pairs: each iteration gathers from and scatters into
    # that pair's OWN [sq, 4D] table slice. The scatter accumulator then
    # stays ~10 MB, which runs at ~107 rows/us on v5e vs ~57 rows/us for one
    # big >64 MB table (measured cliff) — the scatter is the backward's
    # dominant cost, so this halves it. Memory per iteration is bounded by
    # the [Q, K, 4D] row block (~83 MB at encoder scale).
    table_bh = (None if saved_rows is not None
                else quad_table.reshape(B * H, sq, 4 * D))
    idx_bh = jnp.moveaxis(idx, 2, 1).reshape(B * H, Q, k)
    w4_bh = jnp.moveaxis(w4_src, 2, 1).reshape(B * H, Q, k, 4)
    g4_bh = jnp.moveaxis(g4, 2, 1).reshape(B * H, Q, 4 * D)

    def chain_ops(i):
        return idx_bh[i], w4_bh[i], g4_bh[i]

    # bf16 scatter accumulator (default on under bf16 compute,
    # ZGDINO_MSDA_BF16_SCATTER=0 for f32): halves the accumulator bytes.
    # Measured (r3, bracketed): 298/300 ms -> 287 ms on the b=1 no-remat
    # train step — the v5e scatter engine has a modest byte-bound
    # component. Each slot receives ~K contributions, so bf16 rounding
    # adds ~sqrt(K)*2^-9 ~ 0.8% relative noise to d_value only (d_loc /
    # d_attn stay f32-accumulated); under bf16 compute the surrounding
    # tape is already bf16-rounded.
    acc_dtype = (cd if cd == jnp.bfloat16 and
                 os.environ.get("ZGDINO_MSDA_BF16_SCATTER", "1") == "1"
                 else jnp.float32)

    # One whole-table scatter per (b, h) chain: a per-LEVEL split of the
    # scatter (L smaller accumulators) measured +14.5 ms/step
    # (`t_per_level`, docs/ab_results.jsonl) — below the 16 MB cliff the
    # extra scatter issues cost more than the smaller accumulators save.
    def per_bh(rows, ci, w4c, g4c):
        # rows [Q,K,4D] (saved from forward, or regathered), ci [Q,K],
        # w4c [Q,K,4], g4c [Q,4D]
        g4b = g4c[:, None, :]  # broadcast over K
        d_rows = (g4b * _lane_expand(w4c, D)).astype(acc_dtype)
        d_tb = jax.lax.scatter_add(
            jnp.zeros((sq, 4 * D), acc_dtype), ci.reshape(-1, 1),
            d_rows.reshape(-1, 4 * D), _SCATTER_DNUMS,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).astype(jnp.float32)
        d_w_wide = g4b * rows  # [Q,K,4D]
        d_w4c = jnp.dot(
            d_w_wide.reshape(-1, 4 * D).astype(jnp.float32), foldT,
            preferred_element_type=jnp.float32,
        ).reshape(Q, k, 4)
        return d_tb, d_w4c

    def regather(tb, ci):
        return jax.lax.gather(
            tb, ci.reshape(-1, 1), _GATHER_DNUMS, slice_sizes=(1, 4 * D),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(Q, k, 4 * D)

    if saved_rows is not None:
        # chains beyond len(saved_rows) (byte-cap overflow at b=2, see
        # _quad_fwd) regather their rows from the forward's saved table
        def rows_for(i):
            if i < len(saved_rows):
                return saved_rows[i]
            return regather(saved_table_bh[i], idx_bh[i])

        parts = [per_bh(rows_for(i), *chain_ops(i)) for i in range(B * H)]
        d_table = jnp.stack([p[0] for p in parts])
        d_w4 = jnp.stack([p[1] for p in parts])
    elif B * H <= 16:
        # unrolled: the per-(b,h) chains are independent, so the scheduler
        # can overlap gathers/reduces with the (dominant) scatters across
        # chains — measured ~6% off the 6-layer fwd+bwd vs lax.scan
        def chain(i):
            ci, w4c, g4c = chain_ops(i)
            return per_bh(regather(table_bh[i], ci), ci, w4c, g4c)

        parts = [chain(i) for i in range(B * H)]
        d_table = jnp.stack([p[0] for p in parts])
        d_w4 = jnp.stack([p[1] for p in parts])
    else:
        _, (d_table, d_w4) = jax.lax.scan(
            lambda _, xs: (None, per_bh(regather(xs[0], xs[1]), *xs[1:])),
            None, (table_bh, idx_bh, w4_bh, g4_bh),
        )  # [B*H, sq, 4D], [B*H, Q, K, 4]
    d_w4 = jnp.moveaxis(d_w4.reshape(B, H, Q, k, 4), 1, 2)  # [B,Q,H,K,4]

    d_value = _quad_table_adjoint(
        d_table.reshape(B * H * sq, 4 * D), spatial_shapes, B, H, D
    ).astype(value_dtype)

    # pull the weight cotangent back to (locations, weights) through the
    # bilinear/validity formula (elementwise, cheap)
    _, pull = jax.vjp(lambda l, a: _quad_coords(spatial_shapes, l, a)[1], loc, attn)
    d_loc, d_attn = pull(d_w4.astype(jnp.float32))
    return d_value, d_loc.astype(loc.dtype), d_attn.astype(attn.dtype)


ms_deform_attn_quad.defvjp(_quad_fwd, _quad_bwd)


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
        return ms_deform_attn_quad(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "xla_autodiff":
        # quad forward with autodiff backward (for grad-parity testing)
        return ms_deform_attn_xla_quad(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    if impl == "xla_naive":
        return ms_deform_attn_xla(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    raise ValueError(f"unknown msda impl {impl!r}")
