"""Sine position embeddings for image feature maps.

Parity with `backbone/position_encoding.py:78-135` (PositionEmbeddingSineHW,
normalize=True, separate H/W temperatures — GroundingDINO uses 20/20 via
`build_position_encoding`, `position_encoding.py:174-189`).

TPU-first differences: batch-first NHWC in, channel-last out ([B, H, W, C]
instead of the reference's [B, C, H, W]); mask is True = valid pixel (the
reference's NestedTensor mask is True = padded — inverted at the boundary).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def position_embedding_learned(
    mask,  # [B, H, W] (shape source only)
    row_embed,  # [50, F] learned table
    col_embed,  # [50, F]
):
    """`PositionEmbeddingLearned` (`backbone/position_encoding.py:137-171`):
    learned row/col embeddings concatenated per pixel. Returns
    [B, H, W, 2F].

    The reference table has 50 rows (the DETR limit) and indexes it with
    arange(h), failing beyond 50; here indices are clamped to the table so
    the variant works at production sizes (the stride-8 level of an 800px
    input is 100x152) — positions past the table share its last entry."""
    import jax.numpy as _jnp

    b, h, w = mask.shape
    x_emb = col_embed[_jnp.clip(_jnp.arange(w), 0, col_embed.shape[0] - 1)]  # [W, F]
    y_emb = row_embed[_jnp.clip(_jnp.arange(h), 0, row_embed.shape[0] - 1)]  # [H, F]
    pos = _jnp.concatenate(
        [
            _jnp.broadcast_to(x_emb[None, :, :], (h, w, x_emb.shape[-1])),
            _jnp.broadcast_to(y_emb[:, None, :], (h, w, y_emb.shape[-1])),
        ],
        axis=-1,
    )
    return _jnp.broadcast_to(pos[None], (b, h, w, pos.shape[-1]))


def position_embedding_sine_hw(
    mask: jnp.ndarray,  # [B, H, W] bool, True = valid
    num_pos_feats: int = 128,
    temperature_h: float = 20.0,
    temperature_w: float = 20.0,
    scale: float = 2.0 * math.pi,
) -> jnp.ndarray:
    """Returns [B, H, W, 2*num_pos_feats] fp32 position embedding."""
    not_mask = mask.astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)

    eps = 1e-6
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_tx = temperature_w ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    dim_ty = temperature_h ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    pos_x = x_embed[:, :, :, None] / dim_tx
    pos_y = y_embed[:, :, :, None] / dim_ty
    pos_x = jnp.stack((jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])), axis=-1).reshape(
        *pos_x.shape[:-1], -1
    )
    pos_y = jnp.stack((jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])), axis=-1).reshape(
        *pos_y.shape[:-1], -1
    )
    return jnp.concatenate((pos_y, pos_x), axis=-1)  # [B, H, W, 2F]
