"""Bi-directional vision-language fusion.

Parity with `models/GroundingDINO/fuse_modules.py`:
  * `BiMultiHeadAttention` (`fuse_modules.py:99-248`) — one shared
    img-query x text-key logit matrix drives both directions; "stable
    softmax" subtracts the *global* max (`:184`) and clamps to +-50000
    (`:187-202`) before per-direction masking + softmax.
  * `BiAttentionBlock` (`fuse_modules.py:252-305`) — pre-LN, layer-scale
    gamma_v/gamma_l (init 1e-4), DropPath on both residuals. NOTE the
    reference's residual adds onto the *normalized* input (`:288-303`:
    ``v = layer_norm_v(v); v = v + drop_path(gamma_v * delta_v)``) — kept.

The +-50000 clamps exist for fp16 AMP; they are exact no-ops after the max
subtraction for realistic logit ranges, but are kept (cheap) for bit parity.
Masks here are True = valid (reference passes True = padded and inverts with
``masked_fill``; we invert at the call boundary).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.models.layers import Dense, DropPath, LayerNorm, NEG_INF


class BiMultiHeadAttention(nn.Module):
    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,  # [B, Nv, v_dim]
        l: jnp.ndarray,  # [B, Nl, l_dim]
        mask_v: Optional[jnp.ndarray] = None,  # [B, Nv] bool True=valid
        mask_l: Optional[jnp.ndarray] = None,  # [B, Nl] bool True=valid
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.num_heads
        hd = self.embed_dim // h
        cd = self.dtype or v.dtype
        scale = hd**-0.5

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd).transpose(0, 2, 1, 3)

        q_v = heads(Dense(self.embed_dim, dtype=cd, name="v_proj")(v) * scale)
        k_l = heads(Dense(self.embed_dim, dtype=cd, name="l_proj")(l))
        val_v = heads(Dense(self.embed_dim, dtype=cd, name="values_v_proj")(v))
        val_l = heads(Dense(self.embed_dim, dtype=cd, name="values_l_proj")(l))

        # [B, h, Nv, Nl] shared logits. The reference's "stable softmax"
        # prelude (global-max subtract at `fuse_modules.py:184`, +-50000
        # clamps, per-direction max subtract) is an exact no-op here:
        # softmax is shift-invariant, `jax.nn.softmax` subtracts the row
        # max internally, and after a max subtraction the clamps never
        # bind in f32 (they exist for the reference's fp16 AMP). Folding
        # them away removes ~8 elementwise passes + one transpose copy
        # over the [Nv, Nl] f32 matrix per fusion layer (Nv ~= 20k).
        logits = jnp.einsum("bhvd,bhld->bhvl", q_v, k_l).astype(jnp.float32)

        # text->vision direction softmaxes over Nv (axis -2; keeping the
        # [B, h, Nv, Nl] layout lets the out_l einsum contract over v
        # without the explicit logits^T relayout)
        logits_l = logits
        if mask_v is not None:
            logits_l = jnp.where(mask_v[:, None, :, None], logits_l, NEG_INF)
        attn_l = jax.nn.softmax(logits_l, axis=-2)  # [B, h, Nv, Nl]

        if mask_l is not None:
            logits = jnp.where(mask_l[:, None, None, :], logits, NEG_INF)
        attn_v = jax.nn.softmax(logits, axis=-1)

        if self.dropout > 0.0 and not deterministic:
            attn_v = nn.Dropout(self.dropout)(attn_v, deterministic=False)
            attn_l = nn.Dropout(self.dropout)(attn_l, deterministic=False)

        out_v = jnp.einsum("bhvl,bhld->bhvd", attn_v.astype(cd), val_l)
        out_l = jnp.einsum("bhvl,bhvd->bhld", attn_l.astype(cd), val_v)

        out_v = out_v.transpose(0, 2, 1, 3).reshape(v.shape[0], v.shape[1], self.embed_dim)
        out_l = out_l.transpose(0, 2, 1, 3).reshape(l.shape[0], l.shape[1], self.embed_dim)
        out_v = Dense(self.v_dim, dtype=cd, name="out_v_proj")(out_v)
        out_l = Dense(self.l_dim, dtype=cd, name="out_l_proj")(out_l)
        return out_v, out_l


class BiAttentionBlock(nn.Module):
    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    drop_path: float = 0.0
    init_values: float = 1e-4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        v: jnp.ndarray,
        l: jnp.ndarray,
        mask_v: Optional[jnp.ndarray] = None,
        mask_l: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        v = LayerNorm(name="layer_norm_v")(v)
        l = LayerNorm(name="layer_norm_l")(l)
        delta_v, delta_l = BiMultiHeadAttention(
            v_dim=self.v_dim, l_dim=self.l_dim, embed_dim=self.embed_dim,
            num_heads=self.num_heads, dropout=self.dropout, dtype=self.dtype, name="attn",
        )(v, l, mask_v=mask_v, mask_l=mask_l, deterministic=deterministic)

        gamma_v = self.param("gamma_v", nn.initializers.constant(self.init_values), (self.v_dim,))
        gamma_l = self.param("gamma_l", nn.initializers.constant(self.init_values), (self.l_dim,))
        dp = DropPath(self.drop_path, name="drop_path")
        # residual is on the normalized input, as in the reference (:288-303)
        v = v + dp(gamma_v * delta_v, deterministic)
        l = l + dp(gamma_l * delta_l, deterministic)
        return v.astype(delta_v.dtype), l.astype(delta_l.dtype)
