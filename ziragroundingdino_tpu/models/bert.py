"""Native BERT-base text encoder (flax.linen).

Replaces the reference's HF `BertModel` + `BertModelWarper`
(`bertwarper.py:17-166`). The warper exists only to feed BERT a **3-D
block-diagonal attention mask** and **per-span position ids** (built by
`generate_masks_with_special_tokens_and_transfer_map`, `bertwarper.py:224-273`);
here those are first-class inputs, no wrapping needed.

Numerics match HF `bert-base-uncased`: post-LN encoder, LayerNorm eps 1e-12,
exact GELU, extended-attention-mask semantics (masked logits get a large
negative added before softmax). Softmax/LayerNorm run fp32; matmuls in the
compute dtype. Param tree mirrors HF module names so the checkpoint converter
is a key-map (`util/get_tokenlizer.py:21-26` loads the HF weights the same way).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.config import BertConfig
from ziragroundingdino_tpu.models.layers import Dense, LayerNorm, NEG_INF


class BertSelfAttention(nn.Module):
    cfg: BertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        cfg = self.cfg
        h = cfg.num_attention_heads
        hd = cfg.hidden_size // h
        cd = self.dtype or x.dtype

        def heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, hd).transpose(0, 2, 1, 3)

        q = heads(Dense(cfg.hidden_size, dtype=cd, name="query")(x))
        k = heads(Dense(cfg.hidden_size, dtype=cd, name="key")(x))
        v = heads(Dense(cfg.hidden_size, dtype=cd, name="value")(x))

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * (hd**-0.5)
        logits = logits + attn_bias  # [B, 1, T, T] additive
        probs = jax.nn.softmax(logits, axis=-1)
        if cfg.attention_dropout > 0.0 and not deterministic:
            probs = nn.Dropout(cfg.attention_dropout)(probs, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(cd), v)
        return out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], cfg.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        cfg = self.cfg
        cd = self.dtype or x.dtype
        attn = BertSelfAttention(cfg, dtype=cd, name="attention_self")(
            x, attn_bias, deterministic
        )
        attn = Dense(cfg.hidden_size, dtype=cd, name="attention_output_dense")(attn)
        if cfg.hidden_dropout > 0.0 and not deterministic:
            attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=False)
        x = LayerNorm(epsilon=cfg.layer_norm_eps, name="attention_output_norm")(x + attn)

        y = Dense(cfg.intermediate_size, dtype=cd, name="intermediate_dense")(x)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(cfg.hidden_size, dtype=cd, name="output_dense")(y)
        if cfg.hidden_dropout > 0.0 and not deterministic:
            y = nn.Dropout(cfg.hidden_dropout)(y, deterministic=False)
        return LayerNorm(epsilon=cfg.layer_norm_eps, name="output_norm")(x + y)


class BertEncoder(nn.Module):
    """Returns the last hidden state [B, T, hidden]. The pooler is omitted —
    the reference freezes it and never uses its output for detection
    (`groundingdino.py:118-121`)."""

    cfg: BertConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, T] int32
        attention_mask: jnp.ndarray,  # [B, T, T] bool (True = attend) or [B, T]
        position_ids: Optional[jnp.ndarray] = None,  # [B, T] int32
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, t = input_ids.shape
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None], (b, t))
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), dtype=jnp.int32)

        word = self.param(
            "word_embeddings", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size)
        )
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (cfg.max_position_embeddings, cfg.hidden_size),
        )
        typ = self.param(
            "token_type_embeddings",
            nn.initializers.normal(0.02),
            (cfg.type_vocab_size, cfg.hidden_size),
        )
        x = word[input_ids] + pos[position_ids] + typ[token_type_ids]
        x = LayerNorm(epsilon=cfg.layer_norm_eps, name="embeddings_norm")(x)
        if cfg.hidden_dropout > 0.0 and not deterministic:
            x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=False)
        x = x.astype(self.dtype or x.dtype)

        # HF extended-attention-mask semantics (`bertwarper.py:108-111` via
        # `get_extended_attention_mask`): bool -> additive large-negative.
        if attention_mask.ndim == 2:
            bias = jnp.where(attention_mask[:, None, None, :], 0.0, NEG_INF)
        else:
            bias = jnp.where(attention_mask[:, None, :, :], 0.0, NEG_INF)
        bias = bias.astype(jnp.float32)

        for i in range(cfg.num_hidden_layers):
            x = BertLayer(cfg, dtype=self.dtype, name=f"layer_{i}")(x, bias, deterministic)
        return x
