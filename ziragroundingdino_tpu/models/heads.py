"""Classification / box heads.

Parity with `models/GroundingDINO/utils.py`:
  * `ContrastiveEmbed`           (`utils.py:234-269`) — query (x) text-token
    dot product, padded tokens -> -inf, padded out to max_text_len.
  * `ContrastiveEmbedwithLinear` (`utils.py:272-310`) — adds a trainable query
    projection (linear probing).
The box head is `layers.MLP` (3 layers, zero-init last — done by the model).

We use a large finite negative instead of -inf so downstream focal loss /
softmax gradients stay NaN-free; sigmoid underflows to 0.0 identically.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.models.layers import Dense, NEG_INF


class ContrastiveEmbed(nn.Module):
    max_text_len: int = 256
    use_linear: bool = False  # ContrastiveEmbedwithLinear (`utils.py:272`)
    hidden_dim: int = 256
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, text_dict: dict) -> jnp.ndarray:
        """x: [B, Q, E]; text_dict['encoded_text']: [B, T, E],
        text_dict['text_token_mask']: [B, T] True=valid. Returns
        [B, Q, max_text_len] fp32 logits."""
        y = text_dict["encoded_text"]
        mask = text_dict["text_token_mask"]
        if self.use_linear:
            x = Dense(self.hidden_dim, dtype=self.dtype, name="cls_linear")(x)
        res = jnp.einsum("bqe,bte->bqt", x, y).astype(jnp.float32)
        res = jnp.where(mask[:, None, :], res, NEG_INF)
        t = res.shape[-1]
        if t < self.max_text_len:
            pad = jnp.full((*res.shape[:-1], self.max_text_len - t), NEG_INF, jnp.float32)
            res = jnp.concatenate([res, pad], axis=-1)
        return res
