"""Parameter-efficient adapter library.

Parity with `models/GroundingDINO/adapter.py`:
  * `Adapter`        (`adapter.py:124-179`) — down-64-up bottleneck,
    kaiming-uniform down / zero up, cosine-similarity gate vs learned gate
    embeddings x sigmoid(T * sim) * base_scale, optional self-KD L1 loss on
    the input.
  * `LinearAdapter`  (`adapter.py:7-58`) — single zero-init linear + gate.
  * `TransformerAdapter` (`adapter.py:61-121`) — full TEL with zero-init
    output projection.
  * `MoeAdapter`     (`adapter.py:182-219`) — wraps `MoE` (see moe.py).

All return ``(output, aux_loss)`` with aux_loss a fp32 scalar.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.models.layers import Dense, LayerNorm, MultiHeadAttention


def _kaiming_uniform_a5(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on a [in, out] kernel (fan_in = in)."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class _Gate(nn.Module):
    """Cosine-similarity gate (`adapter.py:40-49,161-171`)."""

    embed_dim: int
    output_dim: int
    num_gate_embed: int = 5
    gate_t: float = 2.0
    gate_base_scale: float = 0.5
    use_gate: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if not self.use_gate:
            return self.gate_base_scale
        gate = self.param(
            "gate", nn.initializers.normal(1.0), (self.num_gate_embed, self.embed_dim)
        )
        xf = x.astype(jnp.float32)
        xn = xf / jnp.linalg.norm(xf, axis=-1, keepdims=True)
        gn = gate / jnp.linalg.norm(gate, axis=-1, keepdims=True)
        sim = jnp.max(jnp.einsum("bnd,gd->bng", xn, gn), axis=-1)  # [B, N]
        return (self.gate_base_scale * jax.nn.sigmoid(self.gate_t * sim))[..., None]


class Adapter(nn.Module):
    """Bottleneck adapter with gate + self-KD (`adapter.py:124-179`)."""

    embed_dim: int = 256
    down_dim: int = 64
    num_gate_embed: int = 5
    gate_t: float = 2.0
    gate_base_scale: float = 0.5
    use_gate: bool = True
    use_self_kd: bool = True
    output_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        out_dim = self.output_dim or self.embed_dim
        y = Dense(self.down_dim, kernel_init=_kaiming_uniform_a5,
                  bias_init=nn.initializers.zeros, dtype=self.dtype, name="adapter_down")(x)
        y = jax.nn.relu(y)
        y = Dense(out_dim, kernel_init=nn.initializers.zeros,
                  bias_init=nn.initializers.zeros, dtype=self.dtype, name="adapter_up")(y)
        loss = jnp.zeros((), jnp.float32)
        if self.use_self_kd:
            loss = jnp.mean(jnp.abs(x.astype(jnp.float32)))
        scale = _Gate(
            embed_dim=self.embed_dim, output_dim=out_dim,
            num_gate_embed=self.num_gate_embed, gate_t=self.gate_t,
            gate_base_scale=self.gate_base_scale, use_gate=self.use_gate, name="gate",
        )(x)
        return (y * scale).astype(y.dtype), loss


class LinearAdapter(nn.Module):
    """Zero-init linear adapter with gate (`adapter.py:7-58`)."""

    embed_dim: int = 256
    num_gate_embed: int = 5
    gate_t: float = 2.0
    gate_base_scale: float = 0.5
    use_gate: bool = True
    use_self_kd: bool = True
    output_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        out_dim = self.output_dim or self.embed_dim
        y = Dense(out_dim, kernel_init=nn.initializers.zeros,
                  bias_init=nn.initializers.zeros, dtype=self.dtype, name="linear")(x)
        loss = jnp.zeros((), jnp.float32)
        if self.use_self_kd:
            loss = jnp.mean(jnp.abs(x.astype(jnp.float32)))
        scale = _Gate(
            embed_dim=self.embed_dim, output_dim=out_dim,
            num_gate_embed=self.num_gate_embed, gate_t=self.gate_t,
            gate_base_scale=self.gate_base_scale, use_gate=self.use_gate, name="gate",
        )(x)
        return (y * scale).astype(y.dtype), loss


class TransformerAdapter(nn.Module):
    """Full transformer-encoder-layer adapter with zero-init out projection
    (`adapter.py:61-121`)."""

    embed_dim: int
    nhead: int = 8
    down_dim: int = 2048
    use_self_kd: bool = False
    output_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        out_dim = self.output_dim or self.embed_dim
        attn = MultiHeadAttention(num_heads=self.nhead, dtype=self.dtype, name="self_attn")(
            x, x, x, deterministic=deterministic
        )
        x = LayerNorm(name="norm1")(x + attn).astype(attn.dtype)
        y = Dense(self.down_dim, dtype=self.dtype, name="linear1")(x)
        y = jax.nn.relu(y)
        y = Dense(self.embed_dim, dtype=self.dtype, name="linear2")(y)
        x = LayerNorm(name="norm2")(x + y).astype(y.dtype)
        out = Dense(out_dim, kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype, name="project_out")(x)
        loss = jnp.zeros((), jnp.float32)
        if self.use_self_kd:
            loss = jnp.mean(jnp.abs(out.astype(jnp.float32)))
        return out, loss


class MoeAdapter(nn.Module):
    """MoE bottleneck adapter (`adapter.py:182-219`); fixed scalar gate."""

    embed_dim: int = 256
    down_dim: int = 64
    gate_base_scale: float = 0.5
    num_experts: int = 1
    topk: int = 1
    use_self_kd: bool = True
    output_dim: Optional[int] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True, loss_coef: float = 1.0):
        from ziragroundingdino_tpu.models.moe import MoE

        out_dim = self.output_dim or self.embed_dim
        b, n, d = x.shape
        y, moe_loss = MoE(
            input_size=self.embed_dim, output_size=out_dim,
            num_experts=self.num_experts, hidden_size=self.down_dim,
            k=self.topk, dtype=self.dtype, name="adapter_moe",
        )(x.reshape(b * n, d), deterministic=deterministic, loss_coef=loss_coef)
        y = y.reshape(b, n, -1)
        if self.use_self_kd:
            moe_loss = moe_loss + jnp.mean(jnp.abs(y.astype(jnp.float32)))
        return y * self.gate_base_scale, moe_loss
