"""Shared neural-net building blocks (flax.linen).

TPU-first re-implementations of the reference's primitive modules:
  * `MLP`                — `models/GroundingDINO/utils.py:171-186`
  * `MultiHeadAttention` — torch ``nn.MultiheadAttention`` semantics (used by the
    text enhancer `transformer_vanilla.py:82` and decoder self/text-cross attn
    `transformer_for_adapter.py:946-952`), parameterized the torch way
    (packed qkv) so checkpoint conversion is mechanical.
  * sine embeddings      — `utils.py:24-53` (get_sine_pos_embed) and
    `utils.py:203-230` (gen_sineembed_for_position)
  * `DropPath`           — timm stochastic depth used throughout Swin/fusion.

Everything is batch-first and static-shape; masks are boolean with
True = attend / keep (the reference mixes conventions per call site — we
normalize to one and invert at the boundary).
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# Large negative for masked attention logits. Finite (not -inf) so that
# fully-masked rows produce uniform attention instead of NaN, and grads stay
# finite; chosen to underflow softmax in fp32 and bf16 alike.
NEG_INF = -1.0e9


def torch_linear_init(in_features: int):
    """torch ``nn.Linear`` default init: kaiming_uniform(a=sqrt(5)) on the
    weight == U(-1/sqrt(in), 1/sqrt(in)); same bound for the bias."""
    bound = 1.0 / math.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Dense(nn.Module):
    """``nn.Dense`` with torch-Linear default initialization so randomly
    initialized modules match the reference's statistics."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_linear_init(in_features)
        binit = self.bias_init or torch_linear_init(in_features)
        kernel = self.param("kernel", kinit, (in_features, self.features))
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch defaults (eps=1e-5) computed in fp32.

    Two-pass variance kept deliberately: the one-pass E[x^2] - E[x]^2 form
    measured perf-neutral on v5e (`ln_fast` leg, docs/ab_results.jsonl —
    the second read hides under the MSDA gathers' DMA waits) and has worse
    cancellation behavior, so it was deleted."""

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype or x.dtype)


class MLP(nn.Module):
    """DETR-style MLP with ReLU between layers (`utils.py:171-186`)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    zero_init_last: bool = False  # box heads zero-init the final layer
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            out = self.output_dim if last else self.hidden_dim
            kw = {}
            if last and self.zero_init_last:
                kw = dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
            x = Dense(out, dtype=self.dtype, name=f"layers_{i}", **kw)(x)
            if not last:
                x = jax.nn.relu(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth: drop the whole residual branch per sample (timm
    semantics used by Swin blocks and BiAttentionBlock)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class MultiHeadAttention(nn.Module):
    """torch ``nn.MultiheadAttention``-equivalent (batch-first).

    Packed-qkv parameterization: ``in_proj/{kernel,bias}`` with kernel
    [E, 3E] (the transpose of torch's ``in_proj_weight``), plus ``out_proj``.
    Scaled q, additive mask before a fp32 softmax.
    """

    num_heads: int
    dropout: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Tq, E]
        key: jnp.ndarray,  # [B, Tk, E]
        value: jnp.ndarray,  # [B, Tk, E]
        attn_mask: Optional[jnp.ndarray] = None,  # [B, Tq, Tk] bool, True=attend
        key_padding_mask: Optional[jnp.ndarray] = None,  # [B, Tk] bool, True=valid
        deterministic: bool = True,
    ) -> jnp.ndarray:
        e = query.shape[-1]
        h = self.num_heads
        hd = e // h
        assert hd * h == e

        in_kernel = self.param("in_proj_kernel", torch_linear_init(e), (e, 3 * e))
        in_bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        cd = self.dtype or query.dtype
        wq, wk, wv = jnp.split(in_kernel.astype(cd), 3, axis=1)
        bq, bk, bv = jnp.split(in_bias.astype(cd), 3)

        q = jnp.dot(query.astype(cd), wq) + bq
        k = jnp.dot(key.astype(cd), wk) + bk
        v = jnp.dot(value.astype(cd), wv) + bv

        def split_heads(t):
            b, s, _ = t.shape
            return t.reshape(b, s, h, hd).transpose(0, 2, 1, 3)  # [B,H,S,hd]

        q, k, v = map(split_heads, (q, k, v))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits * (1.0 / math.sqrt(hd))

        if attn_mask is not None:
            logits = jnp.where(attn_mask[:, None, :, :], logits, NEG_INF)
        if key_padding_mask is not None:
            logits = jnp.where(key_padding_mask[:, None, None, :], logits, NEG_INF)

        probs = jax.nn.softmax(logits, axis=-1).astype(cd)
        if self.dropout > 0.0 and not deterministic:
            probs = nn.Dropout(rate=self.dropout)(probs, deterministic=False)

        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(query.shape[0], query.shape[1], e)
        out = Dense(e, dtype=cd, name="out_proj")(out)
        return out


def get_sine_pos_embed(
    pos: jnp.ndarray,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    exchange_xy: bool = True,
) -> jnp.ndarray:
    """Sine embedding of a position tensor, parity with `utils.py:24-53`.

    pos: [..., n] -> [..., n * num_pos_feats].
    """
    scale = 2.0 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)

    def sine(x):  # x: [..., 1]
        s = x.astype(jnp.float32) * scale / dim_t  # [..., F]
        return jnp.stack((jnp.sin(s[..., 0::2]), jnp.cos(s[..., 1::2])), axis=-1).reshape(
            *s.shape[:-1], -1
        )

    parts = [sine(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def gen_sineembed_for_position(pos: jnp.ndarray, num_feats: int = 128) -> jnp.ndarray:
    """Box-coordinate sine embedding (`utils.py:203-230`): [..., 2 or 4] ->
    concat of num_feats-dim embeddings ordered (y, x[, w, h]). The reference
    hardcodes 128 = d_model/2."""
    scale = 2.0 * math.pi
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / num_feats)

    def embed(coord):  # [...]
        p = coord.astype(jnp.float32)[..., None] * scale / dim_t  # [..., 128]
        return jnp.stack((jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])), axis=-1).reshape(
            *p.shape[:-1], -1
        )

    x = embed(pos[..., 0])
    y = embed(pos[..., 1])
    if pos.shape[-1] == 2:
        return jnp.concatenate((y, x), axis=-1)
    w = embed(pos[..., 2])
    h = embed(pos[..., 3])
    return jnp.concatenate((y, x, w, h), axis=-1)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """`util/misc.py:704-709`: logit with clamping."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, eps, None)
    x2 = jnp.clip(1.0 - x, eps, None)
    return jnp.log(x1 / x2)


def activation_fn(name: str) -> Callable:
    """`utils.py:189-200`."""
    return {
        "relu": jax.nn.relu,
        "gelu": jax.nn.gelu,
        "selu": jax.nn.selu,
        "glu": jax.nn.glu,
    }[name]
