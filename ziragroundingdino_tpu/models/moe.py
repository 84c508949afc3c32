"""Sparsely-gated mixture of experts, TPU-native.

Capability parity with `models/GroundingDINO/moe.py` (noisy top-k gating +
cv^2 importance/load balancing losses, `moe.py:144-307`; expert = 2-layer MLP
with kaiming-down / zero-up init, `moe.py:120-142`).

TPU-first design: the reference's `SparseDispatcher` (`moe.py:18-117`) does
host-style gather/scatter per expert — on TPU, for the small expert counts
used here (configs set num_experts=1, `GroundingDINO_SwinT_OGC_dt.py:76-77`),
**dense dispatch** is faster and fully static: every expert runs on every
token as one batched einsum over a stacked expert weight tensor, and the
top-k-sparse gate zeroes the unused outputs. No scatter, no dynamic shapes,
MXU-shaped matmuls.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _cv_squared(x: jnp.ndarray) -> jnp.ndarray:
    """Squared coefficient of variation (`moe.py:179-196`); 0 for size-1."""
    if x.shape[0] == 1:
        return jnp.zeros((), jnp.float32)
    x = x.astype(jnp.float32)
    eps = 1e-10
    return jnp.var(x) / (jnp.mean(x) ** 2 + eps)


def _normal_cdf(x: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * (1.0 + jax.lax.erf(x / jnp.sqrt(2.0).astype(x.dtype)))


class MoE(nn.Module):
    input_size: int
    output_size: int
    num_experts: int
    hidden_size: int
    k: int = 1
    noisy_gating: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, loss_coef: float = 1.0
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # x: [N, input_size]
        n, d = x.shape
        e = self.num_experts
        k = min(self.k, e)
        cd = self.dtype or x.dtype

        w_gate = self.param("w_gate", nn.initializers.zeros, (d, e))
        w_noise = self.param("w_noise", nn.initializers.zeros, (d, e))

        xf = x.astype(jnp.float32)
        clean_logits = xf @ w_gate  # [N, E]
        if self.noisy_gating and not deterministic:
            noise_std = jax.nn.softplus(xf @ w_noise) + 1e-2
            noise = jax.random.normal(self.make_rng("gating"), clean_logits.shape)
            logits = clean_logits + noise * noise_std
        else:
            noise_std = None
            logits = clean_logits

        m = min(k + 1, e)
        top_logits, top_idx = jax.lax.top_k(logits, m)  # [N, m]
        topk_logits = top_logits[:, :k]
        topk_idx = top_idx[:, :k]
        topk_gates = jax.nn.softmax(topk_logits, axis=-1)  # [N, k]

        # dense [N, E] gate matrix (scatter of top-k gates)
        onehot = jax.nn.one_hot(topk_idx, e, dtype=jnp.float32)  # [N, k, E]
        gates = jnp.einsum("nk,nke->ne", topk_gates, onehot)

        # load-balancing losses (`moe.py:200-225, 283-287`)
        importance = gates.sum(0)
        if self.noisy_gating and k < e and not deterministic:
            thr_in = top_logits[:, k : k + 1]  # kth value (0-based k)
            thr_out = top_logits[:, k - 1 : k]
            is_in = logits > thr_in
            prob_in = _normal_cdf((clean_logits - thr_in) / noise_std)
            prob_out = _normal_cdf((clean_logits - thr_out) / noise_std)
            load = jnp.where(is_in, prob_in, prob_out).sum(0)
        else:
            load = (gates > 0).astype(jnp.float32).sum(0)
        aux_loss = (_cv_squared(importance) + _cv_squared(load)) * loss_coef

        # dense dispatch: all experts on all tokens, gate-weighted combine
        fc1 = self.param(
            "fc1_kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / math.sqrt(d), 1.0 / math.sqrt(d)
            ),
            (e, d, self.hidden_size),
        )
        fc1_b = self.param("fc1_bias", nn.initializers.zeros, (e, self.hidden_size))
        fc2 = self.param("fc2_kernel", nn.initializers.zeros, (e, self.hidden_size, self.output_size))
        fc2_b = self.param("fc2_bias", nn.initializers.zeros, (e, self.output_size))

        h = jnp.einsum("nd,edh->enh", x.astype(cd), fc1.astype(cd)) + fc1_b[:, None].astype(cd)
        h = jax.nn.relu(h)
        y = jnp.einsum("enh,eho->eno", h, fc2.astype(cd)) + fc2_b[:, None].astype(cd)
        out = jnp.einsum("ne,eno->no", gates.astype(cd), y)
        return out, aux_loss
