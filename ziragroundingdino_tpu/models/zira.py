"""ZiRa: Zero-interference Reparameterizable Adaptation (arXiv 2403.01680).

Parity with `groundingdino_dual_zero_rep_branch.py:62-135`:
  * `RepZeroLinear` / `RepZeroConv` — dual-branch modules: a trainable branch
    (weights init 1e-8) scaled by a learnable scalar (init lan/vis_scale=0.1),
    PLUS a zero-init "freeze" branch accumulating merged past-task deltas.
    Training forward: ``freeze(x) + s * branch(x)`` with the
    zero-interference loss ZIL = SmoothL1(branch_out, 0) + SmoothL1(out, 0)
    (`:87-95,119-127`). Eval forward: freeze branch only (`:94-95,126-127`).
  * `rep_merge` — `__rep__()` (`:97-103,129-135`) as a *pure function on the
    parameter pytree*: ``freeze += s * W``, re-zero the branch, reset s.
    No module mutation; callers get a new param tree (TPU-idiomatic: the
    train step stays functional, the merge happens between tasks on host).

Placement (wired in models/groundingdino.py):
  * language: `rep_linear_adapter` on the BERT output, added to feat_map's
    encoded text (`:242-252, 460-462`);
  * vision:   `input_proj_conv_adapter` per level, inside the input projection
    before GroupNorm (`:290-305, 487-529`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

ZERO_VALUE = 1e-8  # `groundingdino_dual_zero_rep_branch.py:62`
LAN_SCALE = 0.1  # :63
VIS_SCALE = 0.1  # :64


def smooth_l1_to_zero(x: jnp.ndarray, beta: float = 1.0) -> jnp.ndarray:
    """torch SmoothL1Loss(x, 0, reduction='mean') — `:85` uses default beta=1."""
    ax = jnp.abs(x.astype(jnp.float32))
    return jnp.mean(jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta))


class RepZeroLinear(nn.Module):
    features: int
    scale_init: float = LAN_SCALE
    zero_value: float = ZERO_VALUE
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = x.shape[-1]
        cd = self.dtype or x.dtype
        freeze_k = self.param("freeze_kernel", nn.initializers.zeros, (d, self.features))
        freeze_b = self.param("freeze_bias", nn.initializers.zeros, (self.features,))
        branch_k = self.param(
            "branch_kernel", nn.initializers.constant(self.zero_value), (d, self.features)
        )
        branch_b = self.param(
            "branch_bias", nn.initializers.constant(self.zero_value), (self.features,)
        )
        scaling = self.param("scaling", nn.initializers.constant(self.scale_init), (1,))

        out_freeze = jnp.dot(x.astype(cd), freeze_k.astype(cd)) + freeze_b.astype(cd)
        if not train:
            return out_freeze, jnp.zeros((), jnp.float32)

        branch_out = scaling.astype(cd) * (
            jnp.dot(x.astype(cd), branch_k.astype(cd)) + branch_b.astype(cd)
        )
        out = branch_out + out_freeze
        zil = smooth_l1_to_zero(branch_out) + smooth_l1_to_zero(out)
        return out, zil


class RepZeroConv(nn.Module):
    """Conv version (NHWC). kernel_size 1 (stride 1) or 3 (stride 2, pad 1)
    mirroring the two input_proj shapes (`:290-305`)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    scale_init: float = VIS_SCALE
    zero_value: float = ZERO_VALUE
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cd = self.dtype or x.dtype
        ks = self.kernel_size
        cin = x.shape[-1]
        pad = [(ks // 2, ks // 2)] * 2

        freeze_k = self.param(
            "freeze_kernel", nn.initializers.zeros, (ks, ks, cin, self.features)
        )
        freeze_b = self.param("freeze_bias", nn.initializers.zeros, (self.features,))
        branch_k = self.param(
            "branch_kernel", nn.initializers.constant(self.zero_value),
            (ks, ks, cin, self.features),
        )
        branch_b = self.param(
            "branch_bias", nn.initializers.constant(self.zero_value), (self.features,)
        )
        scaling = self.param("scaling", nn.initializers.constant(self.scale_init), (1,))

        def conv(inp, kern):
            return jax.lax.conv_general_dilated(
                inp.astype(cd), kern.astype(cd),
                window_strides=(self.stride, self.stride), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        out_freeze = conv(x, freeze_k) + freeze_b.astype(cd)
        if not train:
            return out_freeze, jnp.zeros((), jnp.float32)

        branch_out = scaling.astype(cd) * (conv(x, branch_k) + branch_b.astype(cd))
        out = branch_out + out_freeze
        zil = smooth_l1_to_zero(branch_out) + smooth_l1_to_zero(out)
        return out, zil


def is_rep_module(subtree) -> bool:
    return (
        isinstance(subtree, dict)
        and "freeze_kernel" in subtree
        and "branch_kernel" in subtree
        and "scaling" in subtree
    )


def rep_merge(params, zero_value: float = ZERO_VALUE):
    """Pure-function `__rep__()` over a whole param tree: for every RepZero
    module, ``freeze += scaling * branch``; branch re-zeroed to `zero_value`,
    scaling reset to its init (the caller's optimizer state should be reset
    alongside, as a new task starts). Returns a new tree.

    Parity: `groundingdino_dual_zero_rep_branch.py:97-103,129-135` (the
    after_train hook applies it to every module, `:739-745`).
    """

    def merge(sub):
        if is_rep_module(sub):
            s = sub["scaling"]
            new = dict(sub)
            new["freeze_kernel"] = sub["freeze_kernel"] + s * sub["branch_kernel"]
            new["freeze_bias"] = sub["freeze_bias"] + s[0] * sub["branch_bias"]
            new["branch_kernel"] = jnp.full_like(sub["branch_kernel"], zero_value)
            new["branch_bias"] = jnp.full_like(sub["branch_bias"], zero_value)
            # scaling reset to init value: the reference re-creates the
            # parameter at lan/vis scale; both are 0.1
            new["scaling"] = jnp.full_like(s, LAN_SCALE)
            return new
        if isinstance(sub, dict):
            return {k: merge(v) for k, v in sub.items()}
        return sub

    return merge(params)
