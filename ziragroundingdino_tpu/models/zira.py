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


def _masked_mean(per_elem: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over valid positions only. `mask` broadcasts against per_elem's
    leading dims (e.g. [B, T] against [B, T, D]). The reference computes its
    ZIL over the batch-"longest"-padded BERT output — at batch 1 (its
    training batch per GPU is 1-2 and captions within a batch share a
    length under its loaders) that equals the mean over VALID tokens. Our
    static text buckets always carry padding, so the mask is required for
    the same semantics (full-model grad oracle pins this)."""
    x = per_elem.astype(jnp.float32)
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(jnp.float32)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m) / jnp.maximum(
        jnp.sum(jnp.broadcast_to(m, x.shape).astype(jnp.float32)), 1.0
    )


def smooth_l1_to_zero(
    x: jnp.ndarray, beta: float = 1.0, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """torch SmoothL1Loss(x, 0, reduction='mean') — `:85` uses default beta=1."""
    ax = jnp.abs(x.astype(jnp.float32))
    return _masked_mean(jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta), mask)


def l1_to_zero(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """torch L1Loss(x, 0) — the multilayer variant's ZIL
    (`groundingdino_dual_zero_rep_multilayer_branch.py:89`)."""
    return _masked_mean(jnp.abs(x.astype(jnp.float32)), mask)


def zil_fn(kind: str):
    return {"smooth_l1": smooth_l1_to_zero, "l1": l1_to_zero}[kind]


class RepZeroLinear(nn.Module):
    features: int
    scale_init: float = LAN_SCALE
    zero_value: float = ZERO_VALUE
    zil: str = "smooth_l1"  # multilayer variant uses "l1" with scale 1.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
        loss = zil_fn(self.zil)
        return out, loss(branch_out, mask=mask) + loss(out, mask=mask)


class RepZeroLoRA(nn.Module):
    """Low-rank dual branch (`adapter.py:227-259`): trainable branch =
    scaling * up(down(x)) with up/down init 1e-8, PLUS a zero-init bias-free
    freeze linear accumulating merged deltas. The reference offers this as
    the alternative `rep_linear_adapter` (`groundingdino_dual_zero_rep_
    branch.py:251-253`); merge is ``freeze += scaling * (up @ down)``
    (`adapter.py:255-259`). Eval forward: freeze branch only."""

    features: int
    down_dim: Optional[int] = None  # reference default: in_features // 4
    scale_init: float = LAN_SCALE
    zero_value: float = ZERO_VALUE
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        d = x.shape[-1]
        dd = self.down_dim or d // 4
        cd = self.dtype or x.dtype
        freeze_k = self.param("freeze_kernel", nn.initializers.zeros, (d, self.features))
        down_k = self.param(
            "down_kernel", nn.initializers.constant(self.zero_value), (d, dd)
        )
        up_k = self.param(
            "up_kernel", nn.initializers.constant(self.zero_value), (dd, self.features)
        )
        scaling = self.param("scaling", nn.initializers.constant(self.scale_init), (1,))

        out_freeze = jnp.dot(x.astype(cd), freeze_k.astype(cd))
        if not train:
            return out_freeze, jnp.zeros((), jnp.float32)

        branch_out = scaling.astype(cd) * jnp.dot(
            jnp.dot(x.astype(cd), down_k.astype(cd)), up_k.astype(cd)
        )
        out = branch_out + out_freeze
        return out, (smooth_l1_to_zero(branch_out, mask=mask)
                     + smooth_l1_to_zero(out, mask=mask))


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


class RepZeroConvGN(nn.Module):
    """Multilayer variant's vision module (`groundingdino_dual_zero_rep_
    multilayer_branch.py:70-113`): dual conv branches whose SUM passes a
    zero-init GroupNorm during training ("freeze_gn", weight/bias init
    1e-8); eval uses the freeze conv only (no GN). scaling init 1.0; L1 ZIL."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    zero_value: float = ZERO_VALUE
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cd = self.dtype or x.dtype
        ks = self.kernel_size
        cin = x.shape[-1]
        pad = [(ks // 2, ks // 2)] * 2

        freeze_k = self.param("freeze_kernel", nn.initializers.zeros, (ks, ks, cin, self.features))
        freeze_b = self.param("freeze_bias", nn.initializers.zeros, (self.features,))
        branch_k = self.param(
            "branch_kernel", nn.initializers.constant(self.zero_value),
            (ks, ks, cin, self.features),
        )
        branch_b = self.param(
            "branch_bias", nn.initializers.constant(self.zero_value), (self.features,)
        )
        scaling = self.param("scaling", nn.initializers.ones, (1,))
        gn_scale = self.param(
            "freeze_gn_scale", nn.initializers.constant(self.zero_value), (self.features,)
        )
        gn_bias = self.param(
            "freeze_gn_bias", nn.initializers.constant(self.zero_value), (self.features,)
        )

        def conv(inp, kern, b):
            y = jax.lax.conv_general_dilated(
                inp.astype(cd), kern.astype(cd),
                window_strides=(self.stride, self.stride), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b.astype(cd)

        out_freeze = conv(x, freeze_k, freeze_b)
        if not train:
            return out_freeze, jnp.zeros((), jnp.float32)

        branch_out = conv(x, branch_k, branch_b) * scaling.astype(cd)
        s = (branch_out + out_freeze).astype(jnp.float32)
        b_, h_, w_, c_ = s.shape
        g = 32
        sg = s.reshape(b_, h_ * w_, g, c_ // g)
        mean = sg.mean(axis=(1, 3), keepdims=True)
        var = jnp.mean(jnp.square(sg - mean), axis=(1, 3), keepdims=True)
        sg = (sg - mean) * jax.lax.rsqrt(var + 1e-5)
        out = sg.reshape(b_, h_, w_, c_) * gn_scale + gn_bias
        out = out.astype(cd)
        zil = l1_to_zero(branch_out) + l1_to_zero(out)
        return out, zil


class RepZeroTransformerLayer(nn.Module):
    """Frozen MHA + dual-branch FFN linears (`groundingdino_dual_zero_rep_
    multilayer_branch.py:149-227`); merge adds branch into freeze 1:1."""

    embed_dim: int
    nhead: int = 8
    down_dim: int = 2048
    zero_value: float = ZERO_VALUE
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from ziragroundingdino_tpu.models.layers import LayerNorm, MultiHeadAttention, Dense

        cd = self.dtype or x.dtype
        attn = MultiHeadAttention(num_heads=self.nhead, dtype=cd, name="freeze_self_attn")(
            x, x, x
        )
        x = LayerNorm(name="freeze_norm1")(x + attn).astype(cd)

        def dual(name_freeze, name_free, feat, inp):
            d = inp.shape[-1]
            fk = self.param(f"{name_freeze}_kernel", nn.initializers.zeros, (d, feat))
            fb = self.param(f"{name_freeze}_bias", nn.initializers.zeros, (feat,))
            bk = self.param(
                f"{name_free}_kernel", nn.initializers.constant(self.zero_value), (d, feat)
            )
            bb = self.param(
                f"{name_free}_bias", nn.initializers.constant(self.zero_value), (feat,)
            )
            frozen = jnp.dot(inp.astype(cd), fk.astype(cd)) + fb.astype(cd)
            if not train:
                return frozen, None
            branch = jnp.dot(inp.astype(cd), bk.astype(cd)) + bb.astype(cd)
            return frozen + branch, branch

        # NOTE: freeze_linear1 is randomly init in torch (nn.Linear default);
        # here zeros — checkpoint conversion overwrites it, fresh training of
        # this (unused-by-default) module differs only in init
        y1, b1 = dual("freeze_linear1", "free_linear1", self.down_dim, x)
        y1 = jax.nn.relu(y1)
        y2, b2 = dual("freeze_linear2", "free_linear2", self.embed_dim, y1)
        out = LayerNorm(name="freeze_norm2")(y2).astype(cd)
        if not train:
            return out, jnp.zeros((), jnp.float32)
        return out, l1_to_zero(b1) + l1_to_zero(b2) + l1_to_zero(out)


class ZeroConvBN(nn.Module):
    """repconvbn variant (`groundingdino_repconvbn.py:65-140`): branch =
    conv + BatchNorm (stats updated in training), merged by folding BN into
    the conv at `__rep__`. BN statistics live in a `batch_stats` collection."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    zero_value: float = ZERO_VALUE
    momentum: float = 0.9
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cd = self.dtype or x.dtype
        ks = self.kernel_size
        cin = x.shape[-1]
        pad = [(ks // 2, ks // 2)] * 2

        freeze_k = self.param("freeze_kernel", nn.initializers.zeros, (ks, ks, cin, self.features))
        freeze_b = self.param("freeze_bias", nn.initializers.zeros, (self.features,))
        branch_k = self.param(
            "branch_kernel", nn.initializers.constant(self.zero_value),
            (ks, ks, cin, self.features),
        )
        branch_b = self.param(
            "branch_bias", nn.initializers.constant(self.zero_value), (self.features,)
        )
        bn_scale = self.param("bn_scale", nn.initializers.constant(self.zero_value), (self.features,))
        bn_bias = self.param("bn_bias", nn.initializers.constant(self.zero_value), (self.features,))
        ra_mean = self.variable(
            "batch_stats", "bn_mean",
            lambda: jnp.full((self.features,), self.zero_value, jnp.float32),
        )
        ra_var = self.variable(
            "batch_stats", "bn_var",
            lambda: jnp.full((self.features,), self.zero_value, jnp.float32),
        )

        def conv(inp, kern, b):
            y = jax.lax.conv_general_dilated(
                inp.astype(cd), kern.astype(cd),
                window_strides=(self.stride, self.stride), padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + b.astype(cd)

        out_freeze = conv(x, freeze_k, freeze_b)
        if not train:
            return out_freeze, jnp.zeros((), jnp.float32)

        y = conv(x, branch_k, branch_b).astype(jnp.float32)
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.var(y, axis=(0, 1, 2))
        if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        y = (y - mean) * jax.lax.rsqrt(var + 1e-5) * bn_scale + bn_bias
        branch_out = y.astype(cd)
        out = branch_out + out_freeze
        zil = smooth_l1_to_zero(branch_out) + smooth_l1_to_zero(out)
        return out, zil


def rep_merge_convbn(params, batch_stats, zero_value: float = ZERO_VALUE, eps: float = 1e-5):
    """`__rep__` for ZeroConvBN (`groundingdino_repconvbn.py:107-140`):
    fold BN into the branch conv (`_fuse_bn_tensor`) then add into freeze.
    Returns (params', batch_stats')."""

    def merge(p, s):
        if isinstance(p, dict) and "bn_scale" in p and "branch_kernel" in p:
            new = dict(p)
            std = jnp.sqrt(s["bn_var"] + eps)
            t = p["bn_scale"] / std
            new["freeze_kernel"] = p["freeze_kernel"] + p["branch_kernel"] * t
            new["freeze_bias"] = p["freeze_bias"] + (
                p["bn_bias"] + (p["branch_bias"] - s["bn_mean"]) * t
            )
            new["branch_kernel"] = jnp.full_like(p["branch_kernel"], zero_value)
            new["branch_bias"] = jnp.full_like(p["branch_bias"], zero_value)
            new["bn_scale"] = jnp.full_like(p["bn_scale"], zero_value)
            new["bn_bias"] = jnp.full_like(p["bn_bias"], zero_value)
            ns = {
                "bn_mean": jnp.full_like(s["bn_mean"], zero_value),
                "bn_var": jnp.full_like(s["bn_var"], zero_value),
            }
            return new, ns
        if isinstance(p, dict):
            out_p, out_s = {}, {}
            for k2, v2 in p.items():
                if isinstance(s, dict) and k2 in s:
                    out_p[k2], out_s[k2] = merge(v2, s[k2])
                else:
                    out_p[k2], out_s[k2] = v2, None
            return out_p, {k2: v2 for k2, v2 in out_s.items() if v2 is not None}
        return p, s

    return merge(params, batch_stats)


def is_rep_module(subtree) -> bool:
    return (
        isinstance(subtree, dict)
        and "freeze_kernel" in subtree
        and "branch_kernel" in subtree
        and "scaling" in subtree
    )


def default_scale_reset(path: str, sub) -> float:
    """The reference's `__rep__` re-creates scaling at each MODULE's own init:
    dual variant 0.1 (lan/vis, `:97-103,129-135`); multilayer variant 1.0 for
    both the GN conv modules (`multilayer_branch.py:107-113`) and its
    `rep_language_adapter` (`:116-146`)."""
    if "freeze_gn_scale" in sub or "rep_language_adapter" in path:
        return 1.0
    return LAN_SCALE  # == VIS_SCALE == 0.1


def scale_reset_for_cfg(cfg):
    """Post-merge scaling reset honoring the config's init values
    (`zira_lan_scale` / `zira_vis_scale`); the reference's `__rep__`
    re-creates each module's scaling at its own init."""

    def reset(path, sub):
        if isinstance(sub, dict) and "freeze_gn_scale" in sub:
            return 1.0
        if "rep_language_adapter" in path:
            return 1.0  # multilayer variant inits scaling at 1.0
        if "rep_linear_adapter" in path:
            return cfg.zira_lan_scale
        return cfg.zira_vis_scale

    return reset


def rep_merge(params, zero_value: float = ZERO_VALUE, scale_reset=default_scale_reset):
    """Pure-function `__rep__()` over a whole param tree: for every RepZero
    module, ``freeze += scaling * branch``; branch re-zeroed to `zero_value`,
    scaling reset to the module's init via `scale_reset(path, subtree)` (the
    caller's optimizer state should be reset alongside, as a new task
    starts). Returns a new tree.

    Parity: `groundingdino_dual_zero_rep_branch.py:97-103,129-135` (the
    after_train hook applies it to every module, `:739-745`).
    """

    def merge(sub, path):
        if isinstance(sub, dict) and "down_kernel" in sub and "up_kernel" in sub \
                and "freeze_kernel" in sub and "scaling" in sub:
            # RepZeroLoRA `__rep__` (`adapter.py:255-259`): low-rank product
            # folded into freeze, factors re-zeroed, scaling reset to init
            s = sub["scaling"]
            new = dict(sub)
            new["freeze_kernel"] = sub["freeze_kernel"] + s[0] * jnp.dot(
                sub["down_kernel"], sub["up_kernel"]
            )
            new["down_kernel"] = jnp.full_like(sub["down_kernel"], zero_value)
            new["up_kernel"] = jnp.full_like(sub["up_kernel"], zero_value)
            # reset to the module's configured init via the callback (like
            # every other rep module) — NOT a hardcoded LAN_SCALE: a run
            # with zira_lan_scale != 0.1 must resume each task at its own
            # init, matching the reference's __rep__ re-creation
            new["scaling"] = jnp.full_like(s, scale_reset(path, sub))
            return new
        if is_rep_module(sub):
            s = sub["scaling"]
            new = dict(sub)
            new["freeze_kernel"] = sub["freeze_kernel"] + s * sub["branch_kernel"]
            new["freeze_bias"] = sub["freeze_bias"] + s[0] * sub["branch_bias"]
            new["branch_kernel"] = jnp.full_like(sub["branch_kernel"], zero_value)
            new["branch_bias"] = jnp.full_like(sub["branch_bias"], zero_value)
            new["scaling"] = jnp.full_like(s, scale_reset(path, sub))
            return new
        if isinstance(sub, dict) and "free_linear1_kernel" in sub:
            # RepZeroTransformerLayer (`multilayer_branch.py:186-196`)
            new = dict(sub)
            for i in (1, 2):
                for part in ("kernel", "bias"):
                    fz, fr = f"freeze_linear{i}_{part}", f"free_linear{i}_{part}"
                    new[fz] = sub[fz] + sub[fr]
                    new[fr] = jnp.full_like(sub[fr], zero_value)
            return {
                k: (merge(v, f"{path}/{k}") if isinstance(v, dict) else v)
                for k, v in new.items()
            }
        if isinstance(sub, dict):
            return {k: merge(v, f"{path}/{k}") for k, v in sub.items()}
        return sub

    return merge(params, "")
