"""Swin Transformer backbone, TPU-native (flax.linen, NHWC, static shapes).

Capability parity with the reference backbone
(`backbone/swin_transformer.py:501-760`): 4 stages of shifted-window
attention with relative position bias, patch merging between stages, per-stage
output LayerNorms on `out_indices`. GroundingDINO-T uses embed 96, depths
(2,2,6,2), heads (3,6,12,24), window 7, out_indices (1,2,3)
(`swin_transformer.py:771-787`, config `GroundingDINO_SwinT_OGC_rep.py:10`).

TPU-first design notes (not a port):
  * NHWC layout end-to-end; window partition is a reshape/transpose pair that
    XLA fuses — no data movement beyond the attention itself.
  * All shapes are static under jit (images are padded to bucket shapes), so
    the shifted-window attention mask and the relative-position index are
    computed in numpy at trace time and baked into the program as constants.
  * Attention runs in the caller's compute dtype (bf16) with fp32 softmax;
    LayerNorms are fp32.
  * No im2col/unfold: patch embed is a strided conv (MXU-friendly).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.config import SwinConfig
from ziragroundingdino_tpu.models.layers import Dense, DropPath, LayerNorm, torch_linear_init


@functools.lru_cache(maxsize=None)
def _relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Static [wh*ww, wh*ww] index into the (2wh-1)(2ww-1) bias table
    (`swin_transformer.py:110-124`)."""
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))  # [2,wh,ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).copy()
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1)  # [N, N]


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """Static additive mask [nW, N, N] for shifted windows
    (`swin_transformer.py:416-443`): 0 where tokens share a region, -100
    across the cyclic-shift seam."""
    img_mask = np.zeros((hp, wp), dtype=np.int32)
    slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for h in slices:
        for w in slices:
            img_mask[h, w] = cnt
            cnt += 1
    nh, nw = hp // window, wp // window
    win = img_mask.reshape(nh, window, nw, window).transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # [nW, N, N]


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (`swin_transformer.py:77-175`)."""

    dim: int
    window: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[np.ndarray]) -> jnp.ndarray:
        # x: [B*nW, N, C] with N = window**2; attn_mask: static [nW, N, N] or None
        bw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        cd = self.dtype or x.dtype

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        rel_idx = _relative_position_index(self.window, self.window)  # static
        rel_bias = bias_table[rel_idx.reshape(-1)].reshape(n, n, h)
        rel_bias = rel_bias.transpose(2, 0, 1)  # [h, N, N]

        # NOTE(r3): leaving q/k/v in the Dense's native [B*nW, N, h, hd]
        # layout and giving dot_general the head axis as a trailing batch
        # dim measured 100.3 ms/fwd vs 74.4 at b=1 — XLA's internal operand
        # relayouts cost far more than these explicit transposes. Keep the
        # up-front [3, B*nW, h, N, hd] transpose.
        qkv = Dense(3 * c, use_bias=self.qkv_bias, dtype=cd, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)  # [3, B*nW, h, N, hd]
        q, k, v = qkv[0], qkv[1], qkv[2]

        # f32 softmax kept: a compute-dtype (bf16) logits+bias+softmax chain
        # measured perf-neutral on v5e (`swin_bf16_sm` leg,
        # docs/ab_results.jsonl — the convert fusions hide under MSDA DMA),
        # so the numerically safer f32 chain stays.
        sd = jnp.float32
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * (hd**-0.5), k).astype(sd)
        logits = logits + rel_bias[None].astype(sd)
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(bw // nw, nw, h, n, n) + jnp.asarray(
                attn_mask, sd)[None, :, None]
            logits = logits.reshape(bw, h, n, n)
        probs = jax.nn.softmax(logits, axis=-1).astype(cd)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return Dense(c, dtype=cd, name="proj")(out)


class SwinBlock(nn.Module):
    """One (shifted-)window transformer block (`swin_transformer.py:177-293`)."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float
    qkv_bias: bool
    drop_path: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        # x: [B, H, W, C]; H, W static
        b, h, w, c = x.shape
        window = self.window
        shift = self.shift
        # reference shrinks window to cover the whole map when smaller
        if min(h, w) <= window:
            # matches the reference behavior of padding then attending globally:
            # with Hp=Wp<=window the shift becomes a no-op (mask covers all)
            pass

        shortcut = x
        x = LayerNorm(name="norm1")(x)

        pad_b = (window - h % window) % window
        pad_r = (window - w % window) % window
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            attn_mask = _shift_attn_mask(hp, wp, window, shift)
        else:
            attn_mask = None

        nh, nw = hp // window, wp // window
        xw = x.reshape(b, nh, window, nw, window, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, window * window, c)

        xw = WindowAttention(
            dim=c, window=window, num_heads=self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(xw, attn_mask)

        x = xw.reshape(b, nh, nw, window, window, c).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(b, hp, wp, c)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        x = x[:, :h, :w, :]

        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic)

        y = LayerNorm(name="norm2")(x)
        hidden = int(c * self.mlp_ratio)
        y = Dense(hidden, dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 patch concat + LN + linear 4C->2C (`swin_transformer.py:297-330`)."""

    dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)  # [B, H/2, W/2, 4C]
        x = LayerNorm(name="norm")(x)
        return Dense(2 * c, use_bias=False, dtype=self.dtype, name="reduction")(x)


def interpolate_mask_nearest(mask: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour mask resize, parity with
    ``F.interpolate(mode='nearest')`` (`swin_transformer.py:748-752`):
    src = floor(dst * in/out)."""
    b, in_h, in_w = mask.shape
    ys = (jnp.arange(out_h) * in_h) // out_h
    xs = (jnp.arange(out_w) * in_w) // out_w
    return mask[:, ys][:, :, xs]


class PatchEmbed(nn.Module):
    """Patch embedding computed as space-to-depth + matmul: a 3-channel-input
    strided conv is layout-hostile on TPU (~1.7 ms at 800x1216, measured)
    while the equivalent [ps*ps*3, C] matmul is ~free. Params keep the conv
    kernel shape [ps, ps, 3, C] for checkpoint-key fidelity
    (`swin_transformer.py:459-500`); the row-major (i, j, c) kernel flatten
    matches the patch flatten order exactly, so numerics are identical to
    the conv up to matmul accumulation order."""

    features: int
    patch: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:
        b, h0, w0, cin = pixels.shape
        ps = self.patch
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (ps, ps, cin, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        cdt = self.dtype or pixels.dtype
        xb = pixels.astype(cdt)
        patches = xb.reshape(b, h0 // ps, ps, w0 // ps, ps, cin)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ps * ps * cin)
        y = jnp.dot(
            patches, kernel.astype(cdt).reshape(ps * ps * cin, self.features),
            preferred_element_type=cdt,
        )
        return y.reshape(b, h0 // ps, w0 // ps, self.features) + bias.astype(cdt)


class SwinTransformer(nn.Module):
    """The full backbone. Input NHWC image + validity mask; output a list of
    (feature [B,h,w,C], mask [B,h,w]) per out_index."""

    cfg: SwinConfig
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, pixels: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True
    ) -> Sequence[Tuple[jnp.ndarray, jnp.ndarray]]:
        cfg = self.cfg
        b, h0, w0, _ = pixels.shape
        ps = cfg.patch_size
        assert h0 % ps == 0 and w0 % ps == 0, "pad image buckets to patch multiples"

        # patch embed: strided conv + LN (`swin_transformer.py:459-500`).
        # Computed as space-to-depth + matmul: a 3-channel-input conv is
        # layout-hostile on TPU (~1.7 ms at 800x1216, measured) while the
        # equivalent [ps*ps*3, C] matmul is ~free. Params keep the conv
        # kernel shape for checkpoint-key fidelity; the row-major (i, j, c)
        # flatten below matches the patch flatten order exactly.
        x = PatchEmbed(
            features=cfg.embed_dim, patch=ps, dtype=self.dtype,
            name="patch_embed_proj",
        )(pixels)
        x = LayerNorm(name="patch_embed_norm")(x)

        dims = cfg.num_features
        total_depth = sum(cfg.depths)
        dpr = np.linspace(0.0, cfg.drop_path_rate, total_depth)

        outs = []
        blk_id = 0
        # remat trades FLOPs for HBM, replacing the reference's
        # torch.utils.checkpoint path (`swin_transformer.py:551,446-449`)
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if cfg.use_checkpoint else SwinBlock
        for stage in range(cfg.num_layers):
            dim = dims[stage]
            for i in range(cfg.depths[stage]):
                x = block_cls(
                    dim=dim,
                    num_heads=cfg.num_heads[stage],
                    window=cfg.window_size,
                    shift=0 if i % 2 == 0 else cfg.window_size // 2,
                    mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias,
                    drop_path=float(dpr[blk_id]),
                    dtype=self.dtype,
                    name=f"layers_{stage}_blocks_{i}",
                )(x, deterministic)
                blk_id += 1

            if stage in cfg.out_indices:
                y = LayerNorm(name=f"norm{stage}")(x)
                lvl_mask = interpolate_mask_nearest(mask, x.shape[1], x.shape[2])
                outs.append((y.astype(self.dtype or y.dtype), lvl_mask))

            if stage < cfg.num_layers - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype, name=f"layers_{stage}_downsample")(x)

        return outs
