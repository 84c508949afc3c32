"""Golden-layer parity: each transformer building block vs a torch oracle
re-deriving the reference math (`fuse_modules.py:99-305`,
`transformer_vanilla.py:72-123`, `transformer_for_adapter.py:809-907,
910-1073`), with weights copied across. Catches wiring bugs (residual
orders, norm placement, scaling) that shape tests cannot."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.common import tiny_config
from ziragroundingdino_tpu.models.fusion import BiAttentionBlock
from ziragroundingdino_tpu.models.transformer import (
    DeformableDecoderLayer,
    DeformableEncoderLayer,
    TextEnhancerLayer,
    encoder_reference_points,
)

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier

torch.manual_seed(0)


def lin_params(mod):  # torch Linear -> flax Dense
    return {"kernel": mod.weight.detach().numpy().T, "bias": mod.bias.detach().numpy()}


def ln_params(mod):
    return {"scale": mod.weight.detach().numpy(), "bias": mod.bias.detach().numpy()}


def mha_params(mod):  # torch nn.MultiheadAttention -> our MultiHeadAttention
    return {
        "in_proj_kernel": mod.in_proj_weight.detach().numpy().T,
        "in_proj_bias": mod.in_proj_bias.detach().numpy(),
        "out_proj": lin_params(mod.out_proj),
    }


# ---------------------------------------------------------------------------
# torch oracles (reference math, written from fuse_modules/transformer files)
# ---------------------------------------------------------------------------


class TorchBiMHA(nn.Module):
    def __init__(self, v_dim, l_dim, embed_dim, num_heads):
        super().__init__()
        self.embed_dim, self.num_heads = embed_dim, num_heads
        self.head_dim = embed_dim // num_heads
        self.scale = self.head_dim ** (-0.5)
        self.v_proj = nn.Linear(v_dim, embed_dim)
        self.l_proj = nn.Linear(l_dim, embed_dim)
        self.values_v_proj = nn.Linear(v_dim, embed_dim)
        self.values_l_proj = nn.Linear(l_dim, embed_dim)
        self.out_v_proj = nn.Linear(embed_dim, v_dim)
        self.out_l_proj = nn.Linear(embed_dim, l_dim)

    def forward(self, v, l, mask_v=None, mask_l=None):
        bsz, n_v, _ = v.shape
        def shape(t):
            return t.view(bsz, -1, self.num_heads, self.head_dim).transpose(1, 2) \
                    .reshape(bsz * self.num_heads, -1, self.head_dim)
        q = shape(self.v_proj(v) * self.scale)
        k = shape(self.l_proj(l))
        vv = shape(self.values_v_proj(v))
        vl = shape(self.values_l_proj(l))
        attn = torch.bmm(q, k.transpose(1, 2))
        attn = attn - attn.max()
        attn = attn.clamp(-50000, 50000)
        attn_t = attn.transpose(1, 2)
        attn_l = attn_t - attn_t.max(dim=-1, keepdim=True)[0]
        attn_l = attn_l.clamp(-50000, 50000)
        if mask_v is not None:
            m = (~mask_v)[:, None, None, :].repeat(1, self.num_heads, 1, 1).flatten(0, 1)
            attn_l = attn_l.masked_fill(m, float("-inf"))
        attn_l = attn_l.softmax(-1)
        if mask_l is not None:
            m = (~mask_l)[:, None, None, :].repeat(1, self.num_heads, 1, 1).flatten(0, 1)
            attn = attn.masked_fill(m, float("-inf"))
        attn_v = attn.softmax(-1)
        out_v = torch.bmm(attn_v, vl).view(bsz, self.num_heads, n_v, self.head_dim) \
                     .transpose(1, 2).reshape(bsz, n_v, self.embed_dim)
        n_l = l.shape[1]
        out_l = torch.bmm(attn_l, vv).view(bsz, self.num_heads, n_l, self.head_dim) \
                     .transpose(1, 2).reshape(bsz, n_l, self.embed_dim)
        return self.out_v_proj(out_v), self.out_l_proj(out_l)


class TorchFusion(nn.Module):
    def __init__(self, v_dim, l_dim, embed_dim, num_heads, init_values=1e-4):
        super().__init__()
        self.layer_norm_v = nn.LayerNorm(v_dim)
        self.layer_norm_l = nn.LayerNorm(l_dim)
        self.attn = TorchBiMHA(v_dim, l_dim, embed_dim, num_heads)
        self.gamma_v = nn.Parameter(init_values * torch.ones(v_dim))
        self.gamma_l = nn.Parameter(init_values * torch.ones(l_dim))

    def forward(self, v, l, mask_v=None, mask_l=None):
        v = self.layer_norm_v(v)
        l = self.layer_norm_l(l)
        dv, dl = self.attn(v, l, mask_v, mask_l)
        return v + self.gamma_v * dv, l + self.gamma_l * dl


def test_fusion_block_parity():
    cfg = tiny_config()
    d, heads = cfg.hidden_dim, cfg.nheads // 2
    embed = cfg.dim_feedforward // 2
    tm = TorchFusion(d, d, embed, heads).eval()
    rng = np.random.RandomState(0)
    v = rng.randn(2, 10, d).astype(np.float32)
    l = rng.randn(2, 7, d).astype(np.float32)
    mask_v = np.ones((2, 10), bool); mask_v[1, 7:] = False
    mask_l = np.ones((2, 7), bool); mask_l[0, 5:] = False

    with torch.no_grad():
        rv, rl = tm(torch.from_numpy(v), torch.from_numpy(l),
                    torch.from_numpy(mask_v), torch.from_numpy(mask_l))

    params = {
        "layer_norm_v": ln_params(tm.layer_norm_v),
        "layer_norm_l": ln_params(tm.layer_norm_l),
        "gamma_v": tm.gamma_v.detach().numpy(),
        "gamma_l": tm.gamma_l.detach().numpy(),
        "attn": {
            name: lin_params(getattr(tm.attn, name))
            for name in ("v_proj", "l_proj", "values_v_proj", "values_l_proj",
                          "out_v_proj", "out_l_proj")
        },
    }
    blk = BiAttentionBlock(v_dim=d, l_dim=d, embed_dim=embed, num_heads=heads)
    ov, ol = blk.apply({"params": params}, jnp.asarray(v), jnp.asarray(l),
                       jnp.asarray(mask_v), jnp.asarray(mask_l))
    np.testing.assert_allclose(np.asarray(ov), rv.numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ol), rl.numpy(), atol=2e-5, rtol=1e-4)


def test_text_enhancer_parity():
    cfg = tiny_config()
    d, heads, ffn = cfg.hidden_dim, cfg.nheads // 2, cfg.dim_feedforward // 2

    class TorchTEL(nn.Module):  # transformer_vanilla.py:72-123
        def __init__(self):
            super().__init__()
            self.self_attn = nn.MultiheadAttention(d, heads)
            self.linear1 = nn.Linear(d, ffn)
            self.linear2 = nn.Linear(ffn, d)
            self.norm1 = nn.LayerNorm(d)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, src, src_mask, pos):
            # src: [T, B, d]; src_mask [B*h, T, T] bool True=BLOCK
            q = k = src + pos
            src2 = self.self_attn(q, k, value=src, attn_mask=src_mask)[0]
            src = self.norm1(src + src2)
            src2 = self.linear2(F.relu(self.linear1(src)))
            return self.norm2(src + src2)

    tm = TorchTEL().eval()
    rng = np.random.RandomState(1)
    b, t = 2, 9
    x = rng.randn(b, t, d).astype(np.float32)
    pos = rng.randn(b, t, d).astype(np.float32)
    allow = np.zeros((b, t, t), bool)
    for i in range(b):
        allow[i, :5, :5] = True
        allow[i, 5:, 5:] = True
    with torch.no_grad():
        block = torch.from_numpy(~allow).repeat_interleave(heads, dim=0)
        ref = tm(torch.from_numpy(x).transpose(0, 1),
                 block, torch.from_numpy(pos).transpose(0, 1)).transpose(0, 1)

    params = {
        "self_attn": mha_params(tm.self_attn),
        "linear1": lin_params(tm.linear1),
        "linear2": lin_params(tm.linear2),
        "norm1": ln_params(tm.norm1),
        "norm2": ln_params(tm.norm2),
    }
    layer = TextEnhancerLayer(cfg)
    out = layer.apply({"params": params}, jnp.asarray(x), jnp.asarray(allow),
                      jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-5, rtol=1e-4)


def _torch_msda_module(d, heads, levels, points):
    """Reference MultiScaleDeformableAttention with the grid_sample fallback
    (`ms_deform_attn.py:133-354` math)."""

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.sampling_offsets = nn.Linear(d, heads * levels * points * 2)
            self.attention_weights = nn.Linear(d, heads * levels * points)
            self.value_proj = nn.Linear(d, d)
            self.output_proj = nn.Linear(d, d)

        def forward(self, query, value, reference_points, shapes, key_padding_mask):
            # batch-first; key_padding_mask True = PAD
            b, s, _ = value.shape
            q = query.shape[1]
            v = self.value_proj(value)
            if key_padding_mask is not None:
                v = v.masked_fill(key_padding_mask[..., None], 0.0)
            v = v.view(b, s, heads, d // heads)
            off = self.sampling_offsets(query).view(b, q, heads, levels, points, 2)
            aw = self.attention_weights(query).view(b, q, heads, levels * points)
            aw = aw.softmax(-1).view(b, q, heads, levels, points)
            if reference_points.shape[-1] == 2:
                norm = torch.as_tensor([[wl, hl] for hl, wl in shapes], dtype=torch.float32)
                loc = reference_points[:, :, None, :, None, :] + off / norm[None, None, None, :, None, :]
            else:
                loc = reference_points[:, :, None, :, None, :2] + \
                      off / points * reference_points[:, :, None, :, None, 2:] * 0.5
            # grid_sample fallback
            grids = 2 * loc - 1
            out_list = []
            start = 0
            for li, (hl, wl) in enumerate(shapes):
                vl = v[:, start:start + hl * wl].flatten(2).transpose(1, 2) \
                      .reshape(b * heads, d // heads, hl, wl)
                start += hl * wl
                g = grids[:, :, :, li].transpose(1, 2).flatten(0, 1)
                out_list.append(F.grid_sample(vl, g, mode="bilinear",
                                              padding_mode="zeros", align_corners=False))
            aw_t = aw.transpose(1, 2).reshape(b * heads, 1, q, levels * points)
            out = (torch.stack(out_list, dim=-2).flatten(-2) * aw_t).sum(-1) \
                .view(b, heads * (d // heads), q).transpose(1, 2)
            return self.output_proj(out)

    return M()


def _msda_params(tm):
    return {name: lin_params(getattr(tm, name))
            for name in ("sampling_offsets", "attention_weights", "value_proj",
                          "output_proj")}


def test_deformable_encoder_layer_parity():
    cfg = tiny_config(num_feature_levels=2, enc_n_points=2)
    d, heads = cfg.hidden_dim, cfg.nheads
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)

    tm_attn = _torch_msda_module(d, heads, 2, 2).eval()

    class TorchEncLayer(nn.Module):  # transformer_for_adapter.py:809-907
        def __init__(self):
            super().__init__()
            self.self_attn = tm_attn
            self.norm1 = nn.LayerNorm(d)
            self.linear1 = nn.Linear(d, cfg.dim_feedforward)
            self.linear2 = nn.Linear(cfg.dim_feedforward, d)
            self.norm2 = nn.LayerNorm(d)

        def forward(self, src, pos, ref, shapes, pad_mask):
            src2 = self.self_attn(src + pos, src, ref, shapes, pad_mask)
            src = self.norm1(src + src2)
            src2 = self.linear2(F.relu(self.linear1(src)))
            return self.norm2(src + src2)

    tm = TorchEncLayer().eval()
    rng = np.random.RandomState(2)
    b = 2
    src = rng.randn(b, s, d).astype(np.float32)
    pos = rng.randn(b, s, d).astype(np.float32)
    valid = np.ones((b, s), bool)
    valid[1, -5:] = False
    valid_ratios = np.ones((b, 2, 2), np.float32)
    ref = np.asarray(encoder_reference_points(shapes, jnp.asarray(valid_ratios)))

    with torch.no_grad():
        out_ref = tm(torch.from_numpy(src), torch.from_numpy(pos),
                     torch.from_numpy(ref), shapes, torch.from_numpy(~valid))

    params = {
        "self_attn": _msda_params(tm_attn),
        "norm1": ln_params(tm.norm1),
        "linear1": lin_params(tm.linear1),
        "linear2": lin_params(tm.linear2),
        "norm2": ln_params(tm.norm2),
    }
    layer = DeformableEncoderLayer(cfg)
    out = layer.apply({"params": params}, jnp.asarray(src), jnp.asarray(pos),
                      jnp.asarray(ref), shapes, jnp.asarray(valid))[0]
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=5e-5, rtol=1e-3)


def test_deformable_decoder_layer_parity():
    cfg = tiny_config(num_feature_levels=2, dec_n_points=2)
    d, heads = cfg.hidden_dim, cfg.nheads
    shapes = ((6, 8), (3, 4))
    s = sum(h * w for h, w in shapes)
    q, t = 5, 7

    tm_cross = _torch_msda_module(d, heads, 2, 2).eval()

    class TorchDecLayer(nn.Module):  # transformer_for_adapter.py:910-1073
        def __init__(self):
            super().__init__()
            self.cross_attn = tm_cross
            self.norm1 = nn.LayerNorm(d)
            self.ca_text = nn.MultiheadAttention(d, heads)
            self.catext_norm = nn.LayerNorm(d)
            self.self_attn = nn.MultiheadAttention(d, heads)
            self.norm2 = nn.LayerNorm(d)
            self.linear1 = nn.Linear(d, cfg.dim_feedforward)
            self.linear2 = nn.Linear(cfg.dim_feedforward, d)
            self.norm3 = nn.LayerNorm(d)

        def forward(self, tgt, qpos, ref_in, memory, mem_pad, text, text_pad):
            # seq-first like the reference decoder
            qk = tgt + qpos
            tgt2 = self.self_attn(qk, qk, tgt)[0]
            tgt = self.norm2(tgt + tgt2)
            tgt2 = self.ca_text(tgt + qpos, text, text, key_padding_mask=text_pad)[0]
            tgt = self.catext_norm(tgt + tgt2)
            # cross_attn is batch-first; ref_in comes in batch-first already
            tgt2 = self.cross_attn(
                (tgt + qpos).transpose(0, 1), memory.transpose(0, 1),
                ref_in, shapes, mem_pad).transpose(0, 1)
            tgt = self.norm1(tgt + tgt2)
            tgt2 = self.linear2(F.relu(self.linear1(tgt)))
            return self.norm3(tgt + tgt2)

    tm = TorchDecLayer().eval()
    rng = np.random.RandomState(3)
    b = 2
    tgt = rng.randn(b, q, d).astype(np.float32)
    qpos = rng.randn(b, q, d).astype(np.float32)
    memory = rng.randn(b, s, d).astype(np.float32)
    text = rng.randn(b, t, d).astype(np.float32)
    text_valid = np.ones((b, t), bool); text_valid[0, 5:] = False
    mem_valid = np.ones((b, s), bool); mem_valid[1, -4:] = False
    ref_in = rng.uniform(0.2, 0.8, (b, q, 2, 4)).astype(np.float32)

    with torch.no_grad():
        out_ref = tm(
            torch.from_numpy(tgt).transpose(0, 1),
            torch.from_numpy(qpos).transpose(0, 1),
            torch.from_numpy(ref_in),
            torch.from_numpy(memory).transpose(0, 1),
            torch.from_numpy(~mem_valid),
            torch.from_numpy(text).transpose(0, 1),
            torch.from_numpy(~text_valid),
        ).transpose(0, 1)

    params = {
        "self_attn": mha_params(tm.self_attn),
        "norm2": ln_params(tm.norm2),
        "ca_text": mha_params(tm.ca_text),
        "catext_norm": ln_params(tm.catext_norm),
        "cross_attn": _msda_params(tm_cross),
        "norm1": ln_params(tm.norm1),
        "linear1": lin_params(tm.linear1),
        "linear2": lin_params(tm.linear2),
        "norm3": ln_params(tm.norm3),
    }
    layer = DeformableDecoderLayer(cfg)
    out = layer.apply({"params": params}, jnp.asarray(tgt), jnp.asarray(qpos),
                      jnp.asarray(ref_in), jnp.asarray(memory),
                      jnp.asarray(mem_valid), shapes, jnp.asarray(text),
                      jnp.asarray(text_valid))[0]
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=5e-5, rtol=1e-3)


def test_proposals_and_sine_embeds_parity():
    """gen_encoder_output_proposals (`utils.py:56-116`) + the two sine
    embeddings (`utils.py:24-53, 203-230`) vs torch re-derivations."""
    from ziragroundingdino_tpu.models.layers import (
        gen_sineembed_for_position, get_sine_pos_embed,
    )
    from ziragroundingdino_tpu.models.transformer import gen_encoder_output_proposals

    shapes = ((4, 6), (2, 3))
    s = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(4)
    b, d = 2, 16
    memory = rng.randn(b, s, d).astype(np.float32)
    valid = np.ones((b, s), bool)
    valid[1, -3:] = False

    # torch oracle
    mem_t = torch.from_numpy(memory)
    pad = torch.from_numpy(~valid)
    proposals = []
    cur = 0
    for lvl, (hl, wl) in enumerate(shapes):
        mflat = pad[:, cur:cur + hl * wl].view(b, hl, wl, 1)
        vh = torch.sum(~mflat[:, :, 0, 0], 1)
        vw = torch.sum(~mflat[:, 0, :, 0], 1)
        gy, gx = torch.meshgrid(torch.linspace(0, hl - 1, hl),
                                torch.linspace(0, wl - 1, wl), indexing="ij")
        grid = torch.cat([gx.unsqueeze(-1), gy.unsqueeze(-1)], -1)
        scale = torch.cat([vw.unsqueeze(-1), vh.unsqueeze(-1)], 1).view(b, 1, 1, 2)
        grid = (grid.unsqueeze(0).expand(b, -1, -1, -1) + 0.5) / scale
        wh = torch.ones_like(grid) * 0.05 * (2.0 ** lvl)
        proposals.append(torch.cat((grid, wh), -1).view(b, -1, 4))
        cur += hl * wl
    out_props = torch.cat(proposals, 1)
    valid_p = ((out_props > 0.01) & (out_props < 0.99)).all(-1, keepdim=True)
    logit_p = torch.log(out_props / (1 - out_props))
    keep = (~pad.unsqueeze(-1)) & valid_p
    mem_ref = mem_t.masked_fill(~keep, 0.0)

    mem_j, props_j = gen_encoder_output_proposals(
        jnp.asarray(memory), jnp.asarray(valid), shapes)
    np.testing.assert_allclose(np.asarray(mem_j), mem_ref.numpy(), atol=1e-6)
    keep_np = np.asarray(keep)
    np.testing.assert_allclose(
        np.asarray(props_j)[keep_np[..., 0]],
        logit_p.numpy()[keep_np[..., 0]], atol=1e-4, rtol=1e-4)
    assert np.all(np.asarray(props_j)[~keep_np[..., 0]] == 1e6)

    # sine embeds vs the reference formulas
    pos = rng.rand(3, 5, 4).astype(np.float32)
    ours = np.asarray(gen_sineembed_for_position(jnp.asarray(pos), num_feats=16))
    dim_t = 10000.0 ** (2 * (np.arange(16) // 2) / 16)
    def emb(x):
        p = x[..., None] * 2 * math.pi / dim_t
        return np.stack([np.sin(p[..., 0::2]), np.cos(p[..., 1::2])], -1).reshape(*p.shape[:-1], -1)
    ref = np.concatenate([emb(pos[..., 1]), emb(pos[..., 0]),
                          emb(pos[..., 2]), emb(pos[..., 3])], -1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)

    pos1 = rng.rand(2, 6, 1).astype(np.float32)
    ours2 = np.asarray(get_sine_pos_embed(jnp.asarray(pos1), num_pos_feats=16,
                                          exchange_xy=False))
    ref2 = emb(pos1[..., 0])
    np.testing.assert_allclose(ours2, ref2, atol=1e-5)
