"""Swin block golden parity: shifted-window attention with relative position
bias vs a torch oracle re-deriving `backbone/swin_transformer.py:77-293`."""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from ziragroundingdino_tpu.models.swin import SwinBlock, _relative_position_index

pytestmark = pytest.mark.oracle  # heavy torch-parity/convergence tier


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, window, heads):
        super().__init__()
        self.dim, self.window, self.heads = dim, window, heads
        self.scale = (dim // heads) ** -0.5
        self.bias_table = nn.Parameter(torch.randn((2 * window - 1) ** 2, heads) * 0.02)
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        idx = _relative_position_index(window, window)
        self.register_buffer("rel_idx", torch.from_numpy(np.asarray(idx)))

    def forward(self, x, mask):
        b_, n, c = x.shape
        qkv = self.qkv(x).reshape(b_, n, 3, self.heads, c // self.heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.bias_table[self.rel_idx.view(-1)].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) + mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, window, heads)
        self.norm2 = nn.LayerNorm(dim)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)

    def forward(self, x):  # x: [B, H, W, C]
        b, h, w, c = x.shape
        win, shift = self.window, self.shift
        shortcut = x
        x = self.norm1(x)
        pad_b = (win - h % win) % win
        pad_r = (win - w % win) % win
        x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img_mask = torch.zeros(1, hp, wp, 1)
            cnt = 0
            for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
                    img_mask[:, hs, ws, :] = cnt
                    cnt += 1
            mw = img_mask.view(1, hp // win, win, wp // win, win, 1) \
                .permute(0, 1, 3, 2, 4, 5).reshape(-1, win * win)
            attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0) \
                                 .masked_fill(attn_mask == 0, 0.0)
        else:
            attn_mask = None
        xw = x.view(b, hp // win, win, wp // win, win, c).permute(0, 1, 3, 2, 4, 5) \
              .reshape(-1, win * win, c)
        xw = self.attn(xw, attn_mask)
        x = xw.view(b, hp // win, wp // win, win, win, c).permute(0, 1, 3, 2, 4, 5) \
              .reshape(b, hp, wp, c)
        if shift > 0:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :h, :w, :]
        x = shortcut + x
        return x + self.fc2(F.gelu(self.fc1(self.norm2(x))))


@pytest.mark.parametrize("shift", [0, 2])
def test_swin_block_parity(shift):
    torch.manual_seed(0)
    dim, heads, window = 16, 2, 4
    tm = TorchSwinBlock(dim, heads, window, shift).eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 14, dim).astype(np.float32)  # forces window padding
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    params = {
        "norm1": {"scale": tm.norm1.weight.detach().numpy(),
                  "bias": tm.norm1.bias.detach().numpy()},
        "norm2": {"scale": tm.norm2.weight.detach().numpy(),
                  "bias": tm.norm2.bias.detach().numpy()},
        "attn": {
            "relative_position_bias_table": tm.attn.bias_table.detach().numpy(),
            "qkv": {"kernel": tm.attn.qkv.weight.detach().numpy().T,
                    "bias": tm.attn.qkv.bias.detach().numpy()},
            "proj": {"kernel": tm.attn.proj.weight.detach().numpy().T,
                     "bias": tm.attn.proj.bias.detach().numpy()},
        },
        "mlp_fc1": {"kernel": tm.fc1.weight.detach().numpy().T,
                    "bias": tm.fc1.bias.detach().numpy()},
        "mlp_fc2": {"kernel": tm.fc2.weight.detach().numpy().T,
                    "bias": tm.fc2.bias.detach().numpy()},
    }
    blk = SwinBlock(dim=dim, num_heads=heads, window=window, shift=shift,
                    mlp_ratio=4.0, qkv_bias=True, drop_path=0.0)
    out = blk.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=3e-5, rtol=1e-4)


def test_swin_window_attn_f32_softmax_under_bf16():
    """The window-attention softmax stays f32 under bf16 compute (the
    compute-dtype softmax variant measured perf-neutral and was deleted,
    `swin_bf16_sm` leg in docs/ab_results.jsonl): the bf16 pipeline's
    output must stay within bf16 rounding of an all-f32 run."""
    from ziragroundingdino_tpu.models.swin import WindowAttention

    rng = np.random.RandomState(7)
    win, c, heads = 7, 32, 4
    x32 = jnp.asarray(rng.randn(6, win * win, c), jnp.float32)
    mod32 = WindowAttention(dim=c, window=win, num_heads=heads,
                            dtype=jnp.float32)
    params = mod32.init(jax.random.PRNGKey(0), x32, None)
    ref = np.asarray(mod32.apply(params, x32, None))
    mod16 = WindowAttention(dim=c, window=win, num_heads=heads,
                            dtype=jnp.bfloat16)
    got = np.asarray(
        mod16.apply(params, x32.astype(jnp.bfloat16), None), np.float32)
    denom = np.maximum(np.abs(ref), 1.0)
    assert np.max(np.abs(got - ref) / denom) < 3e-2, \
        np.max(np.abs(got - ref) / denom)
