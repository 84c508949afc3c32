"""ResNet-50/101 backbone with frozen BatchNorm (flax, NHWC).

Capability parity with the reference's torchvision alternative
(`backbone/backbone.py:33-71`: resnet50/101 with `FrozenBatchNorm2d`,
return_interm_indices selecting layer1..4 outputs). GroundingDINO configs
default to Swin, but the backbone registry supports both
(`backbone/backbone.py:162-221`).

FrozenBatchNorm (statistics and affine both fixed) is just a per-channel
affine y = x * scale' + bias' with scale' = gamma/sqrt(var+eps),
bias' = beta - mean*gamma/sqrt(var+eps); we keep the four tensors separate
for checkpoint fidelity and fold at trace time (free under jit).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ziragroundingdino_tpu.models.swin import interpolate_mask_nearest

RESNET_DEPTHS = {"resnet50": (3, 4, 6, 3), "resnet101": (3, 4, 23, 3)}


class FrozenBatchNorm(nn.Module):
    """`FrozenBatchNorm2d` (torchvision; used at `backbone/backbone.py:48`)."""

    features: int
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        w = scale * jax.lax.rsqrt(var + self.eps)
        b = bias - mean * w
        return (x * w.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cd = self.dtype or x.dtype
        out_ch = self.planes * 4

        def conv(y, feat, k, s, name):
            return nn.Conv(feat, (k, k), strides=(s, s),
                           padding=[(k // 2, k // 2)] * 2, use_bias=False,
                           dtype=cd, name=name)(y)

        identity = x
        y = conv(x, self.planes, 1, 1, "conv1")
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = jax.nn.relu(y)
        y = conv(y, self.planes, 3, self.stride, "conv2")
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = jax.nn.relu(y)
        y = conv(y, out_ch, 1, 1, "conv3")
        y = FrozenBatchNorm(out_ch, name="bn3")(y)
        if self.downsample:
            identity = conv(x, out_ch, 1, self.stride, "downsample_conv")
            identity = FrozenBatchNorm(out_ch, name="downsample_bn")(identity)
        return jax.nn.relu(y + identity)


class ResNet(nn.Module):
    """Returns [(feat NHWC, mask)] for out_indices (1,2,3) = layer2..4
    (channels 512/1024/2048)."""

    depths: Tuple[int, ...] = (3, 4, 6, 3)
    out_indices: Tuple[int, ...] = (1, 2, 3)
    dtype: Optional[jnp.dtype] = None

    @property
    def num_features(self) -> Tuple[int, ...]:
        return (256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, mask: jnp.ndarray, deterministic: bool = True):
        cd = self.dtype or pixels.dtype
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=cd, name="conv1")(pixels.astype(cd))
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = jax.nn.relu(x)
        # 3x3/2 max pool, pad 1
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = 64
        for stage, depth in enumerate(self.depths):
            stride = 1 if stage == 0 else 2
            for i in range(depth):
                x = Bottleneck(
                    planes=planes, stride=stride if i == 0 else 1,
                    downsample=(i == 0), dtype=cd,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            if stage in self.out_indices:
                lvl_mask = interpolate_mask_nearest(mask, x.shape[1], x.shape[2])
                outs.append((x, lvl_mask))
            planes *= 2
        return outs
