"""ResNet v1 feature extractors (18/34/50/101/152) in flax.

TPU-native replacement for the reference's torchvision backbone usage
(video2feature.py:81-88: torchvision model with the final fc popped, i.e.
features = global-average-pooled conv5 output).  Weights are imported from
a torchvision-format state_dict the user supplies (`import_torch_resnet`)
— this environment has no torchvision and no network, and extraction runs
jitted on TPU rather than through cuDNN.

Inference-only: BN uses imported running statistics (extraction runs in
eval mode, video2feature.py:76,88).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["ResNetFeatures", "import_torch_resnet", "resnet_feature_dim",
           "RESNET_SPECS"]

# (block type, layer counts); torchvision resnet definitions
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
}


def resnet_feature_dim(arch: str) -> int:
    block, _ = RESNET_SPECS[arch]
    return 512 if block == "basic" else 2048


class _BN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,)))
        inv = jax.lax.rsqrt(var.value + 1e-5)
        return (x - mean.value) * inv * scale + bias


def _conv(features, kernel, strides=1, name=None):
    return nn.Conv(features, (kernel, kernel), strides=(strides, strides),
                   padding=[(kernel // 2,) * 2] * 2, use_bias=False,
                   name=name)


class _BasicBlock(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _conv(self.features, 3, self.strides, name="conv1")(x)
        out = _BN(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.features, 3, 1, name="conv2")(out)
        out = _BN(self.features, name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="ds_conv")(x)
            identity = _BN(self.features, name="ds_bn")(identity)
        return nn.relu(out + identity)


class _Bottleneck(nn.Module):
    features: int           # bottleneck width; output is 4*features
    strides: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      name="conv1")(x)
        out = nn.relu(_BN(self.features, name="bn1")(out))
        out = _conv(self.features, 3, self.strides, name="conv2")(out)
        out = nn.relu(_BN(self.features, name="bn2")(out))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = _BN(self.features * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.strides, self.strides),
                               use_bias=False, name="ds_conv")(x)
            identity = _BN(self.features * 4, name="ds_bn")(identity)
        return nn.relu(out + identity)


class ResNetFeatures(nn.Module):
    """NHWC in [B, 224, 224, 3] -> [B, feature_dim] pooled features."""

    arch: str = "resnet101"

    @nn.compact
    def __call__(self, x):
        block_type, counts = RESNET_SPECS[self.arch]
        block = _BasicBlock if block_type == "basic" else _Bottleneck
        expansion = 1 if block_type == "basic" else 4

        out = nn.Conv(64, (7, 7), strides=(2, 2),
                      padding=[(3, 3), (3, 3)], use_bias=False,
                      name="conv1")(x)
        out = nn.relu(_BN(64, name="bn1")(out))
        out = nn.max_pool(out, (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])

        width = 64
        in_ch = 64
        for layer_id, n_blocks in enumerate(counts):
            strides = 1 if layer_id == 0 else 2
            for b in range(n_blocks):
                s = strides if b == 0 else 1
                ds = (b == 0 and (s != 1 or in_ch != width * expansion))
                out = block(width, s, ds,
                            name=f"layer{layer_id + 1}_{b}")(out)
                in_ch = width * expansion
            width *= 2
        return jnp.mean(out, axis=(1, 2))


def _t(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def import_torch_resnet(state: Dict[str, Any], arch: str
                        ) -> Tuple[Dict, Dict]:
    """torchvision resnet state_dict -> (params, batch_stats)."""
    block_type, counts = RESNET_SPECS[arch]
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(src, dst_parent, dst_name):
        w = _t(state[f"{src}.weight"])  # [out,in,kh,kw]
        dst_parent.setdefault(dst_name, {})["kernel"] = \
            w.transpose(2, 3, 1, 0)

    def bn(src, pp, sp, dst_name):
        pp[dst_name] = {"scale": _t(state[f"{src}.weight"]),
                        "bias": _t(state[f"{src}.bias"])}
        sp[dst_name] = {"mean": _t(state[f"{src}.running_mean"]),
                        "var": _t(state[f"{src}.running_var"])}

    conv("conv1", params, "conv1")
    bn("bn1", params, stats, "bn1")

    n_convs = 2 if block_type == "basic" else 3
    for layer_id, n_blocks in enumerate(counts):
        for b in range(n_blocks):
            src = f"layer{layer_id + 1}.{b}"
            name = f"layer{layer_id + 1}_{b}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for c in range(1, n_convs + 1):
                conv(f"{src}.conv{c}", bp, f"conv{c}")
                bn(f"{src}.bn{c}", bp, bs, f"bn{c}")
            if f"{src}.downsample.0.weight" in state:
                conv(f"{src}.downsample.0", bp, "ds_conv")
                bn(f"{src}.downsample.1", bp, bs, "ds_bn")
            params[name] = bp
            stats[name] = bs
    return params, stats
