"""Backbone feature extractors: numerical parity against torch functional
mirrors driven by the same (synthetic) torch-format state_dicts."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ta3n_tpu.models.backbones.c3d import (C3DFeatures, clips_from_frames,
                                           import_torch_c3d)
from ta3n_tpu.models.backbones.resnet import (RESNET_SPECS, ResNetFeatures,
                                              import_torch_resnet)

RNG = np.random.default_rng(0)


def rand(*shape, scale=0.1):
    return torch.from_numpy(
        RNG.normal(scale=scale, size=shape).astype(np.float32))


# ---------------- ResNet-18 ----------------

def build_resnet18_state():
    state = {}

    def add_conv(name, cout, cin, k):
        state[f"{name}.weight"] = rand(cout, cin, k, k)

    def add_bn(name, c):
        state[f"{name}.weight"] = rand(c) + 1.0
        state[f"{name}.bias"] = rand(c)
        state[f"{name}.running_mean"] = rand(c)
        state[f"{name}.running_var"] = rand(c).abs() + 1.0

    add_conv("conv1", 64, 3, 7)
    add_bn("bn1", 64)
    widths = [64, 128, 256, 512]
    in_ch = 64
    for li, (w, n_blocks) in enumerate(zip(widths, RESNET_SPECS[
            "resnet18"][1])):
        for b in range(n_blocks):
            src = f"layer{li + 1}.{b}"
            add_conv(f"{src}.conv1", w, in_ch if b == 0 else w, 3)
            add_bn(f"{src}.bn1", w)
            add_conv(f"{src}.conv2", w, w, 3)
            add_bn(f"{src}.bn2", w)
            if b == 0 and (li > 0):
                add_conv(f"{src}.downsample.0", w, in_ch, 1)
                add_bn(f"{src}.downsample.1", w)
        in_ch = w
    return state


def torch_resnet18_forward(state, x):
    def bn(h, p):
        return F.batch_norm(h, state[f"{p}.running_mean"],
                            state[f"{p}.running_var"],
                            state[f"{p}.weight"], state[f"{p}.bias"],
                            False, 0.0, 1e-5)

    h = F.conv2d(x, state["conv1.weight"], None, 2, 3)
    h = F.relu(bn(h, "bn1"))
    h = F.max_pool2d(h, 3, 2, 1)
    for li, n_blocks in enumerate(RESNET_SPECS["resnet18"][1]):
        for b in range(n_blocks):
            src = f"layer{li + 1}.{b}"
            stride = 2 if (li > 0 and b == 0) else 1
            out = F.relu(bn(F.conv2d(h, state[f"{src}.conv1.weight"],
                                     None, stride, 1), f"{src}.bn1"))
            out = bn(F.conv2d(out, state[f"{src}.conv2.weight"], None, 1,
                              1), f"{src}.bn2")
            if f"{src}.downsample.0.weight" in state:
                identity = bn(F.conv2d(h, state[f"{src}.downsample.0.weight"],
                                       None, stride, 0),
                              f"{src}.downsample.1")
            else:
                identity = h
            h = F.relu(out + identity)
    return h.mean(dim=(2, 3))


def test_resnet18_matches_torch_mirror():
    state = build_resnet18_state()
    x = RNG.normal(size=(1, 64, 64, 3)).astype(np.float32)
    want = torch_resnet18_forward(
        state, torch.from_numpy(x.transpose(0, 3, 1, 2)))
    params, stats = import_torch_resnet(state, "resnet18")
    model = ResNetFeatures(arch="resnet18")
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x))
    assert got.shape == (1, 512)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-3,
                               atol=1e-4)


# ---------------- C3D ----------------

def build_c3d_state():
    state = {}
    chans = [(3, 64, "conv1"), (64, 128, "conv2"), (128, 256, "conv3a"),
             (256, 256, "conv3b"), (256, 512, "conv4a"),
             (512, 512, "conv4b"), (512, 512, "conv5a"),
             (512, 512, "conv5b")]
    for cin, cout, name in chans:
        state[f"{name}.weight"] = rand(cout, cin, 3, 3, 3, scale=0.01)
        state[f"{name}.bias"] = rand(cout, scale=0.01)
    state["fc6.weight"] = rand(4096, 8192, scale=0.01)
    state["fc6.bias"] = rand(4096, scale=0.01)
    state["fc7.weight"] = rand(4096, 4096, scale=0.01)
    state["fc7.bias"] = rand(4096, scale=0.01)
    # extraction-irrelevant tail
    state["fc8.weight"] = rand(487, 4096, scale=0.01)
    state["fc8.bias"] = rand(487, scale=0.01)
    return state


def torch_c3d_extractor_forward(state, x, activations="none"):
    """Mirror of the reference extractor (video2feature.py:68-72,123-128):
    Sequential(children[:-6]) + Sequential(fc6, fc7) — no ReLUs unless
    activations='relu'."""
    act = F.relu if activations == "relu" else (lambda v: v)

    def conv(h, name):
        return act(F.conv3d(h, state[f"{name}.weight"],
                            state[f"{name}.bias"], 1, 1))

    h = conv(x, "conv1")
    h = F.max_pool3d(h, (1, 2, 2), (1, 2, 2))
    h = conv(h, "conv2")
    h = F.max_pool3d(h, 2, 2)
    h = conv(conv(h, "conv3a"), "conv3b")
    h = F.max_pool3d(h, 2, 2)
    h = conv(conv(h, "conv4a"), "conv4b")
    h = F.max_pool3d(h, 2, 2)
    h = conv(conv(h, "conv5a"), "conv5b")
    h = F.max_pool3d(h, 2, 2, padding=(0, 1, 1))
    h = h.reshape(h.shape[0], -1)
    h = act(F.linear(h, state["fc6.weight"], state["fc6.bias"]))
    h = act(F.linear(h, state["fc7.weight"], state["fc7.bias"]))
    return h


@pytest.mark.parametrize("activations", ["none", "relu"])
def test_c3d_matches_torch_mirror(activations):
    state = build_c3d_state()
    x = RNG.normal(scale=0.5, size=(1, 16, 112, 112, 3)).astype(np.float32)
    want = torch_c3d_extractor_forward(
        state, torch.from_numpy(x.transpose(0, 4, 1, 2, 3)), activations)
    params = import_torch_c3d(state)
    model = C3DFeatures(activations=activations)
    got = model.apply({"params": params}, jnp.asarray(x))
    assert got.shape == (1, 4096)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-3,
                               atol=2e-3)


def test_clips_from_frames():
    frames = np.arange(20)[:, None, None, None] * np.ones(
        (1, 4, 4, 3), np.float32)
    clips = clips_from_frames(frames)
    assert clips.shape == (5, 16, 4, 4, 3)
    np.testing.assert_allclose(clips[0, 0, 0, 0, 0], 0.0)
    np.testing.assert_allclose(clips[4, 15, 0, 0, 0], 19 * 255.0)
