"""C3D feature extractor in flax (3-D convs compile to TPU via XLA).

Parity target: the reference extraction path
(dataset_preparation/video2feature.py:62-78,119-143 over
dataset_preparation/C3D_model.py): 16-frame sliding clips at 112x112,
inputs scaled x255, conv stack -> flatten 8192 -> fc6 -> fc7.

QUIRK (replicated by default, `activations='none'`): the reference builds
its extractor as `nn.Sequential(*list(model.children())[:-6])` + fc6/fc7 —
the shared `self.relu` child is NOT in those slices, so the published
features come from a conv stack and fc layers with **no nonlinearities**
(video2feature.py:68-72).  `activations='relu'` gives the intended C3D.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["C3DFeatures", "import_torch_c3d", "C3D_CLIP_SIZE"]

C3D_CLIP_SIZE = 16

_CONVS = [("conv1", 64), ("conv2", 128), ("conv3a", 256), ("conv3b", 256),
          ("conv4a", 512), ("conv4b", 512), ("conv5a", 512),
          ("conv5b", 512)]


class C3DFeatures(nn.Module):
    """[B, 16, 112, 112, 3] clips -> [B, 4096] fc7 features."""

    activations: str = "none"   # 'none' (reference quirk) | 'relu'

    @nn.compact
    def __call__(self, x):
        act = nn.relu if self.activations == "relu" else (lambda v: v)

        def conv(name, feats, h):
            c = nn.Conv(feats, (3, 3, 3), padding=[(1, 1)] * 3,
                        name=name)(h)
            return act(c)

        def pool(h, t_stride, pad_hw=0):
            window = (t_stride, 2, 2)
            padding = [(0, 0), (pad_hw, pad_hw), (pad_hw, pad_hw)]
            return nn.max_pool(h, window, strides=window, padding=padding)

        h = conv("conv1", 64, x)
        h = pool(h, 1)
        h = conv("conv2", 128, h)
        h = pool(h, 2)
        h = conv("conv3a", 256, h)
        h = conv("conv3b", 256, h)
        h = pool(h, 2)
        h = conv("conv4a", 512, h)
        h = conv("conv4b", 512, h)
        h = pool(h, 2)
        h = conv("conv5a", 512, h)
        h = conv("conv5b", 512, h)
        h = pool(h, 2, pad_hw=1)
        # torch flattens channels-first [C,T,H,W] (C3D_model.py:61)
        b = h.shape[0]
        h = jnp.transpose(h, (0, 4, 1, 2, 3)).reshape(b, -1)  # [B, 8192]
        h = act(nn.Dense(4096, name="fc6")(h))
        h = act(nn.Dense(4096, name="fc7")(h))
        return h


def _t(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def import_torch_c3d(state: Dict[str, Any]) -> Dict[str, Any]:
    """Reference C3D state_dict -> flax params (conv + fc6/fc7; fc8 and
    the classifier tail are extraction-irrelevant and dropped)."""
    params: Dict[str, Any] = {}
    for name, _ in _CONVS:
        w = _t(state[f"{name}.weight"])      # [out,in,kt,kh,kw]
        params[name] = {"kernel": w.transpose(2, 3, 4, 1, 0),
                        "bias": _t(state[f"{name}.bias"])}
    for name in ("fc6", "fc7"):
        params[name] = {"kernel": _t(state[f"{name}.weight"]).T,
                        "bias": _t(state[f"{name}.bias"])}
    return params


def clips_from_frames(frames: np.ndarray) -> np.ndarray:
    """[T, 112, 112, 3] frames -> [T-15, 16, 112, 112, 3] sliding clips,
    scaled x255 (video2feature.py:135-143)."""
    t = frames.shape[0]
    n = t - C3D_CLIP_SIZE + 1
    if n <= 0:
        raise ValueError(f"need >= {C3D_CLIP_SIZE} frames, got {t}")
    idx = np.arange(C3D_CLIP_SIZE)[None, :] + np.arange(n)[:, None]
    return frames[idx] * 255.0
