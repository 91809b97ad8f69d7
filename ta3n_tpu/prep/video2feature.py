"""Offline feature extraction: videos/frames -> packed FeatureStore.

TPU-native rebuild of `dataset_preparation/video2feature.py`: imageio/cv2
decode and numpy preprocessing on the host, the CNN forward jitted on the
accelerator (XLA), and output written as resumable per-video shards that
`--finalize` packs into one FeatureStore — instead of one torch.save per
frame (video2feature.py:206-217).

Backbones are our flax implementations with torch-format weights supplied
via --pretrain_weight (this is an offline tool; no download side effects —
the reference implicitly downloads torchvision weights at import).

Usage:
    python -m ta3n_tpu.prep.video2feature --data_path D/ --video_in RGB \
        --base_model resnet101 --pretrain_weight resnet101.pth
    python -m ta3n_tpu.prep.video2feature --finalize D/RGB-feature_resnet101
"""

from __future__ import annotations

import argparse
import os
from typing import Callable, List

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_frames(frames: np.ndarray, size: int,
                      normalize: bool) -> np.ndarray:
    """Resize shorter side to `size`, center-crop, scale to [0,1],
    optionally ImageNet-normalize (video2feature.py:93-105)."""
    import cv2
    out = np.empty((frames.shape[0], size, size, 3), np.float32)
    for i, im in enumerate(frames):
        h, w = im.shape[:2]
        scale = size / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        im = cv2.resize(im, (nw, nh), interpolation=cv2.INTER_LINEAR)
        top, left = (nh - size) // 2, (nw - size) // 2
        out[i] = im[top:top + size, left:left + size].astype(np.float32) \
            / 255.0
    if normalize:
        out = (out - IMAGENET_MEAN) / IMAGENET_STD
    return out


def decode_video(path: str) -> np.ndarray:
    """Decode all frames (video2feature.py:156-166)."""
    import imageio
    reader = imageio.get_reader(path)
    frames = []
    try:
        for im in reader:
            if np.sum(im.shape) != 0:
                if im.ndim == 2:
                    im = np.stack([im] * 3, axis=-1)
                frames.append(im[..., :3])
    except (RuntimeError, StopIteration):
        pass
    reader.close()
    return np.stack(frames) if frames else np.zeros((0, 1, 1, 3), np.uint8)


def read_frame_dir(path: str) -> np.ndarray:
    import imageio
    files = sorted(os.listdir(path))
    frames = []
    for f in files:
        im = imageio.imread(os.path.join(path, f))
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        frames.append(im[..., :3])
    return np.stack(frames) if frames else np.zeros((0, 1, 1, 3), np.uint8)


def make_extractor(base_model: str, pretrain_weight: str,
                   batch_size: int, c3d_activations: str = "none"
                   ) -> Callable[[np.ndarray], np.ndarray]:
    """Build the jitted batched feature function."""
    import jax
    import jax.numpy as jnp
    import torch

    if base_model == "c3d":
        from ta3n_tpu.models.backbones.c3d import (C3DFeatures,
                                                   import_torch_c3d)
        state = torch.load(pretrain_weight, map_location="cpu",
                           weights_only=True)
        params = import_torch_c3d(state)
        model = C3DFeatures(activations=c3d_activations)
        fwd = jax.jit(lambda p, x: model.apply({"params": p}, x))

        def run(batch):  # [N, 16, 112, 112, 3]
            return np.asarray(fwd(params, jnp.asarray(batch)))
        return run

    from ta3n_tpu.models.backbones.resnet import (ResNetFeatures,
                                                  import_torch_resnet)
    state = torch.load(pretrain_weight, map_location="cpu",
                       weights_only=True)
    params, stats = import_torch_resnet(state, base_model)
    model = ResNetFeatures(arch=base_model)
    fwd = jax.jit(lambda p, s, x: model.apply(
        {"params": p, "batch_stats": s}, x))

    def run(batch):  # [N, 224, 224, 3]
        return np.asarray(fwd(params, stats, jnp.asarray(batch)))
    return run


def extract_batched(inputs: np.ndarray, run, batch_size: int) -> np.ndarray:
    """Static-shape batching with zero padding (video2feature.py:182-203)."""
    n = inputs.shape[0]
    feats: List[np.ndarray] = []
    for t in range(0, n, batch_size):
        chunk = inputs[t:t + batch_size]
        if chunk.shape[0] < batch_size:
            pad = np.zeros((batch_size - chunk.shape[0],)
                           + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        feats.append(run(chunk))
    return np.concatenate(feats)[:n]


def finalize(shard_root: str) -> None:
    """Pack per-video shards into one FeatureStore."""
    from ta3n_tpu.data import FeatureStore
    shard_dir = os.path.join(shard_root, "shards")
    feats, paths, labels = [], [], []
    for cls_id, cls in enumerate(sorted(os.listdir(shard_dir))):
        cdir = os.path.join(shard_dir, cls)
        for v in sorted(os.listdir(cdir)):
            feats.append(np.load(os.path.join(cdir, v)))
            paths.append(f"{cls}/{os.path.splitext(v)[0]}")
            labels.append(cls_id)
    store = FeatureStore.from_arrays(feats, paths, labels)
    store.save(shard_root)
    print(f"packed {store.num_videos} videos / {store.offsets[-1]} frames "
          f"(dim {store.feature_dim}) -> {shard_root}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Dataset Preparation")
    p.add_argument('--data_path', type=str, default='')
    p.add_argument('--video_in', type=str, default='RGB')
    p.add_argument('--feature_in', type=str, default='RGB-feature')
    p.add_argument('--input_type', type=str, default='video',
                   choices=['video', 'frames'])
    p.add_argument('--base_model', type=str, default='resnet101',
                   choices=['resnet18', 'resnet34', 'resnet50', 'resnet101',
                            'resnet152', 'c3d'])
    p.add_argument('--pretrain_weight', type=str, default='',
                   help='torch-format state_dict (.pth) for the backbone')
    p.add_argument('--batch_size', type=int, default=32)
    p.add_argument('--start_class', type=int, default=1)
    p.add_argument('--end_class', type=int, default=-1)
    p.add_argument('--class_file', type=str, default='none')
    p.add_argument('--c3d_activations', type=str, default='none',
                   choices=['none', 'relu'],
                   help="'none' replicates the reference extractor's "
                        "missing-ReLU quirk (video2feature.py:68-72)")
    p.add_argument('--finalize', type=str, default=None,
                   help='pack the shards under this output root and exit')
    args = p.parse_args(argv)

    if args.finalize:
        finalize(args.finalize)
        return

    if not args.pretrain_weight:
        raise SystemExit(
            "--pretrain_weight is required: supply a torch-format "
            "state_dict for the backbone (this tool never downloads)")

    path_input = os.path.join(args.data_path, args.video_in)
    out_root = os.path.join(args.data_path,
                            f"{args.feature_in}_{args.base_model}")
    size = 112 if args.base_model == "c3d" else 224
    normalize = args.base_model != "c3d"

    run = make_extractor(args.base_model, args.pretrain_weight,
                         args.batch_size, args.c3d_activations)

    classes = sorted(os.listdir(path_input))
    if args.class_file != 'none':
        keep = {line.strip().split(' ', 1)[1]
                for line in open(args.class_file)}
        classes = [c for c in classes if c in keep]
    lo = args.start_class - 1
    hi = len(classes) if args.end_class <= 0 else args.end_class
    for cls in classes[lo:hi]:
        cdir = os.path.join(path_input, cls)
        out_dir = os.path.join(out_root, "shards", cls)
        os.makedirs(out_dir, exist_ok=True)
        for video in sorted(os.listdir(cdir)):
            name = os.path.splitext(video)[0]
            out_file = os.path.join(out_dir, name + ".npy")
            if os.path.exists(out_file):  # resumable (video2feature.py:184)
                continue
            vpath = os.path.join(cdir, video)
            frames = decode_video(vpath) if args.input_type == 'video' \
                else read_frame_dir(vpath)
            if frames.shape[0] == 0:
                print(f"!! no frames decoded: {vpath}")
                continue
            pre = preprocess_frames(frames, size, normalize)
            if args.base_model == "c3d":
                from ta3n_tpu.models.backbones.c3d import (C3D_CLIP_SIZE,
                                                           clips_from_frames)
                if pre.shape[0] < C3D_CLIP_SIZE:
                    print(f"!! too short for C3D: {vpath}")
                    continue
                inputs = clips_from_frames(pre)
            else:
                inputs = pre
            feats = extract_batched(inputs, run, args.batch_size)
            np.save(out_file, feats.astype(np.float32))
            print(f"{cls}/{name}: {feats.shape}")
    print(f"done; run --finalize {out_root} to pack the store")


if __name__ == "__main__":
    main()
