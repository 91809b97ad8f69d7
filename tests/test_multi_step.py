"""Multi-step-per-dispatch (lax.scan) equivalence with single steps,
plus a memmap-store native-gather check."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import (StepScalars, create_train_state,
                            make_train_step)
from ta3n_tpu.train.step import make_multi_train_step

SEG, FDIM, K = 3, 16, 4


def test_multi_step_matches_single_steps():
    src, tgt, _ = make_domain_pair(num_source=40, num_target=30, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    # K index batches from identical loader streams
    def batches(seed_s, seed_t):
        ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                       seed=seed_s)
        lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                       seed=seed_t)
        out = []
        for bs, bt in zip(ls.index_epoch(), lt.index_epoch()):
            out.append((bs, bt))
            if len(out) == K:
                return out
        return out

    pairs = batches(1, 2)
    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    scalars = [StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                           np.float32(0), np.float32(0),
                           np.float32(0.1 / (1 + i)))  # vary lr per step
               for i in range(K)]

    # --- single-step path ---
    step1 = make_train_step(model, da, tc, gather_on_device=True)
    st1 = create_train_state(model, rng, 8, 6, tc)
    losses1 = []
    for (bs, bt), sc in zip(pairs, scalars):
        st1, m = step1(st1, store_s, bs.abs_indices, bs.labels, bs.mask,
                       store_t, bt.abs_indices, bt.labels, bt.mask, sc,
                       rng)
        losses1.append(float(m["loss"]))

    # --- scanned path ---
    stepk = make_multi_train_step(model, da, tc)
    st2 = create_train_state(model, rng, 8, 6, tc)
    stack = lambda xs: np.stack(xs)
    idx_s = stack([b[0].abs_indices for b in pairs])
    ys = stack([b[0].labels for b in pairs])
    ms = stack([b[0].mask for b in pairs])
    idx_t = stack([b[1].abs_indices for b in pairs])
    yt = stack([b[1].labels for b in pairs])
    mt = stack([b[1].mask for b in pairs])
    sc_stacked = StepScalars(*(np.stack([getattr(s, f) for s in scalars])
                               for f in StepScalars._fields))
    st2, metrics = stepk(st2, store_s, idx_s, ys, ms, store_t, idx_t, yt,
                         mt, sc_stacked, rng)
    losses2 = [float(x) for x in metrics["loss"]]

    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_memmap_store_native_gather(tmp_path):
    from ta3n_tpu.data import FeatureStore
    from ta3n_tpu.data.native_gather import load_native
    src, _, _ = make_domain_pair(num_source=10, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    src.save(str(tmp_path / "s"))
    loaded = FeatureStore.load(str(tmp_path / "s"))  # memmap-backed
    assert isinstance(loaded.features, np.memmap)
    vids = np.array([0, 4, 9])
    frames = np.array([[0, 1], [2, 3], [0, 0]])
    got = loaded.gather(vids, frames)
    loaded.use_native_gather = False
    want = loaded.gather(vids, frames)
    np.testing.assert_allclose(got, want)
