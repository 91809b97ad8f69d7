"""Combined-store fast path: both domains' stores packed into ONE HBM
array, the whole dual-stream batch fetched by ONE flat row gather that
feeds the model's frame stack directly (no entry concat/reshape).

Must be step-for-step equal to the two-store gather path (which is
itself pinned to the host path in test_device_store.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state, make_train_step
from ta3n_tpu.train.step import make_multi_train_step

SEG, FDIM, K = 3, 16, 4


def _setup(bn="none", ens="none"):
    src, tgt, _ = make_domain_pair(num_source=40, num_target=30, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5,
                      use_bn=bn, ens_DA=ens)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"),
                  ens_DA="MCD" if ens == "MCD" else "none")
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    return src, tgt, cfg, da, tc


def _pairs(src, tgt, k=K):
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test", seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test", seed=2)
    out = list(zip(ls.index_epoch(), lt.index_epoch()))[:k]
    return out


def _scalars(k=K):
    return [StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0.3),
                        np.float32(0), np.float32(0),
                        np.float32(0.1 / (1 + i))) for i in range(k)]


def _assert_state_equal(st_a, st_b):
    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_combined_step_matches_two_store():
    src, tgt, cfg, da, tc = _setup()
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    pairs, scalars = _pairs(src, tgt), _scalars()

    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    off = src.features.shape[0]
    combined = jnp.asarray(np.concatenate(
        [np.ascontiguousarray(src.features),
         np.ascontiguousarray(tgt.features)], axis=0))

    step2 = make_train_step(model, da, tc, gather_on_device=True)
    stepc = make_train_step(model, da, tc, gather_on_device=True,
                            combined_store_rows=off)

    st2 = create_train_state(model, rng, 8, 6, tc)
    stc = create_train_state(model, rng, 8, 6, tc)
    for (bs, bt), sc in zip(pairs, scalars):
        st2, m2 = step2(st2, store_s, bs.abs_indices, bs.labels, bs.mask,
                        store_t, bt.abs_indices, bt.labels, bt.mask, sc,
                        rng)
        stc, mc = stepc(stc, combined, bs.abs_indices, bs.labels, bs.mask,
                        bt.abs_indices, bt.labels, bt.mask, sc, rng)
        np.testing.assert_allclose(float(m2["loss"]), float(mc["loss"]),
                                   rtol=1e-6)
    _assert_state_equal(st2, stc)


def test_combined_step_matches_two_store_bn_mcd():
    """The BN (mutable batch_stats) and MCD (second reversed forward)
    branches also thread combined_rows."""
    src, tgt, cfg, da, tc = _setup(bn="AutoDIAL", ens="MCD")
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    pairs, scalars = _pairs(src, tgt, k=2), _scalars(2)

    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    off = src.features.shape[0]
    combined = jnp.concatenate([store_s, store_t], axis=0)

    step2 = make_train_step(model, da, tc, gather_on_device=True)
    stepc = make_train_step(model, da, tc, gather_on_device=True,
                            combined_store_rows=off)
    st2 = create_train_state(model, rng, 8, 6, tc)
    stc = create_train_state(model, rng, 8, 6, tc)
    for (bs, bt), sc in zip(pairs, scalars):
        st2, _ = step2(st2, store_s, bs.abs_indices, bs.labels, bs.mask,
                       store_t, bt.abs_indices, bt.labels, bt.mask, sc, rng)
        stc, _ = stepc(stc, combined, bs.abs_indices, bs.labels, bs.mask,
                       bt.abs_indices, bt.labels, bt.mask, sc, rng)
    _assert_state_equal(st2, stc)
    for a, b in zip(jax.tree_util.tree_leaves(st2.batch_stats),
                    jax.tree_util.tree_leaves(stc.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_combined_multi_step_matches_two_store_multi():
    src, tgt, cfg, da, tc = _setup()
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    pairs, scalars = _pairs(src, tgt), _scalars()

    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    off = src.features.shape[0]
    combined = jnp.concatenate([store_s, store_t], axis=0)

    idx_s = np.stack([b[0].abs_indices for b in pairs])
    ys = np.stack([b[0].labels for b in pairs])
    ms = np.stack([b[0].mask for b in pairs])
    idx_t = np.stack([b[1].abs_indices for b in pairs])
    yt = np.stack([b[1].labels for b in pairs])
    mt = np.stack([b[1].mask for b in pairs])
    sc = StepScalars(*(np.stack([getattr(s, f) for s in scalars])
                       for f in StepScalars._fields))

    step2 = make_multi_train_step(model, da, tc)
    stepc = make_multi_train_step(model, da, tc, combined_store_rows=off)

    st2 = create_train_state(model, rng, 8, 6, tc)
    stc = create_train_state(model, rng, 8, 6, tc)
    st2, m2 = step2(st2, store_s, idx_s, ys, ms, store_t, idx_t, yt, mt,
                    sc, rng)
    stc, mc = stepc(stc, combined, idx_s, ys, ms, idx_t, yt, mt, sc, rng)
    np.testing.assert_allclose(np.asarray(m2["loss"]),
                               np.asarray(mc["loss"]), rtol=1e-6)
    _assert_state_equal(st2, stc)


def test_combined_multi_step_mesh_matches_single_device():
    """Sharded combined-store K-step program == unsharded: the data-axis
    in_shardings of the combined signature are correct."""
    from ta3n_tpu.parallel import make_mesh
    src, tgt, cfg, da, tc = _setup()
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    # batch 16 (divisible by the 8-device mesh); tails padded + masked
    ls = TSNLoader(src, batch_size=16, num_segments=SEG, mode="test",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=16, num_segments=SEG, mode="test",
                   seed=2)
    pairs = list(zip(ls.index_epoch(), lt.index_epoch()))[:2]
    scalars = _scalars(len(pairs))

    off = src.features.shape[0]
    combined = jnp.concatenate(
        [jnp.asarray(np.ascontiguousarray(src.features)),
         jnp.asarray(np.ascontiguousarray(tgt.features))], axis=0)

    idx_s = np.stack([b[0].abs_indices for b in pairs])
    ys = np.stack([b[0].labels for b in pairs])
    ms = np.stack([b[0].mask for b in pairs])
    idx_t = np.stack([b[1].abs_indices for b in pairs])
    yt = np.stack([b[1].labels for b in pairs])
    mt = np.stack([b[1].mask for b in pairs])
    sc = StepScalars(*(np.stack([getattr(s, f) for s in scalars])
                       for f in StepScalars._fields))

    step1 = make_multi_train_step(model, da, tc, combined_store_rows=off)
    mesh = make_mesh()
    stepm = make_multi_train_step(model, da, tc, combined_store_rows=off,
                                  mesh=mesh)

    st1 = create_train_state(model, rng, 16, 16, tc)
    stm = create_train_state(model, rng, 16, 16, tc)
    st1, m1 = step1(st1, combined, idx_s, ys, ms, idx_t, yt, mt, sc, rng)
    stm, mm = stepm(stm, combined, idx_s, ys, ms, idx_t, yt, mt, sc, rng)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(mm["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(stm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
