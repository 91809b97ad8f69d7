"""Gradient accumulation: G micro-batches must equal one big batch
(mean-reduced losses, dropout off)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state, make_train_step
from ta3n_tpu.train.step import make_grad_accum_step

SEG, FDIM, B, G = 3, 16, 6, 2


def test_grad_accum_matches_big_batch():
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(B, B, B))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    g = np.random.default_rng(0)
    xs = g.normal(size=(G, B, SEG, FDIM)).astype(np.float32)
    xt = g.normal(size=(G, B, SEG, FDIM)).astype(np.float32)
    ys = g.integers(0, 3, size=(G, B)).astype(np.int32)
    yt = g.integers(0, 3, size=(G, B)).astype(np.int32)
    ones = np.ones((G, B), np.float32)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))

    # accumulated path
    st_a = create_train_state(model, rng, B, B, tc)
    accum = make_grad_accum_step(model, da, tc, accum_steps=G)
    st_a, m_a = accum(st_a, xs, ys, ones, xt, yt, ones, sc, rng)
    assert m_a["loss"].shape == (G,)

    # big-batch path (concat the micro-batches)
    st_b = create_train_state(model, rng, B, B, tc)
    step = make_train_step(model, da, tc)
    st_b, m_b = step(st_b, xs.reshape(G * B, SEG, FDIM),
                     ys.reshape(-1), ones.reshape(-1),
                     xt.reshape(G * B, SEG, FDIM), yt.reshape(-1),
                     ones.reshape(-1), sc, rng)

    for a, b in zip(jax.tree_util.tree_leaves(st_a.params),
                    jax.tree_util.tree_leaves(st_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                                   atol=1e-6)
    np.testing.assert_allclose(float(m_a["loss"].mean()),
                               float(m_b["loss"]), rtol=2e-4)


def test_grad_accum_sharded_matches_single_device():
    """Grad-accum over the 8-device mesh (micro-batches sharded on
    axis 1) == single device."""
    from ta3n_tpu.parallel import make_mesh

    B8 = 8  # divisible by the mesh
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(B8, B8, B8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    g = np.random.default_rng(0)
    xs = g.normal(size=(G, B8, SEG, FDIM)).astype(np.float32)
    xt = g.normal(size=(G, B8, SEG, FDIM)).astype(np.float32)
    ys = g.integers(0, 3, size=(G, B8)).astype(np.int32)
    yt = g.integers(0, 3, size=(G, B8)).astype(np.int32)
    ones = np.ones((G, B8), np.float32)
    sc = StepScalars(np.float32([0.5, 0.5, 0.5]), np.float32(0),
                     np.float32(0), np.float32(0), np.float32(0.1))

    st1 = create_train_state(model, rng, B8, B8, tc)
    accum1 = make_grad_accum_step(model, da, tc, accum_steps=G)
    st1, _ = accum1(st1, xs, ys, ones, xt, yt, ones, sc, rng)

    st8 = create_train_state(model, rng, B8, B8, tc)
    accum8 = make_grad_accum_step(model, da, tc, accum_steps=G,
                                  mesh=make_mesh())
    st8, _ = accum8(st8, xs, ys, ones, xt, yt, ones, sc, rng)

    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
