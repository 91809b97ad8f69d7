"""Multi-device data-parallel tests on the 8-device virtual CPU mesh —
the TPU-pod analogue the reference never had (SURVEY §4, §5.8)."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.parallel import (batch_sharding, make_mesh, pad_to_multiple,
                               replicated_sharding, shard_train_step)
from ta3n_tpu.train import (StepScalars, create_train_state, make_train_step)

SEG, FDIM = 3, 16


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_pad_to_multiple():
    assert pad_to_multiple(74, 8) == 80
    assert pad_to_multiple(128, 8) == 128
    assert pad_to_multiple(1, 8) == 8


def _batch(rng, b, n_real, num_class):
    xs = rng.normal(size=(b, SEG, FDIM)).astype(np.float32)
    ys = rng.integers(0, num_class, size=b).astype(np.int32)
    mask = np.zeros(b, np.float32)
    mask[:n_real] = 1
    xs[n_real:] = 0
    return xs, ys, mask


def test_sharded_step_matches_single_device():
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, 16, 16, tc)
    step = make_train_step(model, da, tc)

    gen = np.random.default_rng(0)
    xs, ys, ms = _batch(gen, 16, 13, 4)
    xt, yt, mt = _batch(gen, 16, 11, 4)
    sc = StepScalars(jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.1))

    # single device result
    s_single, m_single = step(state, xs, ys, ms, xt, yt, mt, sc, rng)

    # sharded over the 8-device mesh
    mesh = make_mesh()
    state2 = create_train_state(model, rng, 16, 16, tc)
    sharded = shard_train_step(step, mesh)
    s_shard, m_shard = sharded(state2, xs, ys, ms, xt, yt, mt, sc, rng)

    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_shard["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_batch_actually_sharded():
    mesh = make_mesh()
    x = jnp.zeros((16, SEG, FDIM))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8
    r = jax.device_put(jnp.zeros(3), replicated_sharding(mesh))
    assert r.sharding.is_fully_replicated
