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


def test_shard_train_step_shardings_are_compiled_in():
    """The sharded step carries in_shardings in the compiled program
    (VERDICT r1 #3): a batch committed to a single device must be
    REJECTED, not silently device_put per call."""
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 8, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, 8, 8, tc)
    mesh = make_mesh()
    step = shard_train_step(make_train_step(model, da, tc), mesh)

    gen = np.random.default_rng(0)
    xs, ys, ms = _batch(gen, 8, 8, 4)
    xt, yt, mt = _batch(gen, 8, 8, 4)
    sc = StepScalars(jnp.zeros(3), jnp.asarray(0.0), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.1))
    xs_committed = jax.device_put(jnp.asarray(xs), jax.devices()[0])
    with np.testing.assert_raises(ValueError):
        step(state, xs_committed, ys, ms, xt, yt, mt, sc, rng)
    # numpy inputs are placed by the jit itself and run fine
    new_state, m = step(state, xs, ys, ms, xt, yt, mt, sc, rng)
    assert np.isfinite(float(m["loss"]))
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert leaf.sharding.is_fully_replicated


def test_device_store_multi_step_sharded_matches_single_device():
    """Flagship production mode (device store + K steps/dispatch) on the
    8-device mesh == single device, parameter-exact (VERDICT r1 #2)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ta3n_tpu.data import TSNLoader
    from ta3n_tpu.data.synthetic import make_domain_pair
    from ta3n_tpu.train.step import make_multi_train_step

    K = 3
    src, tgt, _ = make_domain_pair(num_source=48, num_target=44, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    def batches():
        # pad_to=16 keeps masked rows in play (8-device divisibility)
        ls = TSNLoader(src, batch_size=16, num_segments=SEG, mode="test",
                       seed=1)
        lt = TSNLoader(tgt, batch_size=16, num_segments=SEG, mode="test",
                       seed=2)
        return list(zip(ls.index_epoch(), lt.index_epoch()))[:K]

    pairs = batches()
    store_s = np.ascontiguousarray(src.features)
    store_t = np.ascontiguousarray(tgt.features)
    stack = lambda f, i: np.stack([f(b[i]) for b in pairs])
    idx_s = stack(lambda b: b.abs_indices, 0)
    ys = stack(lambda b: b.labels, 0)
    ms = stack(lambda b: b.mask, 0)
    idx_t = stack(lambda b: b.abs_indices, 1)
    yt = stack(lambda b: b.labels, 1)
    mt = stack(lambda b: b.mask, 1)
    sc = StepScalars(
        np.tile(np.float32([0.5, 0.5, 0.5]), (K, 1)),
        np.zeros(K, np.float32), np.zeros(K, np.float32),
        np.zeros(K, np.float32), np.full(K, 0.1, np.float32))

    # single-device reference
    step1 = make_multi_train_step(model, da, tc)
    st1 = create_train_state(model, rng, 16, 16, tc)
    st1, m1 = step1(st1, store_s, idx_s, ys, ms, store_t, idx_t, yt, mt,
                    sc, rng)

    # sharded over the 8-device mesh
    mesh = make_mesh()
    stepm = make_multi_train_step(model, da, tc, mesh=mesh)
    st2 = create_train_state(model, rng, 16, 16, tc)
    # per-device addressable shards of the stacked batches are B/8
    kdata = NamedSharding(mesh, P(None, "data"))
    idx_s_sh = jax.device_put(idx_s, kdata)
    assert all(s.data.shape == (K, 16 // 8, idx_s.shape[2])
               for s in idx_s_sh.addressable_shards)
    st2, m2 = stepm(st2, store_s, idx_s_sh, ys, ms, store_t, idx_t, yt,
                    mt, sc, rng)

    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_eval_step_sharded_matches_single_device():
    from ta3n_tpu.train import make_eval_step

    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, 16, 16, tc)
    gen = np.random.default_rng(0)
    x, y, m = _batch(gen, 16, 13, 4)

    ev1 = make_eval_step(model)
    r1 = jax.device_get(ev1(state.params, state.batch_stats, x, y, m))
    ev8 = make_eval_step(model, mesh=make_mesh())
    r8 = jax.device_get(ev8(state.params, state.batch_stats, x, y, m))
    for k in ("loss", "top1", "top5", "n"):
        np.testing.assert_allclose(r1[k], r8[k], rtol=1e-4)
    np.testing.assert_allclose(r1["logits"], r8["logits"], rtol=1e-4,
                               atol=1e-5)


def test_adabn_batch_stats_sharded_matches_single_device():
    """BN under data parallelism is the classic pitfall (per-replica
    moments vs global); with in_shardings XLA reduces moments over the
    FULL logical batch, so sharded == single-device batch_stats."""
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="avgpool", use_attn="none",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0,
                      use_bn="AdaBN")
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    xs, ys, ms = _batch(gen, 16, 13, 4)
    xt, yt, mt = _batch(gen, 16, 11, 4)
    sc = StepScalars(jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.1))

    st1 = create_train_state(model, rng, 16, 16, tc)
    step1 = make_train_step(model, da, tc)
    st1, _ = step1(st1, xs, ys, ms, xt, yt, mt, sc, rng)

    st8 = create_train_state(model, rng, 16, 16, tc)
    step8 = make_train_step(model, da, tc, mesh=make_mesh())
    st8, _ = step8(st8, xs, ys, ms, xt, yt, mt, sc, rng)

    for a, b in zip(jax.tree_util.tree_leaves(st1.batch_stats),
                    jax.tree_util.tree_leaves(st8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_tensor_parallel_step_matches_single_device(monkeypatch):
    """(4 data x 2 model) mesh: large dense kernels column-sharded over
    the 'model' axis must reproduce the single-device update exactly —
    tensor parallelism beyond the reference's DataParallel (SURVEY
    §2.9).  The TP size threshold is lowered so the tiny test model's
    [16,16] kernels shard."""
    import ta3n_tpu.train.step as step_mod
    from ta3n_tpu.parallel import make_mesh_2d
    monkeypatch.setattr(step_mod, "_TP_MIN_SIZE", 16)

    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    gen = np.random.default_rng(0)
    xs, ys, ms = _batch(gen, 16, 13, 4)
    xt, yt, mt = _batch(gen, 16, 11, 4)
    sc = StepScalars(jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.0),
                     jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0.1))

    state = create_train_state(model, rng, 16, 16, tc)
    step = make_train_step(model, da, tc)
    s_single = state
    for _ in range(3):
        s_single, m_single = step(s_single, xs, ys, ms, xt, yt, mt, sc,
                                  rng)

    mesh = make_mesh_2d(model_parallel=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    state2 = create_train_state(model, rng, 16, 16, tc)
    state2 = jax.device_put(state2, replicated_sharding(mesh))
    step_tp = make_train_step(model, da, tc, mesh=mesh)
    s_tp = state2
    for _ in range(3):
        s_tp, m_tp = step_tp(s_tp, xs, ys, ms, xt, yt, mt, sc, rng)

    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_tp["loss"]), rtol=1e-5)
    # the big kernels really are sharded over 'model'
    from jax.sharding import PartitionSpec as P
    sharded = [p for p, v in
               jax.tree_util.tree_leaves_with_path(s_tp.params)
               if getattr(v, "ndim", 0) == 2
               and v.sharding.spec == P(None, "model")]
    assert sharded, "no kernel was tensor-sharded"
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_tensor_parallel_multi_step_device_store(monkeypatch):
    """TP through the K-step device-store production path."""
    import ta3n_tpu.train.step as step_mod
    from ta3n_tpu.parallel import make_mesh_2d
    from ta3n_tpu.train.step import make_multi_train_step
    monkeypatch.setattr(step_mod, "_TP_MIN_SIZE", 16)

    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(16, 16, 16))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    K = 2
    gen = np.random.default_rng(0)
    store_s = jnp.asarray(gen.normal(size=(64, FDIM)).astype(np.float32))
    store_t = jnp.asarray(gen.normal(size=(48, FDIM)).astype(np.float32))
    idx_s = gen.integers(0, 64, size=(K, 16, SEG)).astype(np.int32)
    idx_t = gen.integers(0, 48, size=(K, 16, SEG)).astype(np.int32)
    ys = gen.integers(0, 4, size=(K, 16)).astype(np.int32)
    yt = gen.integers(0, 4, size=(K, 16)).astype(np.int32)
    ms = np.ones((K, 16), np.float32)
    mt = np.ones((K, 16), np.float32)
    sc = StepScalars(np.tile(np.float32([0.5, 0.5, 0.5]), (K, 1)),
                     np.zeros(K, np.float32), np.zeros(K, np.float32),
                     np.zeros(K, np.float32), np.full(K, 0.1, np.float32))

    state = create_train_state(model, rng, 16, 16, tc)
    plain = make_multi_train_step(model, da, tc)
    s1, m1 = plain(state, store_s, idx_s, ys, ms, store_t, idx_t, yt, mt,
                   sc, rng)

    mesh = make_mesh_2d(model_parallel=2)
    state2 = create_train_state(model, rng, 16, 16, tc)
    state2 = jax.device_put(state2, replicated_sharding(mesh))
    tp = make_multi_train_step(model, da, tc, mesh=mesh)
    s2, m2 = tp(state2, store_s, idx_s, ys, ms, store_t, idx_t, yt, mt,
                sc, rng)

    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
