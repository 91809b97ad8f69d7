"""Device-side index pipeline (data/device_sampler.py).

Deterministic modes must reproduce the host loader's index batches
bitwise; shuffled epochs must cover every record exactly once; the
sampled K-step program must produce the same training result as the
host-stacked multi-step when both consume identical batches.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import TSNLoader
from ta3n_tpu.data.device_sampler import DeviceSampler
from ta3n_tpu.data.synthetic import make_domain_pair
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state
from ta3n_tpu.train.loop import Trainer
from ta3n_tpu.train.step import (make_multi_train_step,
                                 make_sampled_multi_step)

SEG, FDIM = 3, 16


def _loader(store, bs, mode="test", shuffle=False, seed=1, pad_to=None):
    return TSNLoader(store, batch_size=bs, num_segments=SEG, mode=mode,
                     shuffle=shuffle, seed=seed, pad_to=pad_to)


def test_deterministic_modes_match_host_bitwise():
    src, _, _ = make_domain_pair(num_source=23, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    for mode in ("test", "val"):
        host = _loader(src, bs=6, mode=mode)
        dev = DeviceSampler(_loader(src, bs=6, mode=mode), seed=0)
        for step, hb in enumerate(host.index_epoch()):
            idx, lab, mask = jax.jit(dev.batch)(jnp.asarray(step))
            np.testing.assert_array_equal(np.asarray(idx), hb.abs_indices,
                                          err_msg=f"{mode} step {step}")
            np.testing.assert_array_equal(np.asarray(lab), hb.labels)
            np.testing.assert_array_equal(np.asarray(mask), hb.mask)


def test_deterministic_parity_seg7_float64_rounding_cases():
    """Regression: at S=7 the float64 central formula lands just below
    exact-integer boundaries for some num_frames (e.g. nf=12: host frame
    5 vs exact-math 6); the device sampler must match the HOST."""
    from ta3n_tpu.data.feature_store import FeatureStore
    rng = np.random.default_rng(3)
    feats, paths, labels = [], [], []
    for v, n in enumerate(list(range(8, 40)) + [12, 19, 26]):
        feats.append(rng.normal(size=(n, 8)).astype(np.float32))
        paths.append(f"v{v}")
        labels.append(int(rng.integers(0, 2)))
    store = FeatureStore.from_arrays(feats, paths, labels)
    for mode in ("test", "val"):
        host = TSNLoader(store, batch_size=5, num_segments=7, mode=mode,
                         shuffle=False)
        dev = DeviceSampler(TSNLoader(store, batch_size=5, num_segments=7,
                                      mode=mode, shuffle=False), seed=0)
        for step, hb in enumerate(host.index_epoch()):
            idx, _, _ = dev.batch(jnp.asarray(step))
            np.testing.assert_array_equal(np.asarray(idx), hb.abs_indices,
                                          err_msg=f"{mode} step {step}")


def test_pad_to_rows_masked_like_host():
    src, _, _ = make_domain_pair(num_source=10, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    host = _loader(src, bs=4, pad_to=8)
    dev = DeviceSampler(_loader(src, bs=4, pad_to=8), seed=0)
    for step, hb in enumerate(host.index_epoch()):
        idx, lab, mask = dev.batch(jnp.asarray(step))
        np.testing.assert_array_equal(np.asarray(mask), hb.mask)
        np.testing.assert_array_equal(np.asarray(idx), hb.abs_indices)


def test_shuffled_epoch_covers_every_record_once():
    src, _, _ = make_domain_pair(num_source=21, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    dev = DeviceSampler(_loader(src, bs=6, shuffle=True), seed=3)
    for epoch in range(2):
        seen = []
        for i in range(dev.steps_per_epoch):
            step = epoch * dev.steps_per_epoch + i
            idx, lab, mask = dev.batch(jnp.asarray(step))
            m = np.asarray(mask) > 0
            # recover record ids from the row offsets
            offs = np.asarray(dev.offsets)
            rec = np.searchsorted(offs, np.asarray(idx)[m][:, 0],
                                  side="right") - 1
            seen.extend(rec.tolist())
        assert sorted(seen) == list(range(21)), f"epoch {epoch}"


def test_random_mode_bounds_and_alignment():
    src, _, _ = make_domain_pair(num_source=16, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    loader = _loader(src, bs=16, mode="random", shuffle=False)
    dev = DeviceSampler(loader, seed=5)
    nf = np.asarray(dev.num_frames)
    offs = np.asarray(dev.offsets)
    idx, _, mask = dev.batch(jnp.asarray(0))
    local = np.asarray(idx) - offs[:, None]
    avg = nf // SEG
    for v in range(16):
        assert (local[v] >= 0).all() and (local[v] < nf[v]).all()
        if avg[v] > 0:  # chunk-aligned: segment s in [s*avg, (s+1)*avg)
            chunk = local[v] // avg[v]
            np.testing.assert_array_equal(chunk, np.arange(SEG))


def test_flow_new_length_parity_with_host():
    """Flow-style 2-stream store + new_length=5: the device sampler's
    index batches and the gathered rows must match the host path."""
    import jax.numpy as jnp
    from ta3n_tpu.data.feature_store import FeatureStore
    from ta3n_tpu.train.step import device_gather
    rng = np.random.default_rng(7)
    feats, paths, labels = [], [], []
    for v in range(9):
        n = int(rng.integers(6, 30))
        feats.append(rng.normal(size=(n, 2, 8)).astype(np.float32))
        paths.append(f"v{v}")
        labels.append(int(rng.integers(0, 3)))
    store = FeatureStore.from_arrays(feats, paths, labels)

    host = TSNLoader(store, batch_size=4, num_segments=SEG, new_length=5,
                     mode="test", shuffle=False)
    dev = DeviceSampler(TSNLoader(store, batch_size=4, num_segments=SEG,
                                  new_length=5, mode="test",
                                  shuffle=False), seed=0)
    dev_store = jnp.asarray(store.features)
    for step, hb in enumerate(host.epoch()):
        idx, lab, mask = dev.batch(jnp.asarray(step))
        x = device_gather(dev_store, idx)
        x = np.asarray(x) * np.asarray(mask)[:, None, None]
        np.testing.assert_allclose(x, hb.features, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(lab), hb.labels)


def test_sampled_multi_step_matches_host_stacked():
    src, tgt, _ = make_domain_pair(num_source=24, num_target=18, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.5, dropout_v=0.5)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 6, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    K = 3

    ls = _loader(src, bs=8)
    lt = _loader(tgt, bs=6)
    samp_s = DeviceSampler(_loader(src, bs=8), seed=0)
    samp_t = DeviceSampler(_loader(tgt, bs=6), seed=0)
    spe = min(len(ls), len(lt))
    samp_s.steps_per_epoch = spe
    samp_t.steps_per_epoch = spe

    host_step = make_multi_train_step(model, da, tc)
    dev_step = make_sampled_multi_step(model, da, tc, samp_s, samp_t)

    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    bs_list = list(ls.index_epoch())[:K]
    bt_list = list(lt.index_epoch())[:K]
    sc = StepScalars(np.tile(np.float32([0.5, 0.5, 0.5]), (K, 1)),
                     np.zeros(K, np.float32), np.zeros(K, np.float32),
                     np.zeros(K, np.float32), np.full(K, 0.1, np.float32))

    st_h = create_train_state(model, rng, 8, 6, tc)
    st_h, m_h = host_step(
        st_h, store_s, np.stack([b.abs_indices for b in bs_list]),
        np.stack([b.labels for b in bs_list]),
        np.stack([b.mask for b in bs_list]),
        store_t, np.stack([b.abs_indices for b in bt_list]),
        np.stack([b.labels for b in bt_list]),
        np.stack([b.mask for b in bt_list]), sc, rng)

    st_d = create_train_state(model, rng, 8, 6, tc)
    st_d, m_d = dev_step(st_d, store_s, store_t, sc, rng)

    np.testing.assert_allclose(np.asarray(m_h["loss"]),
                               np.asarray(m_d["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_h.params),
                    jax.tree_util.tree_leaves(st_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_sampled_step_mesh_matches_single_device():
    """8-device mesh == 1-device parameters for the device-sampled
    K-step program (the test_sharding.py standard for new modes)."""
    from ta3n_tpu.parallel import make_mesh
    src, tgt, _ = make_domain_pair(num_source=24, num_target=16, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 8, 8))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    K = 2
    store_s = jnp.asarray(np.ascontiguousarray(src.features))
    store_t = jnp.asarray(np.ascontiguousarray(tgt.features))
    sc = StepScalars(np.tile(np.float32([0.5, 0.5, 0.5]), (K, 1)),
                     np.zeros(K, np.float32), np.zeros(K, np.float32),
                     np.zeros(K, np.float32), np.full(K, 0.1, np.float32))

    def run(mesh):
        samp_s = DeviceSampler(_loader(src, bs=8), seed=0)
        samp_t = DeviceSampler(_loader(tgt, bs=8), seed=0)
        spe = min(samp_s.steps_per_epoch, samp_t.steps_per_epoch)
        samp_s.steps_per_epoch = samp_t.steps_per_epoch = spe
        step = make_sampled_multi_step(model, da, tc, samp_s, samp_t,
                                       mesh=mesh)
        st = create_train_state(model, rng, 8, 8, tc)
        for _ in range(3):
            st, m = step(st, store_s, store_t, sc, rng)
        return st, m

    st1, m1 = run(None)
    st8, m8 = run(make_mesh(jax.devices()))
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m8["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st1.params),
                    jax.tree_util.tree_leaves(st8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_resume_restores_step_counter(tmp_path):
    """The step counter drives the dropout fold and the device sampler's
    epoch derivation; resume must continue it, not restart at 0."""
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="none", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="none")
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8))

    def make_trainer():
        ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="test",
                       seed=1)
        lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="test",
                       seed=2)
        lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                       shuffle=False)
        return Trainer(cfg, da, tc, ls, lt, lv,
                       path_exp=str(tmp_path) + "/", use_mesh=False,
                       device_store=True, steps_per_call=2,
                       device_sampler=True, eval_freq=1, print_freq=100,
                       show_freq=100, save_model=True)

    tr = make_trainer()
    tr.fit()
    saved_step = int(tr.state.step)
    assert saved_step > 0

    tr2 = make_trainer()
    tr2.resume(str(tmp_path) + "/checkpoint", resume_hp=True)
    assert int(tr2.state.step) == saved_step


def test_trainer_device_sampler_end_to_end(tmp_path):
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.1, dropout_v=0.1)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.05, epochs=2, batch_size=(8, 6, 8),
                     beta=(0.5, 0.5, 0.5), lr_adaptive="dann")
    ls = TSNLoader(src, batch_size=8, num_segments=SEG, mode="random",
                   seed=1)
    lt = TSNLoader(tgt, batch_size=6, num_segments=SEG, mode="random",
                   seed=2)
    lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                   shuffle=False)
    tr = Trainer(cfg, da, tc, ls, lt, lv, path_exp=str(tmp_path) + "/",
                 use_mesh=True, device_store=True, steps_per_call=2,
                 device_sampler=True, eval_freq=1, print_freq=1,
                 show_freq=100)
    assert tr.sampled_step is not None
    best = tr.fit()
    assert best >= 0.0
    for leaf in jax.tree_util.tree_leaves(tr.state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_streaming_sampler_matches_host_shard_stream_bitwise():
    """StreamingDeviceSampler (deterministic mode) must reproduce the
    host shard_index_epoch stream bitwise: same shard sequence, same
    shard-local indices/labels/masks (VERDICT r2 next-#7)."""
    from ta3n_tpu.data.device_sampler import StreamingDeviceSampler
    from ta3n_tpu.data.streaming import ShardPlan
    src, _, _ = make_domain_pair(num_source=23, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    host = _loader(src, bs=6, mode="test")
    plan = ShardPlan(host.store.offsets, budget_rows=40)
    assert plan.num_shards >= 3
    dev = StreamingDeviceSampler(_loader(src, bs=6, mode="test"), plan,
                                 seed=0)

    # device-side chunk walk must visit the same (sid, j) sequence
    walk = [(sid, j) for sid in range(dev.num_shards)
            for j in range(dev.shard_steps(sid))]
    host_stream = list(host.shard_index_epoch(plan))
    assert len(walk) == len(host_stream)

    batch_fn = jax.jit(lambda sid, j, step: dev.shard_batch(
        sid, j, dev.shard_order(sid, jnp.asarray(0)), step))
    for step, ((sid, j), (hsid, hb)) in enumerate(zip(walk, host_stream)):
        assert sid == hsid
        idx, lab, mask = batch_fn(jnp.asarray(sid), jnp.asarray(j),
                                  jnp.asarray(step))
        np.testing.assert_array_equal(np.asarray(idx), hb.abs_indices,
                                      err_msg=f"shard {sid} batch {j}")
        np.testing.assert_array_equal(np.asarray(lab), hb.labels)
        np.testing.assert_array_equal(np.asarray(mask), hb.mask)


def test_streaming_sampler_shuffle_covers_every_record_once():
    from ta3n_tpu.data.device_sampler import StreamingDeviceSampler
    from ta3n_tpu.data.streaming import ShardPlan
    src, _, _ = make_domain_pair(num_source=23, num_target=8, num_val=8,
                                 num_class=3, feature_dim=FDIM)
    ld = _loader(src, bs=6, mode="random", shuffle=True)
    plan = ShardPlan(ld.store.offsets, budget_rows=40)
    dev = StreamingDeviceSampler(ld, plan, seed=0)
    seen = []
    for sid in range(dev.num_shards):
        order = dev.shard_order(jnp.asarray(sid), jnp.asarray(1))
        count = int(dev.shard_counts_host[sid])
        slots = np.asarray(order)[:count]
        recs = np.asarray(dev.groups)[sid][slots]
        # a shard's permutation covers exactly its own records
        assert sorted(recs) == sorted(
            np.asarray(dev.groups)[sid][:count].tolist())
        seen.extend(recs.tolist())
    assert sorted(seen) == list(range(23))
    # different epochs -> different within-shard orders (statistically);
    # pick the biggest shard (1-record shards have a unique permutation)
    big = int(np.argmax(dev.shard_counts_host))
    assert int(dev.shard_counts_host[big]) >= 2
    orders = {tuple(np.asarray(dev.shard_order(jnp.asarray(big),
                                               jnp.asarray(e))))
              for e in range(8)}
    assert len(orders) > 1


def test_zip_shard_chunk_plan():
    from ta3n_tpu.data.device_sampler import (StreamingDeviceSampler,
                                              plan_zip_shard_chunks)
    from ta3n_tpu.data.streaming import ShardPlan
    src, tgt, _ = make_domain_pair(num_source=23, num_target=17, num_val=8,
                                   num_class=3, feature_dim=FDIM)
    ls, lt = _loader(src, bs=6), _loader(tgt, bs=4)
    ps = ShardPlan(ls.store.offsets, budget_rows=40)
    pt = ShardPlan(lt.store.offsets, budget_rows=40)
    ds = StreamingDeviceSampler(ls, ps, seed=0)
    dt = StreamingDeviceSampler(lt, pt, seed=0)
    chunks = plan_zip_shard_chunks(ds, dt, steps_per_call=3)
    total = sum(c[4] for c in chunks)
    n_s = sum(ds.shard_steps(s) for s in range(ds.num_shards))
    n_t = sum(dt.shard_steps(s) for s in range(dt.num_shards))
    assert total == min(n_s, n_t)          # zip-shortest
    for sid_s, j0_s, sid_t, j0_t, k in chunks:
        assert 1 <= k <= 3
        # a chunk never crosses a shard boundary in either stream
        assert j0_s + k <= ds.shard_steps(sid_s)
        assert j0_t + k <= dt.shard_steps(sid_t)


def test_resume_bitwise_matches_uninterrupted_run(tmp_path):
    """Checkpoint at epoch 2 + resume == one straight 4-epoch run,
    parameter-BITWISE: in the device-sampled production mode every
    stream (epoch permutations, TSN sampling, dropout) is a function of
    the checkpointed step counter, and the schedules are functions of
    (epoch, step) — so preemption + resume reproduces the uninterrupted
    trajectory exactly (the reference restarts data/dropout streams
    from scratch on resume)."""
    src, tgt, val = make_domain_pair(num_source=24, num_target=18,
                                     num_val=12, num_class=3,
                                     feature_dim=FDIM, shift=0.8)
    cfg = ModelConfig(num_class=3, baseline_type="video",
                      frame_aggregation="trn-m", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      use_attn="TransAttn", dropout_i=0.2, dropout_v=0.2)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")

    def trainer(epochs, exp):
        tc = TrainConfig(lr=0.05, epochs=epochs, batch_size=(8, 6, 8),
                         beta=(-1.0, -1.0, -1.0), lr_adaptive="dann")
        ls = TSNLoader(src, batch_size=8, num_segments=SEG,
                       mode="random", seed=1)
        lt = TSNLoader(tgt, batch_size=6, num_segments=SEG,
                       mode="random", seed=2)
        lv = TSNLoader(val, batch_size=8, num_segments=SEG, mode="test",
                       shuffle=False)
        return Trainer(cfg, da, tc, ls, lt, lv, path_exp=exp,
                       use_mesh=False, device_store=True,
                       steps_per_call=2, device_sampler=True,
                       eval_freq=10, print_freq=100, show_freq=100,
                       save_model=True, seed=0)

    straight = trainer(4, str(tmp_path / "a") + "/")
    straight.fit()

    # preempt a 4-epoch run after epoch 2 (NOT a 2-epoch run: the DANN
    # ramp denominator is epochs*spe, so the interrupted run must carry
    # the same schedule as the straight one)
    first = trainer(4, str(tmp_path / "b") + "/")
    orig_validate = first.validate

    def validate_then_interrupt(epoch):
        prec1 = orig_validate(epoch)
        if epoch == 2:
            raise KeyboardInterrupt("preempted")
        return prec1

    first.eval_freq = 2
    first.validate = validate_then_interrupt
    try:
        first.fit()  # emergency checkpoint at epoch 2
    except KeyboardInterrupt:
        pass
    resumed = trainer(4, str(tmp_path / "b") + "/")
    resumed.resume(str(tmp_path / "b") + "/checkpoint", resume_hp=True)
    resumed.fit()

    assert int(straight.state.step) == int(resumed.state.step)
    for a, b in zip(jax.tree_util.tree_leaves(straight.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
