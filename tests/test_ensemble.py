"""Vmapped ensemble training (train/ensemble.py): N independent
seed/hyper-parameter members advance in one jitted step — a sweep-scale
capability the reference runs strictly sequentially (edit
script_train_val.sh, rerun).  Members must be EXACTLY the solo runs."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.parallel import make_mesh
from ta3n_tpu.train import (StepScalars, create_train_state,
                            make_train_step)
from ta3n_tpu.train.ensemble import (create_ensemble_state, ensemble_keys,
                                     make_ensemble_multi_step,
                                     make_ensemble_step, stack_scalars)

SEG, FDIM = 3, 16
SEEDS = (0, 1, 2)


def _cfgs(dropout=0.25):
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="trn-m", use_attn="TransAttn",
                      train_segments=SEG, val_segments=SEG, fc_dim=16,
                      feature_dim=FDIM, dropout_i=dropout,
                      dropout_v=dropout)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad",
                  place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(8, 8, 8))
    return cfg, da, tc


def _batch(gen, b, num_class):
    xs = gen.normal(size=(b, SEG, FDIM)).astype(np.float32)
    ys = gen.integers(0, num_class, size=b).astype(np.int32)
    return xs, ys, np.ones(b, np.float32)


def _scalars(lr=0.1, alpha=0.0):
    return StepScalars(jnp.array([0.5, 0.5, 0.5]), jnp.asarray(0.0),
                       jnp.asarray(alpha), jnp.asarray(0.0),
                       jnp.asarray(lr))


def _leaves_allclose(a, b, atol=1e-5):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=atol)


def test_ensemble_members_equal_solo_runs():
    """Shared data, per-member seeds (init + dropout streams): after 3
    steps every member matches its solo run."""
    cfg, da, tc = _cfgs()
    model = VideoModel(cfg)
    gen = np.random.default_rng(0)
    batches = [( _batch(gen, 8, 4), _batch(gen, 8, 4)) for _ in range(3)]
    sc = _scalars()

    # solo runs
    solo_step = make_train_step(model, da, tc)
    solo_params = []
    for s in SEEDS:
        key = jax.random.PRNGKey(s)
        st = create_train_state(model, key, 8, 8, tc)
        for (xs, ys, ms), (xt, yt, mt) in batches:
            st, _ = solo_step(st, xs, ys, ms, xt, yt, mt, sc, key)
        solo_params.append(st.params)

    # one vmapped ensemble
    est = create_ensemble_state(model, SEEDS, 8, 8, tc)
    estep = make_ensemble_step(model, da, tc, per_member_scalars=False)
    keys = ensemble_keys(SEEDS)
    for (xs, ys, ms), (xt, yt, mt) in batches:
        est, metrics = estep(est, xs, ys, ms, xt, yt, mt, sc, keys)
    assert metrics["loss"].shape == (len(SEEDS),)

    for k in range(len(SEEDS)):
        member = jax.tree_util.tree_map(lambda l: l[k], est.params)
        _leaves_allclose(member, solo_params[k])


def test_per_member_scalars_are_a_sweep_axis():
    """lr=0 member keeps its init params while lr>0 members train — a
    hyper-parameter sweep is a batched argument, not a recompile."""
    cfg, da, tc = _cfgs(dropout=0.0)
    model = VideoModel(cfg)
    gen = np.random.default_rng(1)
    (xs, ys, ms), (xt, yt, mt) = _batch(gen, 8, 4), _batch(gen, 8, 4)

    seeds = (0, 0, 0)  # identical inits -> only the scalars differ
    est = create_ensemble_state(model, seeds, 8, 8, tc)
    init_params = jax.tree_util.tree_map(lambda l: np.asarray(l[0]),
                                         est.params)
    sc = stack_scalars([_scalars(lr=0.0), _scalars(lr=0.1),
                        _scalars(lr=0.3)])
    estep = make_ensemble_step(model, da, tc)
    est, _ = estep(est, xs, ys, ms, xt, yt, mt, sc, ensemble_keys(seeds))

    m0 = jax.tree_util.tree_map(lambda l: l[0], est.params)
    _leaves_allclose(m0, init_params)  # lr=0: bitwise init
    m1 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda l: np.asarray(l[1]), est.params))
    m2 = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda l: np.asarray(l[2]), est.params))
    i0 = jax.tree_util.tree_leaves(init_params)
    assert any(np.abs(a - b).max() > 1e-7 for a, b in zip(m1, i0))
    assert any(np.abs(a - b).max() > 1e-7 for a, b in zip(m1, m2))


def test_ensemble_device_store_per_member_data():
    """HBM-store path with per-member index batches: one shared store,
    each member gathers (and trains on) its own rows — matches solo
    device-store runs."""
    cfg, da, tc = _cfgs()
    model = VideoModel(cfg)
    gen = np.random.default_rng(2)
    store_s = jnp.asarray(gen.normal(size=(40, FDIM)).astype(np.float32))
    store_t = jnp.asarray(gen.normal(size=(30, FDIM)).astype(np.float32))
    n = 2
    idx_s = gen.integers(0, 40, size=(n, 8, SEG)).astype(np.int32)
    idx_t = gen.integers(0, 30, size=(n, 8, SEG)).astype(np.int32)
    ys = gen.integers(0, 4, size=(n, 8)).astype(np.int32)
    yt = gen.integers(0, 4, size=(n, 8)).astype(np.int32)
    ms = np.ones((n, 8), np.float32)
    sc = _scalars()

    solo = make_train_step(model, da, tc, gather_on_device=True)
    solo_params = []
    for k in range(n):
        key = jax.random.PRNGKey(k)
        st = create_train_state(model, key, 8, 8, tc)
        st, _ = solo(st, store_s, idx_s[k], ys[k], ms[k],
                     store_t, idx_t[k], yt[k], ms[k], sc, key)
        solo_params.append(st.params)

    est = create_ensemble_state(model, range(n), 8, 8, tc)
    estep = make_ensemble_step(model, da, tc, gather_on_device=True,
                               per_member_data=True,
                               per_member_scalars=False)
    est, _ = estep(est, store_s, idx_s, ys, ms, store_t, idx_t, yt, ms,
                   sc, ensemble_keys(range(n)))
    for k in range(n):
        member = jax.tree_util.tree_map(lambda l: l[k], est.params)
        _leaves_allclose(member, solo_params[k])


def test_ensemble_sharded_over_mesh_matches_unsharded():
    """8 members sharded over the 8-device mesh (one per chip, zero
    collectives) == the unsharded vmap; state is actually distributed."""
    cfg, da, tc = _cfgs(dropout=0.0)
    model = VideoModel(cfg)
    gen = np.random.default_rng(3)
    (xs, ys, ms), (xt, yt, mt) = _batch(gen, 8, 4), _batch(gen, 8, 4)
    seeds = range(8)
    sc = stack_scalars([_scalars(lr=0.01 * (k + 1)) for k in seeds])
    keys = ensemble_keys(seeds)

    est1 = create_ensemble_state(model, seeds, 8, 8, tc)
    plain = make_ensemble_step(model, da, tc)
    est1, m1 = plain(est1, xs, ys, ms, xt, yt, mt, sc, keys)

    mesh = make_mesh()
    est2 = create_ensemble_state(model, seeds, 8, 8, tc)
    sharded = make_ensemble_step(model, da, tc, mesh=mesh)
    est2, m2 = sharded(est2, xs, ys, ms, xt, yt, mt, sc, keys)

    leaf = jax.tree_util.tree_leaves(est2.params)[0]
    assert len(leaf.sharding.device_set) == 8  # member axis distributed
    _leaves_allclose(est1.params, est2.params)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)


def test_ensemble_multi_step_matches_stepwise():
    """K-steps-per-dispatch scan == K single ensemble dispatches."""
    cfg, da, tc = _cfgs()
    model = VideoModel(cfg)
    gen = np.random.default_rng(4)
    store_s = jnp.asarray(gen.normal(size=(40, FDIM)).astype(np.float32))
    store_t = jnp.asarray(gen.normal(size=(30, FDIM)).astype(np.float32))
    n, k_steps = 2, 3
    idx_s = gen.integers(0, 40, size=(k_steps, n, 8, SEG)).astype(np.int32)
    idx_t = gen.integers(0, 30, size=(k_steps, n, 8, SEG)).astype(np.int32)
    ys = gen.integers(0, 4, size=(k_steps, n, 8)).astype(np.int32)
    yt = gen.integers(0, 4, size=(k_steps, n, 8)).astype(np.int32)
    ms = np.ones((k_steps, n, 8), np.float32)
    sc_steps = [stack_scalars([_scalars(lr=0.1), _scalars(lr=0.2)])
                for _ in range(k_steps)]
    sc_k = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *sc_steps)
    keys = ensemble_keys(range(n))

    est1 = create_ensemble_state(model, range(n), 8, 8, tc)
    estep = make_ensemble_step(model, da, tc, gather_on_device=True,
                               per_member_data=True)
    for i in range(k_steps):
        est1, _ = estep(est1, store_s, idx_s[i], ys[i], ms[i],
                        store_t, idx_t[i], yt[i], ms[i], sc_steps[i],
                        keys)

    est2 = create_ensemble_state(model, range(n), 8, 8, tc)
    multi = make_ensemble_multi_step(model, da, tc, per_member_data=True)
    est2, metrics = multi(est2, store_s, idx_s, ys, ms, store_t, idx_t,
                          yt, ms, sc_k, keys)
    assert metrics["loss"].shape == (k_steps, n)
    _leaves_allclose(est1.params, est2.params)
    np.testing.assert_array_equal(np.asarray(est1.step),
                                  np.asarray(est2.step))


def test_ensemble_multi_step_mesh_metrics_sharding():
    """Regression: scanned metrics come out [K, N, ...] — the member
    out-sharding must sit on axis 1, not axis 0 (caught as a pjit
    divisibility error when K != mesh size)."""
    cfg = ModelConfig(num_class=4, baseline_type="video",
                      frame_aggregation="avgpool", train_segments=SEG,
                      val_segments=SEG, fc_dim=16, feature_dim=FDIM,
                      dropout_i=0.0, dropout_v=0.0)
    da = DAConfig(use_target="uSv", adv_DA="RevGrad")
    tc = TrainConfig(lr=0.1, batch_size=(8, 8, 8))
    model = VideoModel(cfg)
    gen = np.random.default_rng(5)
    store_s = jnp.asarray(gen.normal(size=(30, FDIM)).astype(np.float32))
    store_t = jnp.asarray(gen.normal(size=(30, FDIM)).astype(np.float32))
    n, k = 8, 2  # k != mesh size on purpose
    idx = gen.integers(0, 30, size=(k, 8, SEG)).astype(np.int32)
    ys = gen.integers(0, 4, size=(k, 8)).astype(np.int32)
    ms = np.ones((k, 8), np.float32)
    sc1 = stack_scalars([_scalars()] * n)
    sc = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (k,) + x.shape), sc1)

    mesh = make_mesh()
    est = create_ensemble_state(model, range(n), 8, 8, tc)
    multi = make_ensemble_multi_step(model, da, tc, mesh=mesh)
    est, metrics = multi(est, store_s, idx, ys, ms, store_t, idx, ys,
                         ms, sc, ensemble_keys(range(n)))
    assert metrics["loss"].shape == (k, n)
    assert len(jax.tree_util.tree_leaves(est.params)[0]
               .sharding.device_set) == 8


def test_extract_member_is_a_solo_state(tmp_path):
    """Sweep -> pick winner -> go solo: extract_member yields a state
    that (a) evaluates identically to its vmapped slot, (b) round-trips
    through save_checkpoint/load_checkpoint, and (c) keeps training
    through the plain solo step."""
    from ta3n_tpu.io_utils import save_checkpoint
    from ta3n_tpu.io_utils.checkpoint import load_checkpoint
    from ta3n_tpu.train.ensemble import (extract_member,
                                         make_ensemble_eval_step)
    from ta3n_tpu.train.step import make_eval_step

    cfg, da, tc = _cfgs(dropout=0.0)
    model = VideoModel(cfg)
    gen = np.random.default_rng(6)
    (xs, ys, ms), (xt, yt, mt) = _batch(gen, 8, 4), _batch(gen, 8, 4)
    est = create_ensemble_state(model, SEEDS, 8, 8, tc)
    estep = make_ensemble_step(model, da, tc, per_member_scalars=False)
    est, _ = estep(est, xs, ys, ms, xt, yt, mt, _scalars(),
                   ensemble_keys(SEEDS))
    member = extract_member(est, 1)

    # (a) eval parity with the vmapped slot
    m_solo = make_eval_step(model)(member.params, member.batch_stats,
                                   xs, ys, ms)
    m_ens = make_ensemble_eval_step(model)(est.params, est.batch_stats,
                                           xs, ys, ms)
    np.testing.assert_allclose(np.asarray(m_solo["logits"]),
                               np.asarray(m_ens["logits"])[1],
                               rtol=1e-5, atol=1e-6)

    # (b) checkpoint round-trip (the ensemble_sweep --save_dir layout)
    d = str(tmp_path / "member_01") + "/"
    save_checkpoint(d, {"epoch": 1, "arch": "none",
                        "params": member.params,
                        "batch_stats": member.batch_stats,
                        "opt_state": member.opt_state,
                        "best_prec1": 0.0, "prec1": 0.0,
                        "step": int(member.step)})
    payload = load_checkpoint(d + "checkpoint")
    for a, b in zip(jax.tree_util.tree_leaves(payload["params"]),
                    jax.tree_util.tree_leaves(member.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(payload["step"]) == 1

    # (c) the solo train step consumes the extracted state
    from ta3n_tpu.train.step import TrainState
    solo_state = TrainState(payload["params"], payload["batch_stats"],
                            member.opt_state,
                            jnp.asarray(int(payload["step"]), jnp.int32))
    solo = make_train_step(model, da, tc)
    new_state, metrics = solo(solo_state, xs, ys, ms, xt, yt, mt,
                              _scalars(), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 2


def test_ensemble_2d_mesh_matches_unsharded():
    """(member=2 x data=4) mesh from make_ensemble_mesh: members shard
    2-way and each member's batch splits 4-way (gradient psum over
    'data' only) — results match the unsharded vmap."""
    from ta3n_tpu.train.ensemble import make_ensemble_mesh

    cfg, da, tc = _cfgs(dropout=0.0)
    model = VideoModel(cfg)
    gen = np.random.default_rng(7)
    (xs, ys, ms), (xt, yt, mt) = _batch(gen, 8, 4), _batch(gen, 8, 4)
    seeds = (0, 1)
    sc = stack_scalars([_scalars(lr=0.1), _scalars(lr=0.2)])
    keys = ensemble_keys(seeds)

    est1 = create_ensemble_state(model, seeds, 8, 8, tc)
    plain = make_ensemble_step(model, da, tc)
    est1, m1 = plain(est1, xs, ys, ms, xt, yt, mt, sc, keys)

    mesh = make_ensemble_mesh(2)
    assert mesh.shape == {"member": 2, "data": 4}
    est2 = create_ensemble_state(model, seeds, 8, 8, tc)
    sharded = make_ensemble_step(model, da, tc, mesh=mesh)
    est2, m2 = sharded(est2, xs, ys, ms, xt, yt, mt, sc, keys)

    leaf = jax.tree_util.tree_leaves(est2.params)[0]
    assert len(leaf.sharding.device_set) >= 2
    _leaves_allclose(est1.params, est2.params)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)


def test_ensemble_2d_mesh_multi_step_per_member_data():
    """K-step device-store scan on the (member x data) mesh with
    per-member index batches == the unsharded run."""
    from ta3n_tpu.train.ensemble import make_ensemble_mesh

    cfg, da, tc = _cfgs(dropout=0.0)
    model = VideoModel(cfg)
    gen = np.random.default_rng(8)
    store_s = jnp.asarray(gen.normal(size=(40, FDIM)).astype(np.float32))
    store_t = jnp.asarray(gen.normal(size=(30, FDIM)).astype(np.float32))
    n, k = 2, 2
    idx_s = gen.integers(0, 40, size=(k, n, 8, SEG)).astype(np.int32)
    idx_t = gen.integers(0, 30, size=(k, n, 8, SEG)).astype(np.int32)
    ys = gen.integers(0, 4, size=(k, n, 8)).astype(np.int32)
    yt = gen.integers(0, 4, size=(k, n, 8)).astype(np.int32)
    ms = np.ones((k, n, 8), np.float32)
    sc1 = stack_scalars([_scalars(lr=0.1), _scalars(lr=0.2)])
    sc = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(x, (k,) + x.shape).copy(), sc1)
    keys = ensemble_keys(range(n))

    est1 = create_ensemble_state(model, range(n), 8, 8, tc)
    plain = make_ensemble_multi_step(model, da, tc, per_member_data=True)
    est1, m1 = plain(est1, store_s, idx_s, ys, ms, store_t, idx_t, yt,
                     ms, sc, keys)

    mesh = make_ensemble_mesh(2)
    est2 = create_ensemble_state(model, range(n), 8, 8, tc)
    sharded = make_ensemble_multi_step(model, da, tc,
                                       per_member_data=True, mesh=mesh)
    est2, m2 = sharded(est2, store_s, idx_s, ys, ms, store_t, idx_t, yt,
                       ms, sc, keys)
    assert m2["loss"].shape == (k, n)
    _leaves_allclose(est1.params, est2.params)
    np.testing.assert_allclose(np.asarray(m1["loss"]),
                               np.asarray(m2["loss"]), rtol=1e-5)


def test_ensemble_rnn_and_adabn_configs_match_solo():
    """The vmapped step is config-agnostic: the LSTM aggregator's
    internal scan and AdaBN's mutable batch_stats must behave under the
    member axis exactly as solo (one step, 2 members each)."""
    for kw in ({"frame_aggregation": "rnn", "use_attn": "none"},
               {"frame_aggregation": "avgpool", "use_attn": "none",
                "use_bn": "AdaBN"}):
        cfg = ModelConfig(num_class=4, baseline_type="video",
                          train_segments=SEG, val_segments=SEG,
                          fc_dim=16, feature_dim=FDIM, dropout_i=0.0,
                          dropout_v=0.0, **kw)
        da = DAConfig(use_target="uSv", adv_DA="RevGrad")
        tc = TrainConfig(lr=0.1, batch_size=(8, 8, 8))
        model = VideoModel(cfg)
        gen = np.random.default_rng(9)
        (xs, ys, ms), (xt, yt, mt) = _batch(gen, 8, 4), _batch(gen, 8, 4)
        sc = _scalars()

        solo_step = make_train_step(model, da, tc)
        solo = []
        for s in (0, 1):
            key = jax.random.PRNGKey(s)
            st = create_train_state(model, key, 8, 8, tc)
            st, _ = solo_step(st, xs, ys, ms, xt, yt, mt, sc, key)
            solo.append(st)

        est = create_ensemble_state(model, (0, 1), 8, 8, tc)
        estep = make_ensemble_step(model, da, tc,
                                   per_member_scalars=False)
        est, _ = estep(est, xs, ys, ms, xt, yt, mt, sc,
                       ensemble_keys((0, 1)))
        for k in range(2):
            _leaves_allclose(
                jax.tree_util.tree_map(lambda l: l[k], est.params),
                solo[k].params)
            _leaves_allclose(
                jax.tree_util.tree_map(lambda l: l[k], est.batch_stats),
                solo[k].batch_stats)


def test_ensemble_error_paths():
    from ta3n_tpu.train.ensemble import make_ensemble_mesh
    from ta3n_tpu.train.sweep import pad_members

    # mesh: device count must divide member_shards
    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        make_ensemble_mesh(3)  # 8 devices

    # padding: to the member-axis multiple, duplicating member 0
    padded = pad_members([(0, 0.1, 1.0), (1, 0.1, 1.0), (2, 0.1, 1.0)],
                         4, log=lambda *_: None)
    assert len(padded) == 4 and padded[3] == padded[0]
    assert pad_members([(0, 0.1, 1.0)], 1) == [(0, 0.1, 1.0)]
