"""Config-space trace sweep over the reference's categorical flag surface.

Samples combinations of every categorical flag (SURVEY §2.7, opts.py) and
traces the FULL train step for each with jax.eval_shape — zero FLOPs, no
compilation — so hundreds of configurations can be checked in CI time.
The reference crashes or silently no-ops on many corners of this space
(SURVEY §2.10); our contract is: every combination either traces or
raises a documented ValueError.

Run standalone to enumerate failures:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/config_space_sweep.py
The pytest wrapper lives in tests/test_config_space.py.
"""

from __future__ import annotations

import random
import sys

import jax
import jax.numpy as jnp

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train import StepScalars, create_train_state, make_train_step
from ta3n_tpu.train.step import make_eval_step

SEGMENTS = 3
FDIM = 16
BS, BT = 4, 3

AXES = {
    "baseline_type": ("frame", "video", "tsn"),
    "frame_aggregation": ("avgpool", "rnn", "temconv", "trn", "trn-m",
                          "none"),
    "use_attn": ("none", "TransAttn", "general", "DotProduct"),
    "use_attn_frame": ("none", "TransAttn", "general", "DotProduct"),
    "use_bn": ("none", "AdaBN", "AutoDIAL"),
    "ens_DA": ("none", "MCD"),
    "share_params": ("Y", "N"),
    "add_fc": (1, 2, 3),
    "use_target": ("none", "Sv", "uSv"),
    "dis_DA": ("none", "DAN", "JAN", "CORAL"),
    "adv_DA": ("none", "RevGrad"),
    "add_loss_DA": ("none", "target_entropy", "attentive_entropy"),
    "pred_normalize": ("N", "Y"),
}

# canonical corners always included (published recipe + each aggregator +
# each DA family at full placement)
CANONICAL = [
    dict(baseline_type="video", frame_aggregation="trn-m",
         use_attn="TransAttn", use_attn_frame="none", use_bn="none",
         ens_DA="none", share_params="Y", add_fc=1, use_target="uSv",
         dis_DA="none", adv_DA="RevGrad", add_loss_DA="attentive_entropy",
         pred_normalize="N"),
    dict(baseline_type="tsn", frame_aggregation="rnn", use_attn="none",
         use_attn_frame="TransAttn", use_bn="AutoDIAL", ens_DA="MCD",
         share_params="N", add_fc=3, use_target="uSv", dis_DA="JAN",
         adv_DA="RevGrad", add_loss_DA="target_entropy",
         pred_normalize="N"),
    dict(baseline_type="frame", frame_aggregation="temconv",
         use_attn="general", use_attn_frame="general", use_bn="AdaBN",
         ens_DA="none", share_params="Y", add_fc=2, use_target="uSv",
         dis_DA="DAN", adv_DA="none", add_loss_DA="none",
         pred_normalize="Y"),
    dict(baseline_type="video", frame_aggregation="trn", use_attn="none",
         use_attn_frame="none", use_bn="none", ens_DA="none",
         share_params="Y", add_fc=1, use_target="uSv", dis_DA="CORAL",
         adv_DA="RevGrad", add_loss_DA="none", pred_normalize="N"),
    dict(baseline_type="frame", frame_aggregation="none", use_attn="none",
         use_attn_frame="none", use_bn="none", ens_DA="none",
         share_params="Y", add_fc=1, use_target="none", dis_DA="none",
         adv_DA="none", add_loss_DA="none", pred_normalize="N"),
]


def sample_combos(n: int, seed: int = 0):
    """CANONICAL plus n seeded-random samples of the full product."""
    rng = random.Random(seed)
    keys = list(AXES)
    combos = list(CANONICAL)
    seen = {tuple(sorted(c.items())) for c in combos}
    while len(combos) < len(CANONICAL) + n:
        c = {k: rng.choice(AXES[k]) for k in keys}
        sig = tuple(sorted(c.items()))
        if sig in seen:
            continue
        seen.add(sig)
        combos.append(c)
    return combos


def _effective_values(combo: dict):
    """The (axis, value) pairs a RUN of this combo actually exercises.

    Mirrors the reference's gating: with use_target='none' every DA
    mechanism is off regardless of its flag (main.py:454,507,541,547 all
    test use_target; configs_from_args zeroes use_bn/ens_DA the same
    way), attentive_entropy is a no-op without attention (main.py:558
    tests use_attn != 'none'), and relation-level attention only runs
    under an aggregation that reaches its branch: 'general' needs
    trn/trn-m (models.py:643-648 / video_model.py GeneralAttn call) and
    'TransAttn' needs avgpool or trn/trn-m (models.py:427-430,643-646)
    — under rnn/temconv/none aggregation use_attn never executes."""
    eff = set()
    da_axes = ("dis_DA", "adv_DA", "add_loss_DA", "ens_DA", "use_bn")
    agg = combo["frame_aggregation"]
    attn_aggs = {"TransAttn": ("avgpool", "trn", "trn-m"),
                 "general": ("trn", "trn-m")}
    for k in AXES:
        v = combo[k]
        if k in da_axes and combo["use_target"] == "none":
            v = "none"
        if (k == "add_loss_DA" and v == "attentive_entropy"
                and combo["use_attn"] == "none"):
            v = "none"
        if k == "use_attn" and agg not in attn_aggs.get(v, AXES[
                "frame_aggregation"]):
            v = "none"
        eff.add((k, v))
    return eff


def covering_combos(min_cover: int = 2):
    """Deterministic greedy covering design: every EXECUTABLE categorical
    value of every axis appears, effectively exercised, in at least
    `min_cover` combos.  Excluded from execution coverage (still
    trace-covered elsewhere): DotProduct (rejected by design) and
    pred_normalize='Y' (reference-marked 'in construction'; explodes on
    fresh-init logits, see execute_combo)."""
    need = {(k, v): min_cover for k in AXES for v in AXES[k]
            if v != "DotProduct"
            and not (k == "pred_normalize" and v == "Y")}
    da_axes = ("dis_DA", "adv_DA", "add_loss_DA", "ens_DA", "use_bn")

    def neediest(axis, allowed=None):
        vals = [v for v in (allowed or AXES[axis]) if (axis, v) in need]
        return max(vals, key=lambda v: (need[(axis, v)], -AXES[axis].index(v)))

    combos = []
    while any(c > 0 for c in need.values()):
        combo = {}
        # pick use_target first: DA-axis values only count when it's on
        da_pending = any(need[(k, v)] > 0 for k in da_axes
                         for v in AXES[k] if v != "none"
                         and (k, v) in need)
        if da_pending:
            combo["use_target"] = neediest("use_target", ("Sv", "uSv"))
        else:
            combo["use_target"] = neediest("use_target")
        for k in AXES:
            if k not in combo:
                combo[k] = neediest(k)
        # repairs for documented rejects / no-ops
        if combo["dis_DA"] == "JAN" and combo["baseline_type"] == "tsn":
            combo["baseline_type"] = neediest("baseline_type",
                                              ("frame", "video"))
        if (combo["add_loss_DA"] == "attentive_entropy"
                and combo["use_attn"] == "none"):
            combo["use_attn"] = neediest("use_attn",
                                         ("TransAttn", "general"))
        # relation-level attention only executes under an aggregation
        # that reaches it (see _effective_values); without this repair
        # the greedy can request 'general' forever under temconv and
        # never satisfy its coverage
        if (combo["use_attn"] == "general"
                and combo["frame_aggregation"] not in ("trn", "trn-m")):
            combo["frame_aggregation"] = neediest("frame_aggregation",
                                                  ("trn", "trn-m"))
        elif (combo["use_attn"] == "TransAttn"
              and combo["frame_aggregation"] not in ("avgpool", "trn",
                                                     "trn-m")):
            combo["frame_aggregation"] = neediest(
                "frame_aggregation", ("avgpool", "trn", "trn-m"))
        combos.append(combo)
        for kv in _effective_values(combo):
            if kv in need and need[kv] > 0:
                need[kv] -= 1
        if len(combos) > 60:  # the greedy must converge well before this
            raise AssertionError("covering design failed to converge")
    return combos


def expected_error(combo: dict):
    """Return a substring of the documented ValueError for combinations
    that are rejected by design, or None if the combo must trace."""
    if (combo["use_attn"] == "DotProduct"
            or combo["use_attn_frame"] == "DotProduct"):
        # accepted-but-unimplemented in the reference (opts.py:50-51),
        # at both attention levels; rejected loudly at ModelConfig
        # construction
        return "DotProduct"
    if (combo["dis_DA"] == "JAN" and combo["use_target"] != "none"
            and combo["baseline_type"] == "tsn"):
        # the reference crashes on this config (loss.py:86 on an empty
        # list); we reject it loudly at build time
        return "incompatible with baseline_type='tsn'"
    return None


def trace_combo(combo: dict) -> None:
    """Build model + step for one flag combination and trace it abstractly.

    Raises on any trace-time failure (shape error, missing branch, ...).
    """
    place = ("Y",) * (combo["add_fc"] + 2)  # main.py:44-47 length contract
    cfg = ModelConfig(num_class=4, train_segments=SEGMENTS,
                      val_segments=SEGMENTS, fc_dim=FDIM, feature_dim=FDIM,
                      dropout_i=0.1, dropout_v=0.1,
                      baseline_type=combo["baseline_type"],
                      frame_aggregation=combo["frame_aggregation"],
                      use_attn=combo["use_attn"],
                      use_attn_frame=combo["use_attn_frame"],
                      use_bn=combo["use_bn"], ens_DA=combo["ens_DA"],
                      share_params=combo["share_params"],
                      add_fc=combo["add_fc"],
                      n_ts=2, n_rnn=1)
    da = DAConfig(use_target=combo["use_target"], dis_DA=combo["dis_DA"],
                  adv_DA=combo["adv_DA"], add_loss_DA=combo["add_loss_DA"],
                  ens_DA=combo["ens_DA"], pred_normalize=combo["pred_normalize"],
                  place_dis=place, place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.1, batch_size=(BS, BT, BS))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)

    state = jax.eval_shape(
        lambda r: create_train_state(model, r, BS, BT, tc), rng)
    step = make_train_step(model, da, tc)
    f32 = jnp.float32
    xs = jax.ShapeDtypeStruct((BS, SEGMENTS, FDIM), f32)
    xt = jax.ShapeDtypeStruct((BT, SEGMENTS, FDIM), f32)
    ys = jax.ShapeDtypeStruct((BS,), jnp.int32)
    yt = jax.ShapeDtypeStruct((BT,), jnp.int32)
    ms = jax.ShapeDtypeStruct((BS,), f32)
    mt = jax.ShapeDtypeStruct((BT,), f32)
    sc = StepScalars(jax.ShapeDtypeStruct((3,), f32),
                     *[jax.ShapeDtypeStruct((), f32)] * 4)
    jax.eval_shape(step, state, xs, ys, ms, xt, yt, mt, sc, rng)

    # eval step traces too (validate/test CLI path, main.py:669-761)
    ev = make_eval_step(model)
    jax.eval_shape(ev, state.params, state.batch_stats, xs, ys, ms)


def execute_combo(combo: dict, n_steps: int = 2) -> None:
    """Execute (not just trace) n_steps real optimizer steps + one eval
    step for one combo on synthetic data, asserting:

      * every loss is finite,
      * parameters actually move (non-zero update through the whole
        optimizer chain),
      * mask invariance: the last row of each stream is masked out and
        its CONTENT (zeros vs garbage) must not change the loss, the
        update, or the eval metrics — one compile covers both runs
        since shapes are identical (the jit-level analogue of the
        reference's dummy-row pad + removeDummy, main.py:358-372).
    """
    import numpy as np

    place = ("Y",) * (combo["add_fc"] + 2)
    cfg = ModelConfig(num_class=4, train_segments=SEGMENTS,
                      val_segments=SEGMENTS, fc_dim=FDIM, feature_dim=FDIM,
                      dropout_i=0.1, dropout_v=0.1,
                      baseline_type=combo["baseline_type"],
                      frame_aggregation=combo["frame_aggregation"],
                      use_attn=combo["use_attn"],
                      use_attn_frame=combo["use_attn_frame"],
                      use_bn=combo["use_bn"], ens_DA=combo["ens_DA"],
                      share_params=combo["share_params"],
                      add_fc=combo["add_fc"], n_ts=2, n_rnn=1)
    da = DAConfig(use_target=combo["use_target"], dis_DA=combo["dis_DA"],
                  adv_DA=combo["adv_DA"], add_loss_DA=combo["add_loss_DA"],
                  ens_DA=combo["ens_DA"],
                  # pred_normalize stays trace-only: x/log(var) on
                  # fresh-init logits legitimately explodes (the reference
                  # marks the flag 'in construction', main.py:424-427)
                  pred_normalize="N",
                  place_dis=place, place_adv=("Y", "Y", "Y"))
    tc = TrainConfig(lr=0.05, batch_size=(BS, BT, BS))
    model = VideoModel(cfg)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, BS, BT, tc)
    step = make_train_step(model, da, tc)
    g = np.random.default_rng(0)
    xs = g.normal(size=(BS, SEGMENTS, FDIM)).astype("float32")
    xt = g.normal(size=(BT, SEGMENTS, FDIM)).astype("float32")
    ys = g.integers(0, 4, size=BS).astype("int32")
    yt = g.integers(0, 4, size=BT).astype("int32")
    # the last row of each stream is masked out; its content must not
    # matter (zeros vs garbage variants run through ONE compiled step)
    ms = np.ones(BS, "float32")
    mt = np.ones(BT, "float32")
    ms[-1] = mt[-1] = 0.0

    def variant(fill):
        xs_v, xt_v = xs.copy(), xt.copy()
        xs_v[-1], xt_v[-1] = fill, fill
        return xs_v, xt_v

    xs_zero, xt_zero = variant(0.0)
    xs_junk, xt_junk = variant(37.5)

    sc = StepScalars(jnp.asarray([0.5, 0.5, 0.5], jnp.float32),
                     jnp.asarray(0.1), jnp.asarray(0.2), jnp.asarray(0.01),
                     jnp.asarray(0.05))
    params0 = jax.tree_util.tree_map(np.asarray, state.params)

    state_junk = None
    for i in range(n_steps):
        r = jax.random.fold_in(rng, i)
        if i == 0:  # masked-row-content invariance of the update
            # the step donates its state buffers — give the variant
            # call its own host-side copy so `state` stays alive
            state_copy = jax.tree_util.tree_map(
                lambda a: np.asarray(a).copy(), state)
            state_junk, m_junk = step(state_copy, xs_junk, ys, ms,
                                      xt_junk, yt, mt, sc, r)
        state, m = step(state, xs_zero, ys, ms, xt_zero, yt, mt, sc, r)
        assert np.isfinite(float(m["loss"])), (combo, dict(m))
        if i == 0:
            assert float(m["loss"]) == float(m_junk["loss"]), \
                (combo, "masked-row content leaked into the loss")
            for pz, pj in zip(jax.tree_util.tree_leaves(state.params),
                              jax.tree_util.tree_leaves(state_junk.params)):
                np.testing.assert_array_equal(
                    np.asarray(pz), np.asarray(pj),
                    err_msg=f"{combo}: masked-row content leaked "
                            "into the update")

    # parameters moved through the whole clip->wd->nesterov chain
    moved = sum(float(np.abs(np.asarray(a) - b).sum())
                for a, b in zip(jax.tree_util.tree_leaves(state.params),
                                jax.tree_util.tree_leaves(params0)))
    assert moved > 0.0, (combo, "no parameter movement after steps")

    # eval step: finite + the same mask invariance (main.py:690-698)
    ev = make_eval_step(model)
    e_zero = ev(state.params, state.batch_stats, xs_zero, ys, ms)
    e_junk = ev(state.params, state.batch_stats, xs_junk, ys, ms)
    assert np.isfinite(float(e_zero["loss"])), combo
    for k in ("loss", "top1", "top5", "n"):
        assert float(e_zero[k]) == float(e_junk[k]), \
            (combo, f"masked-row content leaked into eval {k}")


def check_combo(combo: dict) -> None:
    """Assert the combo honors the contract: traces cleanly, or raises
    the documented ValueError."""
    want = expected_error(combo)
    if want is None:
        trace_combo(combo)
        return
    try:
        trace_combo(combo)
    except ValueError as e:
        assert want in str(e), (combo, str(e))
        return
    raise AssertionError(f"expected ValueError({want!r}) for {combo}")


def main(n: int = 120, seed: int = 0) -> int:
    combos = sample_combos(n, seed)
    failures = []
    for i, combo in enumerate(combos):
        try:
            check_combo(combo)
        except Exception as e:  # noqa: BLE001 — enumerating failures
            failures.append((combo, repr(e)))
            print(f"[{i}] FAIL {combo}\n    {e!r}")
    print(f"{len(combos) - len(failures)}/{len(combos)} combinations "
          f"honor the trace-or-documented-error contract")
    return 1 if failures else 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    sys.exit(main(n))
