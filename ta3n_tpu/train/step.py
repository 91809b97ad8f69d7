"""Jitted train / eval steps: the whole per-batch hot loop of the reference
(`main.py:348-628` loss assembly + backward + optimizer) as ONE compiled
XLA program per configuration.

Design vs the reference:
  * forward(+MCD second forward), every DA loss, backward, gradient clip,
    weight decay, momentum and parameter update are a single jit — no
    Python in the hot loop, no `.item()` device syncs per loss
    (main.py:450-569); metrics come back as one small device array.
  * schedule scalars (beta triple, mu, alpha, gamma, lr) are traced inputs,
    so the DANN per-step schedules (main.py:350-352,619-621) never
    recompile.
  * dummy-row padding/removal (main.py:358-372,825-832) is replaced by
    per-video masks threaded into every loss.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, TrainConfig
from ta3n_tpu.losses import (CORAL, JAN, attentive_entropy,
                             cross_entropy_soft, dis_MCD, mmd_rbf,
                             weighted_cross_entropy)
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train.optim import (apply_updates_with_lr,
                                  decay_masked_params, make_flat_optimizer,
                                  make_optimizer, structural_participation)

__all__ = ["TrainState", "StepScalars", "create_train_state",
           "make_train_step", "make_eval_step", "topk_correct"]


def _tp_size(mesh) -> int:
    """Model-parallel degree of a mesh (1 = pure DP)."""
    if mesh is None or "model" not in mesh.axis_names:
        return 1
    return int(mesh.shape["model"])


# kernels below this element count stay replicated under TP (collective
# cost would exceed the FLOP split); module-level so tests with tiny
# models can lower it
_TP_MIN_SIZE = 2 ** 19


def _tp_param_constrainer(mesh, min_size: Optional[int] = None):
    """Tensor parallelism (capability beyond the reference's
    DataParallel-only scaling, SURVEY §2.9): returns a params->params
    function that column-shards every large 2-D dense kernel over the
    mesh's 'model' axis via with_sharding_constraint — XLA GSPMD then
    derives the activation/gradient collectives and the matching
    optimizer-state shardings by propagation.  TRN fusion weights stay
    replicated (they feed the Pallas kernel, which consumes local
    arrays); biases and small layers stay replicated (collective cost
    would exceed the FLOP split).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    tp = _tp_size(mesh)
    if tp <= 1:
        return lambda params: params
    col = NamedSharding(mesh, P(None, "model"))

    rep = NamedSharding(mesh, P())

    def constrain(params):
        threshold = _TP_MIN_SIZE if min_size is None else min_size

        def rule(path, leaf):
            names = [str(getattr(p, "key", getattr(p, "name", "")))
                     for p in path]
            if ("TRN" not in names
                    and getattr(leaf, "ndim", 0) == 2 and names
                    and names[-1] == "kernel" and leaf.size >= threshold
                    and leaf.shape[1] % tp == 0):
                return jax.lax.with_sharding_constraint(leaf, col)
            # pin everything else replicated: without this, GSPMD
            # propagates 'model' shardings onto biases/small layers in
            # the OUTPUT state, which downstream (eval/serve) consumers
            # with replicated in_shardings then reject
            return jax.lax.with_sharding_constraint(leaf, rep)
        return jax.tree_util.tree_map_with_path(rule, params)

    return constrain


def _batch_constrainer(mesh, axis_name: str = "data"):
    """Leading-axis sharding constraint for batches generated INSIDE a
    jitted program (the device samplers); identity without a mesh."""
    if mesh is None:
        return lambda x: x
    from jax.sharding import NamedSharding, PartitionSpec as P

    def constrain(x):
        spec = P(*([axis_name] + [None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh,
                                                                 spec))
    return constrain


def _mesh_shardings(mesh, axis_name: str = "data"):
    """(replicated, batch-sharded, K-stacked-batch-sharded) NamedShardings.

    Used as jit in_shardings/out_shardings so data parallelism is part of
    the compiled program (XLA inserts the gradient psum over ICI) with no
    per-call host placement work — the TPU-native replacement for the
    reference's torch.nn.DataParallel (main.py:79)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis_name))
    kdata = NamedSharding(mesh, P(None, axis_name))
    return rep, data, kdata


def _multiprocess_lift(fn, in_shardings):
    """Make a mesh-compiled step callable with host-numpy batch args from
    a multi-host (jax.distributed) run.

    Single-controller jit happily places numpy args per its in_shardings;
    multi-controller jit rejects numpy destined for a NON-replicated
    sharding ("Passing non-trivial shardings for numpy inputs is not
    allowed").  Every process in our runs holds the identical full global
    batch (the loaders/samplers are seed-synchronized — the per-host-
    slice feeding variant is scripts/multihost_integration.py), so such
    args lift losslessly via parallel.mesh.lift_to_global, each process
    contributing the shards it owns.  Single-process behavior is
    untouched; jitted attributes (.raw, .loss_fn, ...) are preserved.
    """
    from jax.sharding import NamedSharding

    from ta3n_tpu.parallel.mesh import lift_to_global
    lift = {i: s for i, s in enumerate(in_shardings)
            if isinstance(s, NamedSharding) and not s.is_fully_replicated}
    if not lift:
        return fn

    @functools.wraps(fn, updated=())
    def wrapped(*args):
        if jax.process_count() == 1:
            return fn(*args)
        args = list(args)
        for i, sh in lift.items():
            if isinstance(args[i], np.ndarray):
                args[i] = lift_to_global(args[i], sh)
        return fn(*args)

    for attr in ("raw", "loss_fn", "tx"):
        if hasattr(fn, attr):
            setattr(wrapped, attr, getattr(fn, attr))
    return wrapped


def _jit_lifted(fn, donate_argnums=(), **jit_kwargs):
    """jax.jit + the multi-host numpy lift in ONE place.

    Every step/eval builder funnels through this so no jit site can
    ship non-replicated in_shardings without the lift (forgetting the
    lift fails only on a multi-host run, with "Passing non-trivial
    shardings for numpy inputs is not allowed").  Attaches ``.raw = fn``;
    attributes set on the returned object afterwards stick (the lift
    wrapper is a plain function object).
    """
    jitted = jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)
    jitted.raw = fn
    if jit_kwargs.get("in_shardings") is not None:
        jitted = _multiprocess_lift(jitted, jit_kwargs["in_shardings"])
    return jitted


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any           # {} when the model has no BN
    opt_state: Any
    step: jax.Array            # int32 scalar


class StepScalars(NamedTuple):
    """Traced per-step schedule values (host-computed, see schedules.py)."""
    beta: jax.Array            # (3,) [relation, video, frame]
    mu: jax.Array
    alpha: jax.Array
    gamma: jax.Array
    lr: jax.Array


def _build_tx(train_cfg: TrainConfig):
    """Chained optax (per-leaf) or the op-count-fused flat variant
    (optim.FlatOptimizer) per train_cfg.fused_optimizer."""
    maker = (make_flat_optimizer
             if getattr(train_cfg, "fused_optimizer", False)
             else make_optimizer)
    return maker(train_cfg.optimizer, train_cfg.momentum,
                 train_cfg.weight_decay, train_cfg.clip_gradient)


def create_train_state(model: VideoModel, rng: jax.Array,
                       batch_source: int, batch_target: int,
                       train_cfg: TrainConfig) -> TrainState:
    cfg = model.cfg
    xs = jnp.zeros((batch_source, cfg.train_segments, cfg.input_feature_dim))
    xt = jnp.zeros((batch_target, cfg.train_segments, cfg.input_feature_dim))
    variables = model.init({"params": rng, "dropout": rng}, xs, xt,
                           jnp.zeros(3), jnp.asarray(0.0), True, False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = _build_tx(train_cfg)
    opt_state = tx.init(params)
    return TrainState(params, batch_stats, opt_state,
                      jnp.asarray(0, jnp.int32))


def topk_correct(logits: jax.Array, labels: jax.Array, mask: jax.Array,
                 k: int) -> jax.Array:
    """Masked top-k hit count (reference accuracy(), main.py:809-822)."""
    k = min(k, logits.shape[-1])
    _, top = jax.lax.top_k(logits, k)
    hit = jnp.any(top == labels[:, None], axis=-1).astype(jnp.float32)
    return jnp.sum(hit * mask)


def _flatten_out(out: jax.Array, labels: jax.Array, mask: jax.Array,
                 baseline_type: str):
    """frame baseline keeps a segment axis: expand labels/mask per frame
    (main.py:380-385)."""
    if baseline_type == "frame" and out.ndim == 3:
        b, s, c = out.shape
        out = out.reshape(b * s, c)
        labels = jnp.repeat(labels, s)
        mask = jnp.repeat(mask, s)
    return out, labels, mask


def _masked_var_log_scale(x: jax.Array, mask: Optional[jax.Array]
                          ) -> jax.Array:
    """x / log(var(x)) over real rows — the reference's 'uncertainty'
    pred_normalize (main.py:424-427,531-532, flagged 'in construction';
    torch .var() is unbiased over all elements)."""
    if mask is None:
        m = jnp.ones(x.shape[0], x.dtype)
    else:
        m = mask.astype(x.dtype)
    w = m.reshape((-1,) + (1,) * (x.ndim - 1))
    n = jnp.maximum(jnp.sum(w) * np.prod(x.shape[1:]), 2.0)
    mean = jnp.sum(x * w) / n
    var = jnp.sum(jnp.square(x - mean) * w) / (n - 1.0)
    return x / jnp.log(var)


def _domain_adversarial_loss(pred_domain_s, pred_domain_t, mask_s, mask_t,
                             place_adv, domain_weights,
                             pred_normalize: bool = False):
    """Sum of 2-way domain CE over the layers marked 'Y' in --place_adv.

    Parity: main.py:507-538 (frame/relation preds flattened to rows, source
    label 0 / target label 1, optional inverse-count weighting).  Also
    returns the selected concatenated logits list (pred_domain_all), whose
    index 1 feeds attentive entropy (main.py:560).
    """
    loss = jnp.asarray(0.0)
    selected = []
    for l, flag in enumerate(place_adv):
        if flag != "Y":
            continue
        ps, pt = pred_domain_s[l], pred_domain_t[l]

        def rows(p, m):
            if p.ndim == 3:
                m = jnp.repeat(m, p.shape[1])
                p = p.reshape(-1, p.shape[-1])
            return p, m

        ps, ms = rows(ps, mask_s)
        pt, mt = rows(pt, mask_t)
        logits = jnp.concatenate([ps, pt], axis=0)
        labels = jnp.concatenate(
            [jnp.zeros(ps.shape[0], jnp.int32),
             jnp.ones(pt.shape[0], jnp.int32)])
        m = jnp.concatenate([ms, mt])
        if pred_normalize:  # main.py:531-532
            logits = _masked_var_log_scale(logits, m)
        loss = loss + weighted_cross_entropy(logits, labels, domain_weights,
                                             m)
        selected.append((logits, m))
    return loss, selected


_DIS_CHUNK_ROWS = 256  # reference size_batch (main.py:488)


def _discrepancy_loss(feat_s, feat_t, da: DAConfig, add_fc: int,
                      n_pair: int, mask_s=None, mask_t=None):
    """DAN / JAN / CORAL placement (main.py:454-505).

    Features are taken from the first ``n_pair`` videos of each stream
    (static analogue of `size_loss = min(...)`, main.py:467,482).  The
    reference's 256-row sub-batching (main.py:488-490: view into
    [n/256, 256, ...] chunks, per-layer loss = mean of per-chunk DAN/CORAL)
    is replicated exactly for chunk-divisible sizes; where the reference's
    `.view` would crash (n_pair % 256 != 0 above 256) we generalize with a
    smaller remainder chunk, still averaging per-chunk losses.  Shapes are
    static, so the chunk loop unrolls at trace time at zero dispatch cost.
    JAN is never sub-batched (reference keeps it in the non-chunked branch,
    main.py:462-471).

    Divergence (improvement): placing DAN/CORAL on the shared frame-level
    layer crashes the reference outright — those feat entries are 3D
    [B, S, d] and `guassian_kernel` (loss.py:49-52) calls
    `.expand(n, n, d)` on what is then a 4D tensor (RuntimeError), so the
    reference only ever runs discrepancy on the 2D video-level entries.
    We flatten each video's segments to one [B, S*d] row instead, making
    `--place_dis` fully functional at every layer.
    """
    kernel_muls = [2.0, 2.0]
    kernel_nums = [2, 5]

    def flat(x):
        return x[:n_pair].reshape(n_pair, -1)

    # row masks for the paired slice: padded rows must not contribute to
    # bandwidth statistics, kernel means, or covariances (the mask
    # analogue of removeDummy running BEFORE the loss, main.py:420-422)
    ms = None if mask_s is None else mask_s[:n_pair]
    mt = None if mask_t is None else mask_t[:n_pair]

    if da.dis_DA == "JAN":
        # ignore the shared-layer features (main.py:463-465)
        fs = [flat(f) for f in feat_s[:-add_fc]]
        ft = [flat(f) for f in feat_t[:-add_fc]]
        if not fs:
            # baseline_type 'tsn' exposes ONLY the shared-layer feats
            # (models.py:620,675,690 are all gated on frame/video), so the
            # reference's own JAN crashes on an empty list
            # (loss.py:86 source_list[0] IndexError).  Error loudly here;
            # make_train_step rejects the config at build time.
            raise ValueError(
                "JAN requires frame- or video-level features; "
                "baseline_type 'tsn' provides none beyond the shared "
                "layers (the reference crashes on this config too)")
        return JAN(fs, ft, kernel_muls=kernel_muls, kernel_nums=kernel_nums,
                   fix_sigma_list=[None, None], ver=2,
                   mask_source=ms, mask_target=mt)

    def chunked_mean(fn, fs, ft):
        # the reference strips dummy rows BEFORE chunking (removeDummy,
        # main.py:420-422 -> view at main.py:488-490), so it never
        # averages over an all-padding chunk; with static shapes the
        # analogue is weighting each chunk by whether it holds any
        # valid source AND target rows (masks are valid-first, so only
        # trailing chunks can be fully padded)
        size_batch = min(_DIS_CHUNK_ROWS, fs.shape[0])
        losses, weights = [], []
        for i in range(0, fs.shape[0], size_batch):
            cs = None if ms is None else ms[i:i + size_batch]
            ct = None if mt is None else mt[i:i + size_batch]
            losses.append(fn(fs[i:i + size_batch], ft[i:i + size_batch],
                             cs, ct))
            weights.append(
                jnp.asarray(1.0) if cs is None else
                ((jnp.sum(cs) > 0) & (jnp.sum(ct) > 0)).astype(jnp.float32))
        w = jnp.stack(weights)
        return jnp.sum(jnp.stack(losses) * w) / jnp.maximum(jnp.sum(w), 1.0)

    muls = kernel_muls + [kernel_muls[-1]] * add_fc
    nums = kernel_nums + [kernel_nums[-1]] * add_fc
    loss = jnp.asarray(0.0)
    for l in range(add_fc + 2):
        if l >= len(da.place_dis) or da.place_dis[l] != "Y":
            continue
        if l >= len(feat_s):
            continue
        fs, ft = flat(feat_s[l]), flat(feat_t[l])
        if da.dis_DA == "CORAL":
            loss = loss + chunked_mean(
                lambda a, b, wa, wb: CORAL(a, b, mask_source=wa,
                                           mask_target=wb), fs, ft)
        elif da.dis_DA == "DAN":
            loss = loss + chunked_mean(
                lambda a, b, wa, wb, l=l: mmd_rbf(
                    a, b, kernel_mul=muls[l], kernel_num=nums[l], ver=2,
                    mask_source=wa, mask_target=wb),
                fs, ft)
        else:
            raise ValueError(f"unknown dis_DA {da.dis_DA}")
    return loss


def device_gather(store, abs_idx: jax.Array) -> jax.Array:
    """On-device row gather from an HBM-resident packed store.

    store: [total_rows, D] or [total_rows, streams, D] (Flow), or an
    int8 ``(q, scale)`` pair (data/quantized.py) whose gathered rows
    are dequantized to float32 on device;
    abs_idx: [B, T] -> [B, T(*streams), D].
    """
    if isinstance(store, (tuple, list)):
        q, scale = store
        x = q[abs_idx].astype(scale.dtype)
        x = x * scale[abs_idx].reshape(abs_idx.shape
                                       + (1,) * (q.ndim - 1))
    else:
        x = store[abs_idx]
    if x.ndim == 4:  # interleave streams (dataset.py:62-66 semantics)
        b, t, s, d = x.shape
        x = x.reshape(b, t * s, d)
    return x


def make_train_step(model: VideoModel, da: DAConfig, train_cfg: TrainConfig,
                    class_weights: Optional[jnp.ndarray] = None,
                    domain_weights: Optional[jnp.ndarray] = None,
                    pretrain_classification_only: bool = False,
                    return_aux: bool = False,
                    gather_on_device: bool = False,
                    mesh=None, axis_name: str = "data",
                    combined_store_rows: Optional[int] = None):
    """Build the jitted train step for one configuration.

    Returned signature:
      step(state, xs, ys, mask_s, xt, yt, mask_t, scalars, rng)
        -> (new_state, metrics dict)
    With ``gather_on_device=True`` the xs/xt arguments are
    (store, abs_indices) pairs instead of feature arrays: the packed
    feature store stays resident in HBM and the batch gather runs inside
    the jit — only ~KB of indices cross the host boundary per step
    (vs the reference's per-frame torch.load host pipeline).
    With ``combined_store_rows=N`` (requires gather_on_device) the two
    stores are ONE packed array (source rows 0..N, target rows at
    offset N) and the signature drops the second store:
      step(state, store, idx_s, ys, mask_s, idx_t, yt, mask_t,
           scalars, rng)
    — one flat gather feeds the model's frame stack directly (model
    combined_rows fast path).  Equivalence-tested, but measured SLOWER
    than the default two-store path on TPU (269.4 -> 294.2 us/step:
    XLA already fuses the entry concat into the two gathers' output
    buffer — see BENCH_NOTES.md "Combined-store single-gather").  Kept
    as an opt-in for single-array deployments, not wired into the CLI.

    With ``mesh`` the step is compiled with explicit in_shardings: batch
    axes sharded over the mesh, state/stores/scalars/rng replicated —
    data parallelism baked into the XLA program (gradient all-reduce over
    ICI), zero per-step host placement.
    """
    cfg = model.cfg
    if cfg.quantize != "none":
        # int8 quantization is inference-only: round() has zero gradient,
        # so a quantized train step would silently learn nothing through
        # every MXU-sized GEMM.  (Every step builder routes through here.)
        raise ValueError(
            f"ModelConfig.quantize={cfg.quantize!r} is inference-only "
            "(eval CLI / serve.Predictor); train with quantize='none'")
    tx = _build_tx(train_cfg)
    use_bn = cfg.use_bn != "none"
    use_tgt = da.use_target != "none"
    mcd = da.ens_DA == "MCD" and use_tgt
    if mcd and cfg.ens_DA != "MCD":
        # without the model-side second classifier, out_2 == out and the
        # MCD discrepancy silently trains nothing (caught in the wild:
        # a config set only DAConfig.ens_DA)
        raise ValueError("DAConfig.ens_DA='MCD' requires "
                         "ModelConfig.ens_DA='MCD' (the second video "
                         "classifier lives in the model)")
    if combined_store_rows is not None and not gather_on_device:
        raise ValueError("combined_store_rows requires "
                         "gather_on_device=True (it is a device-store "
                         "gather layout)")
    if da.dis_DA == "JAN" and use_tgt and cfg.baseline_type == "tsn":
        # tsn exposes only shared-layer feats, which JAN ignores by
        # definition (main.py:463-465) — the reference crashes on an empty
        # list (loss.py:86); reject at build time with the reason
        raise ValueError(
            "dis_DA='JAN' is incompatible with baseline_type='tsn': JAN "
            "ignores shared-layer features and tsn provides no others "
            "(the reference crashes on this config, loss.py:86)")

    def loss_fn(params, batch_stats, xs, ys, mask_s, xt, yt, mask_t,
                scalars: StepScalars, rng, rows=None):
        variables = {"params": params}
        if use_bn:
            variables["batch_stats"] = batch_stats
        rng_fwd, rng_mcd = jax.random.split(rng)

        if use_bn:
            (out_s, out_t), mut = model.apply(
                variables, xs, xt, scalars.beta, scalars.mu, True, False,
                rngs={"dropout": rng_fwd}, mutable=["batch_stats"],
                combined_rows=rows,
                mask_source=mask_s, mask_target=mask_t)
            new_stats = mut["batch_stats"]
        else:
            out_s, out_t = model.apply(
                variables, xs, xt, scalars.beta, scalars.mu, True, False,
                rngs={"dropout": rng_fwd}, combined_rows=rows)
            new_stats = batch_stats

        metrics = {}

        # ---- (1) classification loss (main.py:437-451) ----
        o_src, lab_src, m_src = _flatten_out(out_s.out, ys, mask_s,
                                             cfg.baseline_type)
        o_tgt, lab_tgt, m_tgt = _flatten_out(out_t.out, yt, mask_t,
                                             cfg.baseline_type)
        if da.pred_normalize == "Y":
            # main.py:424-427 mutates BOTH streams once, before the whole
            # loss assembly: the normalized out_target then feeds the Sv
            # concat (main.py:442-444), target_entropy (main.py:542) and
            # attentive_entropy (main.py:558) below.  out_source_2 (MCD)
            # is NOT normalized there.  XLA dead-code-eliminates the
            # target flatten/scale when nothing consumes it.
            o_src = _masked_var_log_scale(o_src, m_src)
            o_tgt = _masked_var_log_scale(o_tgt, m_tgt)
        if da.use_target == "Sv":
            o = jnp.concatenate([o_src, o_tgt], axis=0)
            lab = jnp.concatenate([lab_src, lab_tgt])
            m = jnp.concatenate([m_src, m_tgt])
        else:
            o, lab, m = o_src, lab_src, m_src
        loss_c = weighted_cross_entropy(o, lab, class_weights, m)
        if mcd:
            o2, lab2, m2 = _flatten_out(out_s.out_2, ys, mask_s,
                                        cfg.baseline_type)
            loss_c = loss_c + weighted_cross_entropy(o2, lab2, class_weights,
                                                     m2)
        metrics["loss_c"] = loss_c
        loss = loss_c

        if pretrain_classification_only:
            metrics["loss"] = loss
            metrics["top1"] = topk_correct(o, lab, m, 1)
            metrics["top5"] = topk_correct(o, lab, m, 5)
            metrics["n"] = jnp.sum(m)
            return loss, (new_stats, metrics)

        # ---- (2) discrepancy loss (main.py:454-505) ----
        if da.dis_DA != "none" and use_tgt:
            n_pair = min(xs.shape[0], xt.shape[0])
            loss_d = _discrepancy_loss(out_s.feat, out_t.feat, da,
                                       cfg.add_fc, n_pair, mask_s, mask_t)
            metrics["loss_d"] = loss_d
            loss = loss + scalars.alpha * loss_d

        # ---- (3) adversarial loss (main.py:507-538) ----
        selected_domain = []
        if da.adv_DA != "none" and use_tgt:
            loss_a, selected_domain = _domain_adversarial_loss(
                out_s.pred_domain, out_t.pred_domain, mask_s, mask_t,
                da.place_adv, domain_weights,
                pred_normalize=da.pred_normalize == "Y")
            metrics["loss_a"] = loss_a
            loss = loss + loss_a

        # ---- (4) entropy losses (main.py:541-545,558-562) ----
        if da.add_loss_DA == "target_entropy" and use_tgt:
            loss_e = cross_entropy_soft(o_tgt, m_tgt)
            metrics["loss_e"] = loss_e
            loss = loss + scalars.gamma * loss_e
        elif (da.add_loss_DA == "attentive_entropy"
              and cfg.use_attn != "none" and use_tgt):
            pred_all = jnp.concatenate([o_src, o_tgt], axis=0)
            m_all = jnp.concatenate([m_src, m_tgt])
            # pred_domain_all[1]: the 2nd selected adversarial layer —
            # video-level under the published place_adv (main.py:560).
            #
            # DOCUMENTED DIVERGENCE (fixed, not replicated — PARITY.md):
            # for any other --place_adv the reference CRASHES at
            # main.py:560 — IndexError when < 2 layers are selected
            # (e.g. place_adv=N,N,Y), torch broadcast RuntimeError when
            # the 2nd selection's row count mismatches the class rows
            # (e.g. place_adv=Y,N,Y selects frame-level rows =
            # (Bs+Bt)*segments vs Bs+Bt).  We instead pick, in order:
            # the reference's pred_domain_all[1], then the video-level
            # (layer 1), then the frame-level (layer 2) domain logits —
            # first one whose row count matches the class logits rows.
            # All trace-time (static-shape) decisions; tested in
            # tests/test_attentive_entropy.py.
            def _concat_dom(layer):
                ps, pt = out_s.pred_domain[layer], out_t.pred_domain[layer]
                ms2, mt2 = mask_s, mask_t
                if ps.ndim == 3:  # frame-level: flatten to rows
                    ms2 = jnp.repeat(ms2, ps.shape[1])
                    mt2 = jnp.repeat(mt2, pt.shape[1])
                    ps = ps.reshape(-1, ps.shape[-1])
                    pt = pt.reshape(-1, pt.shape[-1])
                return (jnp.concatenate([ps, pt], axis=0),
                        jnp.concatenate([ms2, mt2]))

            candidates = (list(selected_domain[1:2])
                          + [_concat_dom(1), _concat_dom(2)])
            dom_logits, dom_m = next(
                (c for c in candidates
                 if c[0].shape[0] == pred_all.shape[0]), candidates[-1])
            loss_e = attentive_entropy(pred_all, dom_logits,
                                       m_all * dom_m)
            metrics["loss_e"] = loss_e
            loss = loss + scalars.gamma * loss_e

        # ---- (5) MCD discrepancy: second forward with GRL(mu) on the
        #      video features (main.py:547-556, models.py:682-684) ----
        if mcd:
            variables2 = {"params": params}
            if use_bn:
                # the reference's second (reverse) forward runs AFTER the
                # first, so BN normalizes with the same batch stats but
                # the RUNNING stats are updated a second time per step
                # (main.py:547-549 re-enters models.py:545 in train mode)
                variables2["batch_stats"] = new_stats
            res2 = model.apply(variables2, xs, xt, scalars.beta, scalars.mu,
                               True, True, rngs={"dropout": rng_mcd},
                               mutable=["batch_stats"] if use_bn else False,
                               combined_rows=rows,
                               mask_source=mask_s if use_bn else None,
                               mask_target=mask_t if use_bn else None)
            if use_bn:
                (_, out_t_rev), mut2 = res2
                new_stats = mut2["batch_stats"]
            else:
                _, out_t_rev = res2
            o1, _, m1 = _flatten_out(out_t_rev.out, yt, mask_t,
                                     cfg.baseline_type)
            o2, _, _ = _flatten_out(out_t_rev.out_2, yt, mask_t,
                                    cfg.baseline_type)
            loss_s = -dis_MCD(o1, o2, m1)
            metrics["loss_s"] = loss_s
            loss = loss + loss_s

        # ---- metrics (main.py:564-571) ----
        metrics["loss"] = loss
        metrics["top1"] = topk_correct(o, lab, m, 1)
        metrics["top5"] = topk_correct(o, lab, m, 5)
        metrics["n"] = jnp.sum(m)
        if return_aux:
            # attention values + video-level features for the epoch-level
            # attention logs (main.py:623-628) and tensorboard embeddings
            # (main.py:428-435)
            metrics["attn_s"] = out_s.attn
            metrics["attn_t"] = out_t.attn
            fi = min(1, len(out_s.feat) - 1)
            metrics["feat_s"] = out_s.feat[fi]
            metrics["feat_t"] = out_t.feat[fi]
        return loss, (new_stats, metrics)

    tp_constrain = _tp_param_constrainer(mesh)
    _pmask_cache = {}  # shape-key -> participation mask (trace-time)

    def _decay_mask(*fn_args):
        """torch.optim skips grad=None params ENTIRELY — no weight decay
        (main.py:578-581).  Our grads for backprop-unreached leaves are
        exact zeros, so ungated wd would walk them (full-lr drift under
        Adam's eps-normalized update).  Gate decay on the structural
        participation of each leaf; cached per input-shape signature
        (one extra abstract trace per compile, zero runtime cost)."""
        key = repr(jax.tree_util.tree_map(jnp.shape, fn_args[2:8]))
        if key not in _pmask_cache:
            mask = structural_participation(loss_fn, *fn_args)
            if all(jax.tree_util.tree_leaves(mask)):
                mask = None  # identical program to the unmasked one
            _pmask_cache[key] = mask
        return _pmask_cache[key]

    def _run(state: TrainState, xs, ys, mask_s, xt, yt, mask_t,
             scalars: StepScalars, rng, rows=None):
        # fold the step counter in ON DEVICE: the caller passes the same
        # rng array every step (no per-step host->device transfers, which
        # serialize the dispatch pipeline on tunneled runtimes)
        rng = jax.random.fold_in(rng, state.step)
        # tensor parallelism: large dense kernels column-sharded over the
        # mesh's 'model' axis (no-op on 1-D/DP meshes)
        params = tp_constrain(state.params)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, metrics)), grads = grad_fn(
            params, state.batch_stats, xs, ys, mask_s, xt, yt, mask_t,
            scalars, rng, rows)
        dmask = _decay_mask(params, state.batch_stats, xs, ys, mask_s,
                            xt, yt, mask_t, scalars, rng, rows)
        if hasattr(tx, "update_and_apply"):  # flat path: fused lr apply
            new_params, new_opt = tx.update_and_apply(
                grads, state.opt_state, params, scalars.lr,
                decay_mask=dmask)
        else:
            updates, new_opt = tx.update(grads, state.opt_state,
                                         decay_masked_params(params, dmask))
            new_params = apply_updates_with_lr(params, updates,
                                               scalars.lr)
        return TrainState(tp_constrain(new_params), new_stats, new_opt,
                          state.step + 1), metrics

    # TP mode: state in/out shardings are UNSPECIFIED (None) — the
    # in-step constraints shard the large kernels and GSPMD propagates
    # matching momentum shardings; pinning the state to rep here would
    # force an all-gather/reshard ping-pong every step
    st_sh = None if _tp_size(mesh) > 1 else "rep"

    if not gather_on_device:
        jit_kwargs = {}
        if mesh is not None:
            rep, data, _ = _mesh_shardings(mesh, axis_name)
            st = rep if st_sh == "rep" else None
            jit_kwargs = dict(
                in_shardings=(st, data, data, data, data, data, data,
                              rep, rep),
                out_shardings=(st, rep))
        jitted = _jit_lifted(_run, donate_argnums=(0,), **jit_kwargs)
        jitted.loss_fn = loss_fn
        jitted.tx = tx
        return jitted

    if combined_store_rows is not None:
        # combined-store path: both domains' stores packed into ONE HBM
        # array (source rows first, target rows at offset
        # combined_store_rows); the whole dual-stream batch is fetched by
        # ONE flat row gather already in the [(Bs+Bt)*S, D] layout the
        # frame stack consumes.  NOTE: measured slower than the
        # two-gather default on TPU (BENCH_NOTES "Combined-store
        # single-gather" negative result) — XLA fuses the entry concat
        # into the two gathers anyway.
        off = int(combined_store_rows)

        def _combined_gather_run(state, store, idx_s, ys, mask_s, idx_t,
                                 yt, mask_t, scalars, rng):
            if isinstance(store, (tuple, list)):
                raise TypeError(
                    "combined_store_rows does not support int8 "
                    "(q, scale) stores; use the default two-gather "
                    "path with --store_dtype int8")
            bs, bt = idx_s.shape[0], idx_t.shape[0]
            all_idx = jnp.concatenate(
                [idx_s.reshape(-1), idx_t.reshape(-1) + off])
            rows = store[all_idx]
            if rows.ndim == 3:  # Flow: interleave streams per frame
                rows = rows.reshape(rows.shape[0] * rows.shape[1], -1)
            spf = rows.shape[0] // (bs + bt)  # rows per video
            # zero the masked rows (the loader points them at row 0)
            m_rows = jnp.concatenate(
                [jnp.repeat(mask_s, spf), jnp.repeat(mask_t, spf)])
            rows = rows * m_rows[:, None].astype(rows.dtype)
            # xs/xt carry only static shape info into the model (their
            # values are dead code under combined_rows — DCE'd by XLA)
            xs = rows[:bs * spf].reshape(bs, spf, -1)
            xt = rows[bs * spf:].reshape(bt, spf, -1)
            return _run(state, xs, ys, mask_s, xt, yt, mask_t, scalars,
                        rng, rows=rows)

        jit_kwargs = {}
        if mesh is not None:
            rep, data, _ = _mesh_shardings(mesh, axis_name)
            st = rep if st_sh == "rep" else None
            jit_kwargs = dict(
                in_shardings=(st, rep, data, data, data, data, data,
                              data, rep, rep),
                out_shardings=(st, rep))

        return _jit_lifted(_combined_gather_run, donate_argnums=(0,),
                           **jit_kwargs)

    def _gather_run(state, store_s, idx_s, ys, mask_s, store_t, idx_t, yt,
                    mask_t, scalars, rng):
        xs = device_gather(store_s, idx_s)
        xt = device_gather(store_t, idx_t)
        # zero the masked rows (the loader points them at row 0)
        xs = xs * mask_s[:, None, None].astype(xs.dtype)
        xt = xt * mask_t[:, None, None].astype(xt.dtype)
        return _run(state, xs, ys, mask_s, xt, yt, mask_t, scalars, rng)

    jit_kwargs = {}
    if mesh is not None:
        # stores replicated (each chip gathers its own B/n rows locally),
        # index/label/mask batches sharded on the leading batch axis
        rep, data, _ = _mesh_shardings(mesh, axis_name)
        st = rep if st_sh == "rep" else None
        jit_kwargs = dict(
            in_shardings=(st, rep, data, data, data, rep, data, data,
                          data, rep, rep),
            out_shardings=(st, rep))

    return _jit_lifted(_gather_run, donate_argnums=(0,), **jit_kwargs)


def make_grad_accum_step(model: VideoModel, da: DAConfig,
                         train_cfg: TrainConfig,
                         class_weights: Optional[jnp.ndarray] = None,
                         domain_weights: Optional[jnp.ndarray] = None,
                         accum_steps: int = 2,
                         mesh=None, axis_name: str = "data"):
    """Gradient accumulation: G micro-batch pairs -> averaged gradients ->
    ONE clipped/weight-decayed momentum update (larger effective batches
    without larger per-forward memory; capability absent in the reference).

    Signature: step(state, xs [G,B,S,D], ys [G,B], mask_s [G,B],
                    xt, yt, mask_t, scalars, rng) -> (state, metrics [G])
    With ``mesh``, the stacked micro-batches are sharded on axis 1.
    """
    base = make_train_step(model, da, train_cfg, class_weights,
                           domain_weights)
    loss_fn, tx = base.loss_fn, base.tx
    del base

    jit_kwargs = {}
    if mesh is not None:
        rep, _, kdata = _mesh_shardings(mesh, axis_name)
        jit_kwargs = dict(
            in_shardings=(rep, kdata, kdata, kdata, kdata, kdata, kdata,
                          rep, rep),
            out_shardings=(rep, rep))

    def accum_step(state: TrainState, xs, ys, mask_s, xt, yt, mask_t,
                   scalars: StepScalars, rng):
        rng = jax.random.fold_in(rng, state.step)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def body(carry, per):
            stats, grads_acc, i = carry
            x_s, y_s, m_s, x_t, y_t, m_t = per
            (_, (new_stats, metrics)), grads = grad_fn(
                state.params, stats, x_s, y_s, m_s, x_t, y_t, m_t,
                scalars, jax.random.fold_in(rng, i))
            grads_acc = jax.tree_util.tree_map(
                lambda a, g: a + g / accum_steps, grads_acc, grads)
            return (new_stats, grads_acc, i + 1), metrics

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (new_stats, grads, _), metrics = jax.lax.scan(
            body, (state.batch_stats, zeros, 0),
            (xs, ys, mask_s, xt, yt, mask_t))
        # gate weight decay on backprop reachability (torch grad=None
        # semantics — see make_train_step._decay_mask)
        dmask = structural_participation(
            loss_fn, state.params, state.batch_stats, xs[0], ys[0],
            mask_s[0], xt[0], yt[0], mask_t[0], scalars, rng)
        if all(jax.tree_util.tree_leaves(dmask)):
            dmask = None
        if hasattr(tx, "update_and_apply"):
            new_params, new_opt = tx.update_and_apply(
                grads, state.opt_state, state.params, scalars.lr,
                decay_mask=dmask)
        else:
            updates, new_opt = tx.update(
                grads, state.opt_state,
                decay_masked_params(state.params, dmask))
            new_params = apply_updates_with_lr(state.params, updates,
                                               scalars.lr)
        return TrainState(new_params, new_stats, new_opt,
                          state.step + 1), metrics

    return _jit_lifted(accum_step, donate_argnums=(0,), **jit_kwargs)


def make_multi_train_step(model: VideoModel, da: DAConfig,
                          train_cfg: TrainConfig,
                          class_weights: Optional[jnp.ndarray] = None,
                          domain_weights: Optional[jnp.ndarray] = None,
                          mesh=None, axis_name: str = "data",
                          unroll: int = 1,
                          combined_store_rows: Optional[int] = None):
    """K optimizer steps per dispatch: lax.scan over stacked index batches
    against HBM-resident stores.

    On a tunneled / dispatch-latency-bound runtime each jit call costs
    ~0.7 ms regardless of work; scanning K steps inside one call amortizes
    it to ~0.7/K ms.  Signature:
      multi_step(state, store_s, idx_s [K,B,T], ys [K,B], mask_s [K,B],
                 store_t, idx_t, yt, mask_t, scalars (each field stacked
                 [K,...]), rng) -> (state, metrics stacked [K])
    With ``combined_store_rows=N`` the stores are ONE packed array and
    the signature drops store_t (see make_train_step):
      multi_step(state, store, idx_s, ys, mask_s, idx_t, yt, mask_t,
                 scalars, rng)

    With ``mesh`` the stacked batches are sharded on axis 1 (the batch
    axis), stores/state replicated: the flagship device-store production
    mode computes B/n per chip with gradient psum over ICI, exactly like
    the single-step sharded path (replaces main.py:79 DataParallel).
    """
    step_fn = make_train_step(model, da, train_cfg, class_weights,
                              domain_weights, gather_on_device=True,
                              mesh=mesh, axis_name=axis_name,
                              combined_store_rows=combined_store_rows).raw

    if combined_store_rows is not None:
        jit_kwargs = {}
        if mesh is not None:
            rep, _, kdata = _mesh_shardings(mesh, axis_name)
            st = None if _tp_size(mesh) > 1 else rep
            jit_kwargs = dict(
                in_shardings=(st, rep, kdata, kdata, kdata, kdata,
                              kdata, kdata, rep, rep),
                out_shardings=(st, rep))

        def multi_step_combined(state, store, idx_s, ys, mask_s, idx_t,
                                yt, mask_t, scalars: StepScalars, rng):
            def body(st, per_step):
                i_s, y_s, m_s, i_t, y_t, m_t, sc = per_step
                return step_fn(st, store, i_s, y_s, m_s, i_t, y_t, m_t,
                               sc, rng)

            xs = (idx_s, ys, mask_s, idx_t, yt, mask_t, scalars)
            return jax.lax.scan(body, state, xs, unroll=unroll)

        return _jit_lifted(multi_step_combined, donate_argnums=(0,),
                           **jit_kwargs)

    jit_kwargs = {}
    if mesh is not None:
        rep, _, kdata = _mesh_shardings(mesh, axis_name)
        st = None if _tp_size(mesh) > 1 else rep
        jit_kwargs = dict(
            in_shardings=(st, rep, kdata, kdata, kdata, rep, kdata,
                          kdata, kdata, rep, rep),
            out_shardings=(st, rep))

    def multi_step(state, store_s, idx_s, ys, mask_s, store_t, idx_t, yt,
                   mask_t, scalars: StepScalars, rng):
        def body(st, per_step):
            i_s, y_s, m_s, i_t, y_t, m_t, sc = per_step
            new_st, metrics = step_fn(st, store_s, i_s, y_s, m_s,
                                      store_t, i_t, y_t, m_t, sc, rng)
            return new_st, metrics

        xs = (idx_s, ys, mask_s, idx_t, yt, mask_t, scalars)
        # unroll > 1 lets XLA fuse across step boundaries (e.g. step i's
        # optimizer update with step i+1's forward), attacking the
        # ~140 us sub-3 us op tail of the op-count-bound step
        return jax.lax.scan(body, state, xs, unroll=unroll)

    return _jit_lifted(multi_step, donate_argnums=(0,), **jit_kwargs)


def make_sampled_multi_step(model: VideoModel, da: DAConfig,
                            train_cfg: TrainConfig,
                            sampler_s, sampler_t,
                            class_weights: Optional[jnp.ndarray] = None,
                            domain_weights: Optional[jnp.ndarray] = None,
                            mesh=None, axis_name: str = "data"):
    """K steps per dispatch with the index pipeline ON DEVICE.

    Like make_multi_train_step, but the per-step index/label/mask batches
    are generated inside the scan by DeviceSampler (epoch permutation +
    TSN sampling traced into the program, keyed off state.step) instead
    of being stacked on the host — the only per-call host->device
    traffic is the [K,...] schedule scalars (~100 B/step vs ~5 KB/step).
    K is implied by the scalars' leading dimension (jit re-specializes
    per distinct K, so a full-K program and one remainder program
    coexist in the cache).

    Signature: step(state, store_s, store_t, scalars[K,...], rng)
      -> (state, metrics stacked [K])

    With ``mesh`` the generated batches are sharding-constrained on the
    batch axis (data parallelism as in the host-fed path).
    """
    if sampler_s.steps_per_epoch != sampler_t.steps_per_epoch:
        raise ValueError(
            "sampler_s and sampler_t must share steps_per_epoch (the "
            "zip-shortest epoch coupling, main.py:330): set both to "
            "min(len(source_loader), len(target_loader)) — otherwise "
            "target batches silently desync from their epoch "
            "permutation")
    step_fn = make_train_step(model, da, train_cfg, class_weights,
                              domain_weights, gather_on_device=True,
                              mesh=mesh, axis_name=axis_name).raw

    constrain = _batch_constrainer(mesh, axis_name)

    jit_kwargs = {}
    if mesh is not None:
        rep, _, _ = _mesh_shardings(mesh, axis_name)
        st = None if _tp_size(mesh) > 1 else rep
        jit_kwargs = dict(in_shardings=(st, rep, rep, rep, rep),
                          out_shardings=(st, rep))

    def multi_step(state, store_s, store_t, scalars: StepScalars, rng):
        k = scalars.lr.shape[0]
        spe = sampler_s.steps_per_epoch  # == sampler_t's (zip-shortest)
        # hoist epoch permutations out of the scan: a K-step call touches
        # at most ceil(K/spe)+1 epochs; computing the sort-based
        # permutation per STEP measured slower than host feeding
        # (594.9k vs 630.3k videos/s) — per CALL it is amortized away
        n_epochs = -(-k // spe) + 1
        e0 = state.step // spe
        eids = e0 + jnp.arange(n_epochs)
        perms_s = jax.vmap(sampler_s.epoch_order)(eids)
        perms_t = jax.vmap(sampler_t.epoch_order)(eids)

        def body(st, sc):
            row = st.step // spe - e0
            idx_s, ys, ms = sampler_s.batch(st.step, perms_s[row])
            idx_t, yt, mt = sampler_t.batch(st.step, perms_t[row])
            idx_s, ys, ms = (constrain(idx_s), constrain(ys),
                             constrain(ms))
            idx_t, yt, mt = (constrain(idx_t), constrain(yt),
                             constrain(mt))
            return step_fn(st, store_s, idx_s, ys, ms,
                           store_t, idx_t, yt, mt, sc, rng)

        return jax.lax.scan(body, state, scalars)

    return _jit_lifted(multi_step, donate_argnums=(0,), **jit_kwargs)


def make_sampled_shard_multi_step(model: VideoModel, da: DAConfig,
                                  train_cfg: TrainConfig,
                                  sampler_s, sampler_t,
                                  steps_per_epoch: int,
                                  class_weights:
                                  Optional[jnp.ndarray] = None,
                                  domain_weights:
                                  Optional[jnp.ndarray] = None,
                                  mesh=None, axis_name: str = "data"):
    """Device-sampled K-step scan for the larger-than-HBM STREAMING mode
    (VERDICT r2 next-#7): like make_sampled_multi_step, but batches are
    generated shard-locally by StreamingDeviceSampler against the
    currently-resident shard buffers — the streamed path loses its last
    host sampler (reference scaling premise: dataset.py:53-66).

    Chunks never span shards (the ShardStream contract); the shard ids
    and within-shard step offsets arrive as TRACED int32 scalars so one
    compiled program (per distinct K) serves every chunk.

    Signature: step(state, shard_s, shard_t, scalars[K,...], rng,
                    sid_s, j0_s, sid_t, j0_t) -> (state, metrics [K])
    """
    step_fn = make_train_step(model, da, train_cfg, class_weights,
                              domain_weights, gather_on_device=True,
                              mesh=mesh, axis_name=axis_name).raw

    constrain = _batch_constrainer(mesh, axis_name)

    jit_kwargs = {}
    if mesh is not None:
        rep, _, _ = _mesh_shardings(mesh, axis_name)
        st = None if _tp_size(mesh) > 1 else rep
        jit_kwargs = dict(
            in_shardings=(st,) + (rep,) * 8, out_shardings=(st, rep))

    def shard_step(state, shard_s, shard_t, scalars: StepScalars, rng,
                   sid_s, j0_s, sid_t, j0_t):
        k = scalars.lr.shape[0]
        # chunks never span epochs (the Trainer chunks per epoch), so
        # the within-shard permutation is hoisted out of the scan
        epoch = state.step // steps_per_epoch
        order_s = sampler_s.shard_order(sid_s, epoch)
        order_t = sampler_t.shard_order(sid_t, epoch)

        def body(st, per):
            sc, j = per
            ai_s, ys, ms = sampler_s.shard_batch(sid_s, j0_s + j,
                                                 order_s, st.step)
            ai_t, yt, mt = sampler_t.shard_batch(sid_t, j0_t + j,
                                                 order_t, st.step)
            ai_s, ys, ms = constrain(ai_s), constrain(ys), constrain(ms)
            ai_t, yt, mt = constrain(ai_t), constrain(yt), constrain(mt)
            return step_fn(st, shard_s, ai_s, ys, ms,
                           shard_t, ai_t, yt, mt, sc, rng)

        return jax.lax.scan(body, state,
                            (scalars, jnp.arange(k, dtype=jnp.int32)))

    return _jit_lifted(shard_step, donate_argnums=(0,), **jit_kwargs)


def make_multi_eval_step(model: VideoModel,
                         class_weights: Optional[jnp.ndarray] = None,
                         mesh=None, axis_name: str = "data"):
    """Whole-validation-epoch eval in ONE dispatch (device-store mode).

    Scans the eval step over stacked index batches and reduces the
    metrics on device, so a validation pass costs one call + one
    4-scalar fetch instead of one dispatch + one device_get per batch
    (the reference's validate loop, main.py:669-761, synchronizes per
    batch).  Weighted sums match AverageMeter.update(value, n)
    accumulation exactly.

    Signature: ev(params, batch_stats, store, idx [Nb,B,T], ys [Nb,B],
                  mask [Nb,B]) -> {"loss_sum", "top1", "top5", "n"}
    """
    cfg = model.cfg
    use_bn = cfg.use_bn != "none"

    jit_kwargs = {}
    if mesh is not None:
        rep, _, kdata = _mesh_shardings(mesh, axis_name)
        pst = None if _tp_size(mesh) > 1 else rep
        jit_kwargs = dict(
            in_shardings=(pst, pst, rep, kdata, kdata, kdata),
            out_shardings=rep)

    def multi_eval(params, batch_stats, store, idx, ys, mask):
        variables = {"params": params}
        if use_bn:
            variables["batch_stats"] = batch_stats

        def body(acc, per):
            i, y, m = per
            x = device_gather(store, i)
            x = x * m[:, None, None].astype(x.dtype)
            _, out_t = model.apply(variables, x, x, jnp.zeros(3),
                                   jnp.asarray(0.0), False, False)
            o, lab, mm = _flatten_out(out_t.out, y, m, cfg.baseline_type)
            loss = weighted_cross_entropy(o, lab, class_weights, mm)
            n = jnp.sum(mm)
            acc = (acc[0] + loss * n,
                   acc[1] + topk_correct(o, lab, mm, 1),
                   acc[2] + topk_correct(o, lab, mm, 5),
                   acc[3] + n)
            return acc, None

        zero = jnp.asarray(0.0)
        (loss_sum, top1, top5, n), _ = jax.lax.scan(
            body, (zero, zero, zero, zero), (idx, ys, mask))
        return {"loss_sum": loss_sum, "top1": top1, "top5": top5, "n": n}

    return _jit_lifted(multi_eval, **jit_kwargs)


def make_eval_step(model: VideoModel,
                   class_weights: Optional[jnp.ndarray] = None,
                   gather_on_device: bool = False,
                   mesh=None, axis_name: str = "data"):
    """Jitted validation step (reference validate(), main.py:669-761):
    the batch is fed as BOTH streams with beta=0; the target-side outputs
    are consumed.  With gather_on_device, x is a (store, abs_idx) pair.
    With ``mesh``, the batch is sharded over the mesh (params replicated);
    the batch size must then be a multiple of the mesh size (the Trainer
    pads via pad_to_multiple + masks)."""
    cfg = model.cfg
    jit_kwargs = {}
    if mesh is not None:
        rep, data, _ = _mesh_shardings(mesh, axis_name)
        # TP meshes: params arrive with their training shardings (large
        # kernels column-sharded over 'model') — accept them as-is
        pst = None if _tp_size(mesh) > 1 else rep
        if gather_on_device:
            in_sh = (pst, pst, rep, data, data, data)
        else:
            in_sh = (pst, pst, data, data, data)
        jit_kwargs = dict(in_shardings=in_sh, out_shardings=rep)

    def _eval(params, batch_stats, x, y, mask):
        variables = {"params": params}
        if cfg.use_bn != "none":
            variables["batch_stats"] = batch_stats
        _, out_t = model.apply(variables, x, x, jnp.zeros(3),
                               jnp.asarray(0.0), False, False)
        o, lab, m = _flatten_out(out_t.out, y, mask, cfg.baseline_type)
        loss = weighted_cross_entropy(o, lab, class_weights, m)
        return {
            "loss": loss,
            "top1": topk_correct(o, lab, m, 1),
            "top5": topk_correct(o, lab, m, 5),
            "n": jnp.sum(m),
            "logits": o,
            # video-level feature for embeddings (feat[1] in the reference,
            # main.py:430; tsn/frame baselines expose fewer entries)
            "feat": out_t.feat[min(1, len(out_t.feat) - 1)],
        }

    if not gather_on_device:
        return _jit_lifted(_eval, **jit_kwargs)

    def _eval_gather(params, batch_stats, store, idx, y, mask):
        x = device_gather(store, idx)
        x = x * mask[:, None, None].astype(x.dtype)
        return _eval(params, batch_stats, x, y, mask)

    return _jit_lifted(_eval_gather, **jit_kwargs)
