"""Sweep runner: train a (seed, lr, alpha) member grid as ONE vmapped
program (train/ensemble.py) against real TSNLoader streams.

The reference's sweep workflow is "edit script_train_val.sh, rerun"
(its published tables are such grids); here the whole grid advances in
one jitted multi-step per epoch with per-member schedule scalars, then
validates through the vmapped eval step and optionally writes each
member as a standard solo checkpoint.  Shared by
scripts/ensemble_sweep.py (synthetic rotation benchmark) and
cli/sweep.py (real feature stores, full train-CLI flag surface).

Data protocol: one shared stream for every member (the loaders' own
order) — members differ in init/dropout seed and hyper-parameters, the
classic controlled-sweep setup.  Measured cost on the TPU:
BENCH_NOTES.md "Ensemble training".
"""

from __future__ import annotations

import itertools
import json
import os
import time
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

from ta3n_tpu.train.ensemble import (create_ensemble_state, ensemble_keys,
                                     extract_member,
                                     make_ensemble_eval_step,
                                     make_ensemble_multi_step,
                                     stack_scalars)
from ta3n_tpu.train.schedules import dann_lr, effective_beta, progress
from ta3n_tpu.train.step import StepScalars

__all__ = ["run_sweep", "pad_members"]


def _restack_members(save_dir: str, n: int, n_padded: int,
                     template_state):
    """Inverse of _save_members: stack the member_XX/checkpoint states
    (e.g. a preempted sweep's emergency saves) back into one ensemble
    TrainState; padded slots replay member 0.  ``template_state``: a
    solo-shaped TrainState for typed orbax restoration (optax states
    are NamedTuples that an untyped restore flattens to dicts).
    Returns (state, start_epoch)."""
    import jax.numpy as jnp

    from ta3n_tpu.io_utils.checkpoint import load_checkpoint
    from ta3n_tpu.train.step import TrainState

    tmpl = {"epoch": 0, "arch": "x", "params": template_state.params,
            "batch_stats": template_state.batch_stats,
            "opt_state": template_state.opt_state,
            "best_prec1": 0.0, "prec1": 0.0, "step": 0}
    payloads = [load_checkpoint(os.path.join(save_dir, f"member_{k:02d}",
                                             "checkpoint"),
                                template=tmpl)
                for k in range(n)]
    epochs = {int(p["epoch"]) for p in payloads}
    if len(epochs) != 1:
        raise ValueError("member checkpoints disagree on epoch: "
                         f"{sorted(epochs)} — not one sweep's save set")
    idx = list(range(n)) + [0] * (n_padded - n)

    def stack(key):
        return jax.tree_util.tree_map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]),
            *[payloads[i][key] for i in idx])

    bs_list = [payloads[i].get("batch_stats") or {} for i in idx]
    batch_stats = stack("batch_stats") if all(bs_list) else {}
    step = np.asarray([int(payloads[i]["step"]) for i in idx], np.int32)
    state = TrainState(stack("params"), batch_stats, stack("opt_state"),
                       jnp.asarray(step))
    return state, epochs.pop() + 1


def _save_one_member(host_state, k: int, save_dir: str, arch: str,
                     epoch: int, prec1: float, best_prec1: float,
                     is_best: bool) -> str:
    """One member of an (already host-fetched) stacked state -> a
    standard solo checkpoint under member_XX/ (is_best additionally
    copies it to member_XX/model_best, like Trainer.save)."""
    from ta3n_tpu.io_utils import save_checkpoint
    member = extract_member(host_state, k)
    d = os.path.join(save_dir, f"member_{k:02d}")
    save_checkpoint(d + "/", {
        "epoch": epoch, "arch": arch,
        "params": member.params,
        "batch_stats": member.batch_stats,
        "opt_state": member.opt_state,
        "best_prec1": float(best_prec1), "prec1": float(prec1),
        "step": int(member.step),
    }, is_best=is_best)
    return d + "/checkpoint"


def _save_members(state, n: int, save_dir, arch, epoch, top1, best=None):
    """Write members 0..n-1 as solo checkpoints; returns the paths.
    ``best``: running best-top1 per member (defaults to top1), recorded
    as best_prec1 like the Trainer's checkpoints."""
    # ONE device->host transfer of the stacked tree; extract_member on
    # the host copy just slices (per-member extraction would refetch the
    # full ensemble N times — costly over the TPU tunnel, and this also
    # runs inside the SIGTERM grace window)
    state = jax.tree_util.tree_map(np.asarray, state)
    return [_save_one_member(
        state, k, save_dir, arch, epoch, float(top1[k]),
        float(max(top1[k], best[k])) if best is not None else
        float(top1[k]), False) for k in range(n)]


def pad_members(members: Sequence[Tuple], member_shards: int,
                log=print) -> list:
    """Pad the member list to a multiple of the mesh's member axis
    (duplicates of member 0 — their results are dropped)."""
    members = list(members)
    if member_shards > 1 and len(members) % member_shards:
        pad = -len(members) % member_shards
        log(f"# padded {len(members)} members to {len(members) + pad} "
            f"(member axis {member_shards})")
        members += members[:1] * pad
    return members


def run_sweep(model_cfg, da_cfg, train_cfg, source_loader, target_loader,
              val_loader, members: Sequence[Tuple[int, float, float]], *,
              dann_lr_decay: bool = False, mesh=None,
              class_weights=None, domain_weights=None,
              save_dir: Optional[str] = None, arch: str = "none",
              eval_freq: int = 0, resume: bool = False,
              store_dtype: Optional[str] = None, log=print) -> dict:
    """Train every (seed, lr, alpha) member and return
    {"results": [{member, seed, lr, alpha, top1, checkpoint?}, ...],
    "train_wall_s": float}.

    train_cfg supplies epochs / batch sizes / beta / gamma / mu; lr and
    alpha come per member.  Negative beta entries follow the DANN ramp
    exactly like the Trainer (schedules.effective_beta).

    eval_freq > 0 validates every E epochs (the Trainer's -ef
    semantics, vmapped): rows then carry best_top1/best_epoch and, with
    save_dir, each member's best state lands in member_XX/model_best
    alongside the final member_XX/checkpoint.  eval_freq == 0 keeps the
    cheap final-only validation.

    resume=True restacks save_dir's member_XX/checkpoint states (e.g.
    the emergency saves of a preempted sweep) and continues from their
    step counter (authoritative over the meta epoch: an interrupt can
    land between a dispatch and its epoch bookkeeping); the shared
    loader streams are fast-forwarded, so deterministic-loader setups
    reproduce the uninterrupted trajectory exactly.  The sweep's
    identity (members/epochs/spe/batches) is recorded in
    save_dir/sweep_meta.json and verified on resume, and best tracking
    is seeded from the persisted member_XX/model_best metas."""
    from ta3n_tpu.models import VideoModel

    n = len(members)
    member_shards = 1
    if mesh is not None:
        member_shards = (mesh.shape["member"] if "member" in mesh.axis_names
                         else mesh.size)
        data_par = mesh.shape.get("data", 1) if "member" in mesh.axis_names \
            else 1
        # all three batches shard over 'data': train batches in the
        # multi-step, the VAL batch in the vmapped eval — checking only
        # the train sizes would fail hours later at the first eval
        # dispatch
        for b in train_cfg.batch_size:
            if b % data_par:
                raise ValueError(
                    f"batch size {b} not divisible by the mesh's data "
                    f"axis ({data_par})")
    members = pad_members(members, member_shards, log=log)

    model = VideoModel(model_cfg)
    bs, bt = train_cfg.batch_size[0], train_cfg.batch_size[1]
    seeds = [m[0] for m in members]
    spe = min(len(source_loader), len(target_loader))
    best_top1 = np.full(len(members), -1.0)
    best_epoch = np.zeros(len(members), np.int64)

    # sweep identity: written at sweep start, verified on resume — a
    # resume under different members/epochs/spe/batches would silently
    # continue member k's state under member j's schedule otherwise
    ident = {"members": [list(m) for m in members[:n]],
             "epochs": int(train_cfg.epochs), "spe": int(spe),
             "batch_size": [int(b) for b in train_cfg.batch_size]}
    meta_path = (os.path.join(save_dir, "sweep_meta.json")
                 if save_dir else None)

    start_epoch = 1
    if resume:
        if not save_dir:
            raise ValueError("resume=True requires save_dir (the sweep's "
                             "member checkpoints live there)")
        if meta_path and os.path.exists(meta_path):
            with open(meta_path) as f:
                prev = json.load(f)
            if prev != ident:
                raise ValueError(
                    "resume with a different sweep configuration: "
                    f"saved {prev} vs current {ident}")
        from ta3n_tpu.train.step import create_train_state
        template = create_train_state(model, jax.random.PRNGKey(0), bs,
                                      bt, train_cfg)
        state, start_epoch = _restack_members(save_dir, n, len(members),
                                              template)
        # the step counter is authoritative: an interrupt in the window
        # between an epoch's dispatch and its bookkeeping saves state
        # that already contains epoch E labeled E-1 — resuming from the
        # meta epoch would train E twice on an advanced state
        step0 = int(np.asarray(state.step)[0])
        if step0 // spe != start_epoch - 1:
            log(f"# meta epoch {start_epoch - 1} != step-derived "
                f"{step0 // spe}; trusting the step counter")
            start_epoch = step0 // spe + 1
        # seed best tracking from the persisted model_best metas so a
        # pre-preemption best survives the resume
        for k in range(n):
            mb_meta = os.path.join(save_dir, f"member_{k:02d}",
                                   "model_best.meta.json")
            if os.path.exists(mb_meta):
                with open(mb_meta) as f:
                    mm = json.load(f)
                best_top1[k] = float(mm.get("best_prec1", -1.0))
                best_epoch[k] = int(mm.get("epoch", 0))
        log(f"# resumed sweep from {save_dir} at epoch {start_epoch}")
    else:
        state = create_ensemble_state(model, seeds, bs, bt, train_cfg)
        if meta_path:
            os.makedirs(save_dir, exist_ok=True)
            with open(meta_path, "w") as f:
                json.dump(ident, f)
    keys = ensemble_keys(seeds)
    multi = make_ensemble_multi_step(model, da_cfg, train_cfg,
                                     class_weights, domain_weights,
                                     mesh=mesh)
    total_steps = spe * train_cfg.epochs

    def _put_store(store):
        # same --store_dtype semantics as the Trainer (loop.py): bf16
        # halves HBM residency, int8 quarters it via per-row (q, scale)
        # quantization dequantized on device (data/quantized.py); one
        # copy serves every member either way.  Disk-quantized stores
        # ship their (q, scale) pair as-is.
        if store.quantized:
            return jax.device_put(
                (np.ascontiguousarray(store.features),
                 np.ascontiguousarray(store.scales)))
        arr = np.ascontiguousarray(store.features)
        if store_dtype and np.dtype(store_dtype) == np.int8:
            from ta3n_tpu.data.quantized import quantize_rows
            return jax.device_put(quantize_rows(arr))
        if store_dtype and arr.dtype != np.dtype(store_dtype):
            arr = arr.astype(store_dtype)
        return jax.device_put(arr)

    store_s = _put_store(source_loader.store)
    store_t = _put_store(target_loader.store)

    # vmapped validation, reused by the periodic and final passes:
    # every member scores the val split together, and the deep-ensemble
    # score comes for free (the eval already holds every member's
    # logits — average the softmax over the REAL members, pads
    # excluded; frame/tsn baselines expand logits per frame, so the
    # ensemble score is skipped there rather than mis-aligning rows).
    # Eval structures build lazily on the first validation so the
    # eval_freq=0 path keeps the val store OUT of device memory for the
    # whole training run
    _ev = {}

    def validate():
        if not _ev:
            _ev["step"] = make_ensemble_eval_step(
                model, class_weights, gather_on_device=True, mesh=mesh)
            _ev["store"] = _put_store(val_loader.store)
        ev, store_v = _ev["step"], _ev["store"]
        hits = np.zeros(len(members))
        count = np.zeros(len(members))
        ens_hits, ens_count = 0.0, 0.0
        for b in val_loader.index_epoch():
            m = ev(state.params, state.batch_stats, store_v,
                   b.abs_indices, b.labels, b.mask)
            hits += np.asarray(m["top1"])
            count += np.asarray(m["n"])
            logits = np.asarray(m["logits"][:n], np.float64)
            if logits.shape[1] == len(b.labels):
                probs = np.exp(logits - logits.max(-1, keepdims=True))
                probs /= probs.sum(-1, keepdims=True)
                pred = probs.mean(axis=0).argmax(-1)
                mask = np.asarray(b.mask)
                ens_hits += float(((pred == b.labels) * mask).sum())
                ens_count += float(mask.sum())
        top1 = 100.0 * hits / np.maximum(count, 1)
        ens = (round(100.0 * ens_hits / ens_count, 2)
               if ens_count else None)
        return top1, ens

    if start_epoch > train_cfg.epochs:
        raise ValueError(
            f"nothing to resume: checkpoints are at epoch "
            f"{start_epoch - 1} of {train_cfg.epochs}")
    t0 = time.time()
    gstep = (start_epoch - 1) * spe
    # fast-forward the shared streams past the completed epochs so a
    # resumed sweep consumes exactly the batches the uninterrupted run
    # would have (deterministic loaders -> exact trajectory continuation)
    for _ in range(start_epoch - 1):
        list(itertools.islice(source_loader.index_epoch(), spe))
        list(itertools.islice(target_loader.index_epoch(), spe))
    epochs_done = start_epoch - 1
    final_scores = None  # (top1, ensemble_top1) of the LAST epoch
    try:
        from ta3n_tpu.train.loop import _sigterm_as_interrupt
        with _sigterm_as_interrupt():
            for _epoch in range(start_epoch, train_cfg.epochs + 1):
                # one dispatch per epoch: spe stacked index batches
                # (shared stream) + per-member schedule scalars [spe, N]
                # — all numpy, so the schedule block ships with the one
                # dispatch
                b_s = list(itertools.islice(source_loader.index_epoch(),
                                            spe))
                b_t = list(itertools.islice(target_loader.index_epoch(),
                                            spe))
                idx_s = np.stack([b.abs_indices for b in b_s])
                ys = np.stack([b.labels for b in b_s])
                ms = np.stack([b.mask for b in b_s])
                idx_t = np.stack([b.abs_indices for b in b_t])
                yt = np.stack([b.labels for b in b_t])
                mt = np.stack([b.mask for b in b_t])
                sc_steps = []
                for i in range(spe):
                    p = progress(gstep + i, 0, total_steps)
                    beta = np.float32(effective_beta(train_cfg.beta, p))
                    per_member = [StepScalars(
                        beta, np.float32(train_cfg.mu),
                        np.float32(alpha), np.float32(train_cfg.gamma),
                        np.float32(dann_lr(lr, p) if dann_lr_decay
                                   else lr))
                        for (_, lr, alpha) in members]
                    sc_steps.append(stack_scalars(per_member))
                sc = jax.tree_util.tree_map(lambda *xs: np.stack(xs),
                                            *sc_steps)
                state, metrics = multi(state, store_s, idx_s, ys, ms,
                                       store_t, idx_t, yt, mt, sc, keys)
                gstep += spe
                epochs_done = _epoch

                if eval_freq and (_epoch % eval_freq == 0
                                  or _epoch == train_cfg.epochs):
                    # periodic vmapped validation (the Trainer's -ef
                    # semantics): track each member's best epoch and
                    # persist it to member_XX/model_best IMMEDIATELY, so
                    # the best survives preemption AND resume seeds from
                    # it.  The full state is fetched only when some
                    # member actually improved (the transfer is the
                    # dominant tunnel cost)
                    top1_e, ens_e = validate()
                    improved = [k for k in range(n)
                                if top1_e[k] > best_top1[k]]
                    for k in improved:
                        best_top1[k] = top1_e[k]
                        best_epoch[k] = _epoch
                    if save_dir and improved:
                        host = jax.tree_util.tree_map(np.asarray, state)
                        for k in improved:
                            _save_one_member(host, k, save_dir, arch,
                                             _epoch, float(top1_e[k]),
                                             float(best_top1[k]),
                                             is_best=True)
                    if _epoch == train_cfg.epochs:
                        final_scores = (top1_e, ens_e)

            # dispatch is ASYNC on this runtime: the loop above only
            # enqueues work, so (without periodic eval) the real
            # training wall-time is spent in this fetch — it must sit
            # INSIDE the protected region for a preemption during
            # execution to reach the emergency handler.  (The [spe, N]
            # losses also feed per-row divergence reporting.)
            final_loss = np.asarray(metrics["loss"])[-1]
            train_s = time.time() - t0

            # final validation (also protected: an eval-time failure
            # must not discard the trained sweep) unless the periodic
            # pass already scored the last epoch
            if final_scores is None:
                final_scores = validate()
    except BaseException:
        # preemption/crash mid-sweep (or mid-eval): save every member's
        # resumable state before re-raising (the Trainer's
        # emergency-checkpoint behavior, applied to sweeps; SIGTERM is
        # converted by loop._sigterm_as_interrupt above)
        if save_dir and epochs_done >= 1:
            _save_members(state, n, save_dir, arch, epochs_done,
                          np.full(n, -1.0),
                          best=best_top1[:n] if eval_freq else None)
            log(f"emergency sweep checkpoints saved at epoch "
                f"{epochs_done} -> {save_dir}")
        raise
    top1, ensemble_top1 = final_scores

    paths = (_save_members(state, n, save_dir, arch, train_cfg.epochs,
                           top1, best=best_top1[:n] if eval_freq
                           else None)
             if save_dir else None)
    results = []
    for k, (seed, lr, alpha) in enumerate(members[:n]):
        finite = bool(np.isfinite(final_loss[k]))
        row = {"member": k, "seed": seed, "lr": lr, "alpha": alpha,
               "top1": round(float(top1[k]), 2),
               # None (JSON null) for non-finite values: bare NaN is not
               # valid JSON and breaks non-Python manifest consumers
               "final_loss": (round(float(final_loss[k]), 4)
                              if finite else None)}
        if eval_freq:
            row["best_top1"] = round(float(best_top1[k]), 2)
            row["best_epoch"] = int(best_epoch[k])
            mb = os.path.join(save_dir or "", f"member_{k:02d}",
                              "model_best")
            if save_dir and os.path.isdir(mb):
                row["best_checkpoint"] = mb
        if not finite:
            row["diverged"] = True
            log(f"# member {k} (seed {seed}, lr {lr}, alpha {alpha}) "
                f"diverged: final loss {final_loss[k]}")
        if paths:
            row["checkpoint"] = paths[k]
        results.append(row)
    if save_dir:
        with open(os.path.join(save_dir, "sweep.json"), "w") as f:
            json.dump(results, f, indent=1)
        log(f"# saved {n} member checkpoints -> {save_dir}")
    return {"results": results, "train_wall_s": round(train_s, 1),
            "ensemble_top1": ensemble_top1}
