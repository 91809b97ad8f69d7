"""Vmapped ensemble training: N independent runs advance in ONE step.

No reference counterpart (beating, not matching): the reference executes
sweeps strictly sequentially — edit `script_train_val.sh`, rerun, repeat
(its published tables are exactly such seed/variant grids).  Here a seed
ensemble or hyper-parameter sweep is ONE jitted program.

TPU rationale: the flagship step is op-count-bound — ~270 µs of device
time spread over ~800 ops whose GEMMs sit far below MXU saturation
(BENCH_NOTES.md "Speed-of-light accounting").  `jax.vmap` adds a member
axis to every GEMM without adding ops, so N members cost far less than
N sequential runs (measured A/B in BENCH_NOTES.md "Ensemble training").
With a mesh, the member axis shards across chips with ZERO collectives:
members are independent, so unlike data parallelism there is no gradient
all-reduce — sweep scaling is embarrassingly parallel over ICI.

Supported axes of variation per member:
  * init/dropout seed — `create_ensemble_state` stacks N independent
    inits (member k bitwise-equals a solo run seeded with key k);
  * every schedule scalar — StepScalars stacked `[N, ...]` gives each
    member its own lr/alpha/beta/gamma/mu.  Schedule scalars were
    already traced arguments (design invariant: never baked into the
    trace), so a hyper-parameter sweep is a batched argument, not a
    recompile;
  * the data stream — `per_member_data=True` adds a leading member axis
    to batches/indices; the default shares one stream across members
    (the classic seed-variance protocol).

Both the host-fed and the HBM-resident device-store paths are covered;
`make_ensemble_multi_step` scans K steps per dispatch like the
production `make_multi_train_step`.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, TrainConfig
from ta3n_tpu.models import VideoModel
from ta3n_tpu.train.step import (StepScalars, TrainState,
                                 create_train_state, make_eval_step,
                                 make_train_step)

__all__ = ["ensemble_keys", "create_ensemble_state", "make_ensemble_step",
           "make_ensemble_multi_step", "make_ensemble_eval_step",
           "make_ensemble_mesh", "stack_scalars", "extract_member"]


def ensemble_keys(seeds: Sequence[int]) -> jax.Array:
    """[N, key_width] stacked PRNG keys (key_width = 2 for threefry,
    4 for the production-default rbg impl), identical to each solo run's
    `jax.random.PRNGKey(seed)` (so ensemble members are directly
    comparable against solo trainings with the same seeds)."""
    return jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])


def create_ensemble_state(model: VideoModel, seeds: Sequence[int],
                          batch_source: int, batch_target: int,
                          train_cfg: TrainConfig) -> TrainState:
    """TrainState whose every leaf carries a leading member axis [N, ...]
    — N independent inits (vmapped create_train_state)."""
    keys = ensemble_keys(seeds)
    return jax.vmap(lambda k: create_train_state(
        model, k, batch_source, batch_target, train_cfg))(keys)


def stack_scalars(scalars_list: Sequence[StepScalars]) -> StepScalars:
    """Stack per-member StepScalars into the [N, ...] layout
    make_ensemble_step consumes (per_member_scalars=True).  Stacks on
    the HOST (numpy): schedule scalars are computed host-side every
    step, and keeping them numpy until the dispatch avoids tiny
    device<->host round-trips in sweep drivers' epoch loops."""
    return jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]),
        *scalars_list)


def extract_member(state: TrainState, k: int) -> TrainState:
    """Member k's solo-shaped TrainState (host numpy leaves, so the
    result is checkpointable and restorable on any topology — the same
    invariant io_utils.checkpoint keeps).  The extracted state is a
    drop-in for a solo Trainer/eval: sweep with the ensemble, pick the
    winner, checkpoint it, fine-tune or serve it solo."""
    return jax.tree_util.tree_map(lambda l: np.asarray(l)[k], state)


def make_ensemble_mesh(member_shards: int, devices=None):
    """(member × data) 2-D mesh: `member_shards`-way sharding of the
    member axis, with the remaining devices data-parallelizing WITHIN
    each member (gradient psum over 'data' only — members never
    communicate).  This is the production shape for flagship-scale
    sweeps: at the published batch one member already fills the MXU
    (BENCH_NOTES "Ensemble training"), so extra chips should split each
    member's batch, not stack more members per chip."""
    from jax.sharding import Mesh
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % member_shards:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"member_shards={member_shards}")
    arr = np.array(devices).reshape(member_shards, -1)
    return Mesh(arr, ("member", "data"))


def _axes_and_kinds(gather_on_device: bool, per_member_data: bool,
                    per_member_scalars: bool):
    d = 0 if per_member_data else None
    sc = 0 if per_member_scalars else None
    if gather_on_device:
        # (state, store_s, idx_s, ys, mask_s, store_t, idx_t, yt, mask_t,
        #  scalars, rng) — stores always shared (one HBM copy serves all
        # members; the per-member gathers read from it)
        in_axes = (0, None, d, d, d, None, d, d, d, sc, 0)
        kinds = ("state", "store", "batch", "batch", "batch", "store",
                 "batch", "batch", "batch", "scalars", "rng")
    else:
        # (state, xs, ys, mask_s, xt, yt, mask_t, scalars, rng)
        in_axes = (0, d, d, d, d, d, d, sc, 0)
        kinds = ("state", "batch", "batch", "batch", "batch", "batch",
                 "batch", "scalars", "rng")
    return in_axes, kinds


def _sharding_rules(mesh, axis_name: str):
    """Per-kind shardings for 1-D member-only meshes (legacy: members
    over `axis_name`, shared batches replicated) and 2-D
    (member × data) meshes from make_ensemble_mesh (shared batches
    split over 'data', per-member batches over both axes)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    two_d = "member" in mesh.axis_names
    mem = "member" if two_d else axis_name
    dat = "data" if two_d else None
    member = NamedSharding(mesh, P(mem))
    rep = NamedSharding(mesh, P())
    batch_shared = NamedSharding(mesh, P(dat)) if dat else rep
    batch_member = NamedSharding(mesh, P(mem, dat)) if dat else member

    def sh(kind: str, axis, scanned: bool = False):
        if kind in ("state", "rng"):
            s = member
        elif kind == "store":
            s = rep
        elif kind == "scalars":
            s = member if axis == 0 else rep
        else:  # batch
            s = batch_member if axis == 0 else batch_shared
        if scanned and s is not rep:
            s = NamedSharding(mesh, P(None, *s.spec))
        return s

    return member, sh


def make_ensemble_step(model: VideoModel, da: DAConfig,
                       train_cfg: TrainConfig,
                       class_weights=None, domain_weights=None, *,
                       gather_on_device: bool = False,
                       per_member_data: bool = False,
                       per_member_scalars: bool = True,
                       mesh=None, axis_name: str = "data"):
    """One vmapped optimizer step for every ensemble member.

    Signature = make_train_step's with a leading member axis on: state
    (always), rng (always), scalars (iff per_member_scalars), batches /
    index batches (iff per_member_data).  Feature stores are never
    stacked — one HBM-resident copy serves every member.

    With a 1-D ``mesh`` the member axis is sharded over ``axis_name``
    and everything shared is replicated: each chip trains N/n members
    with no inter-chip communication at all (compare the DP path, which
    all-reduces gradients every step).  With a 2-D mesh from
    ``make_ensemble_mesh`` the member axis shards over 'member' and the
    BATCH axis over 'data' — each member is itself data-parallel
    (gradient psum over 'data' only), the right shape when one member
    already fills the MXU."""
    base = make_train_step(model, da, train_cfg, class_weights,
                           domain_weights,
                           gather_on_device=gather_on_device).raw
    in_axes, kinds = _axes_and_kinds(gather_on_device, per_member_data,
                                     per_member_scalars)
    vstep = jax.vmap(base, in_axes=in_axes)

    jit_kwargs = {}
    if mesh is not None:
        member, sh = _sharding_rules(mesh, axis_name)
        in_sh = tuple(sh(k, a) for k, a in zip(kinds, in_axes))
        jit_kwargs = dict(in_shardings=in_sh,
                          out_shardings=(member, member))
    step = jax.jit(vstep, donate_argnums=(0,), **jit_kwargs)
    step.raw = vstep
    return step


def make_ensemble_multi_step(model: VideoModel, da: DAConfig,
                             train_cfg: TrainConfig,
                             class_weights=None, domain_weights=None, *,
                             per_member_data: bool = False,
                             per_member_scalars: bool = True,
                             mesh=None, axis_name: str = "data",
                             unroll: int = 1):
    """K ensemble steps per dispatch (lax.scan), device-store path.

    Signature: multi(state, store_s, idx_s, ys, mask_s, store_t, idx_t,
    yt, mask_t, scalars, rng) where per-step args are stacked [K, ...]
    (with the member axis after K when per-member: idx [K, N, B, T],
    scalars leaves [K, N]); rng is the [N, key_width] member keys
    (step-folded on device like every step builder).  The production
    sweep mode: one dispatch advances N runs by K steps."""
    vstep = make_ensemble_step(
        model, da, train_cfg, class_weights, domain_weights,
        gather_on_device=True, per_member_data=per_member_data,
        per_member_scalars=per_member_scalars, mesh=None).raw

    in_axes, kinds = _axes_and_kinds(True, per_member_data,
                                     per_member_scalars)

    jit_kwargs = {}
    if mesh is not None:
        member, sh = _sharding_rules(mesh, axis_name)
        # state, store_s, idx_s, ys, mask_s, store_t, idx_t, yt, mask_t,
        # scalars, rng — the per-step args (idx/label/mask/scalars) carry
        # the extra leading K axis
        scanned = (False, False, True, True, True, False, True, True,
                   True, True, False)
        in_sh = tuple(sh(k, a, s)
                      for k, a, s in zip(kinds, in_axes, scanned))
        # state keeps the member axis leading; scanned metrics come out
        # stacked [K, N, ...] — member axis second
        kmember = sh("state", 0, scanned=True)
        jit_kwargs = dict(in_shardings=in_sh,
                          out_shardings=(member, kmember))

    @partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def multi(state, store_s, idx_s, ys, mask_s, store_t, idx_t, yt,
              mask_t, scalars: StepScalars, rng):
        def body(st, per_step):
            i_s, y_s, m_s, i_t, y_t, m_t, sc = per_step
            return vstep(st, store_s, i_s, y_s, m_s, store_t, i_t,
                         y_t, m_t, sc, rng)

        xs = (idx_s, ys, mask_s, idx_t, yt, mask_t, scalars)
        return jax.lax.scan(body, state, xs, unroll=unroll)

    return multi


def make_ensemble_eval_step(model: VideoModel, class_weights=None, *,
                            gather_on_device: bool = False,
                            mesh=None, axis_name: str = "data"):
    """Vmapped validation: every member evaluates the SAME batch in one
    dispatch (params/batch_stats carry the member axis, the batch is
    shared).  Signature = make_eval_step's; returns metrics with a
    leading member axis.  With ``mesh``, members shard over the mesh
    like make_ensemble_step."""
    base = make_eval_step(model, class_weights,
                          gather_on_device=gather_on_device).raw
    n_batch = 4 if gather_on_device else 3
    in_axes = (0, 0) + (None,) * n_batch
    veval = jax.vmap(base, in_axes=in_axes)
    jit_kwargs = {}
    if mesh is not None:
        member, sh = _sharding_rules(mesh, axis_name)
        kinds = (("store",) if gather_on_device else ()) + ("batch",) * 3
        jit_kwargs = dict(
            in_shardings=(member, member)
            + tuple(sh(k, None) for k in kinds),
            out_shardings=member)
    step = jax.jit(veval, **jit_kwargs)
    step.raw = veval
    return step
