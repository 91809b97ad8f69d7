"""The training driver: epoch loop, validation, checkpointing, logging.

Reference-parity runtime (main.py:33-306 `main()` + `train()` +
`validate()`), re-organized around the single jitted train step:
per-batch Python work is limited to schedule arithmetic and meter updates.
"""

from __future__ import annotations

import contextlib
import math
import os
import signal
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.config import DAConfig, ModelConfig, TrainConfig
from ta3n_tpu.data import (FeatureStore, TSNLoader, epoch_balance_counts,
                           parse_list_file, prefetch)
from ta3n_tpu.io_utils import AverageMeter, LogFiles, save_checkpoint
from ta3n_tpu.io_utils.checkpoint import load_checkpoint
from ta3n_tpu.models import VideoModel
from ta3n_tpu.parallel import make_mesh
from ta3n_tpu.train.schedules import (alpha_schedule, dann_lr,
                                      effective_beta, loss_plateau_lr,
                                      progress, step_decay_lr)
from ta3n_tpu.train.step import (StepScalars, create_train_state,
                                 make_eval_step, make_train_step)

__all__ = ["Trainer", "TrainingDivergedError", "build_loaders",
           "class_weights_from_list"]


class TrainingDivergedError(RuntimeError):
    """Raised by the Trainer's nan_guard when a training-loss value
    materializes non-finite.  Detection happens at the metric flush
    (already a host sync) so the guard costs zero extra roundtrips and
    lags divergence by at most one flush interval; fit() writes an
    emergency checkpoint before the exception propagates.  The reference
    trains on obliviously (its loss meters happily average NaN,
    main.py:569)."""


@contextlib.contextmanager
def _sigterm_as_interrupt():
    """Deliver SIGTERM as KeyboardInterrupt for the duration of fit().

    TPU pods get preempted and cluster schedulers kill with SIGTERM (so
    does ``timeout``); by default Python just dies, losing the epoch
    state.  Re-raising it as KeyboardInterrupt routes preemption through
    fit()'s emergency-checkpoint path, making any run resumable from the
    last completed epoch.  Installed only in the main thread (CPython
    restricts signal.signal to it) and only when SIGTERM is at its
    default disposition — an application's own handler, or an explicit
    SIG_IGN, is respected.  The previous disposition is restored on exit.
    Failure handling the reference lacks entirely (SURVEY §5.3)."""
    if threading.current_thread() is not threading.main_thread():
        yield
        return
    prev = signal.getsignal(signal.SIGTERM)
    if prev is not signal.SIG_DFL:
        yield
        return

    def _raise(signum, frame):
        raise KeyboardInterrupt("SIGTERM (preemption)")

    signal.signal(signal.SIGTERM, _raise)
    try:
        yield
    finally:
        signal.signal(signal.SIGTERM, prev)


def class_weights_from_list(list_file: str, num_class: int,
                            enabled: bool) -> Optional[np.ndarray]:
    """Inverse-frequency class weights (main.py:155-164).

    Divergence (fixed, not replicated): the reference builds the vector
    from np.unique's PRESENT classes only, so a class absent from the
    list misaligns every later class's weight.  Here the vector always
    has ``num_class`` entries; absent classes get weight 1.0 (they never
    appear in the loss, the value only keeps shapes static)."""
    if not enabled:
        return None
    labels = [int(line.strip().split(' ')[2]) for line in open(list_file)
              if line.strip()]
    counts = np.bincount(np.asarray(labels, np.int64),
                         minlength=num_class).astype(np.float64)
    freq = counts / counts.sum()
    weights = np.ones(num_class, np.float64)
    present = counts > 0
    weights[present] = 1.0 / freq[present]
    return weights.astype(np.float32)


def build_loaders(args, model_cfg: ModelConfig, train_cfg: TrainConfig):
    """Source/target/val loaders with the reference's epoch-balance
    repetition (main.py:144-153,169-200)."""
    def store_for(list_file, flag):
        d = flag if flag else os.path.dirname(os.path.abspath(list_file))
        return FeatureStore.load(d)

    src_records = parse_list_file(args.train_source_list)
    tgt_records = parse_list_file(args.train_target_list)
    val_records = parse_list_file(args.val_list)

    n_src, n_tgt = epoch_balance_counts(
        len(src_records), len(tgt_records), train_cfg.batch_size[0],
        train_cfg.batch_size[1], train_cfg.copy_list)

    new_length = model_cfg.sample_new_length
    src_store = store_for(args.train_source_list, args.store_source)
    tgt_store = store_for(args.train_target_list, args.store_target)
    val_store = store_for(args.val_list, args.store_val)

    # NOTE the reference trains with test-mode (central) segment sampling
    # (main.py:185-196: random_shift=False, test_mode=True).
    source_loader = TSNLoader(src_store, src_records, num_dataload=n_src,
                              batch_size=train_cfg.batch_size[0],
                              num_segments=model_cfg.train_segments,
                              new_length=new_length, mode="test",
                              shuffle=True, seed=1)
    target_loader = TSNLoader(tgt_store, tgt_records, num_dataload=n_tgt,
                              batch_size=train_cfg.batch_size[1],
                              num_segments=model_cfg.train_segments,
                              new_length=new_length, mode="test",
                              shuffle=True, seed=2)
    val_loader = TSNLoader(val_store, val_records,
                           batch_size=train_cfg.batch_size[2],
                           num_segments=model_cfg.val_segments,
                           new_length=new_length, mode="test",
                           shuffle=False, seed=3)
    return source_loader, target_loader, val_loader, n_src, n_tgt


def _start_async_fetch(metrics) -> None:
    """Begin device->host copies for a metrics pytree without blocking;
    a later device_get becomes a local read (tunnel-latency hiding)."""
    for leaf in jax.tree_util.tree_leaves(metrics):
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()


class Trainer:
    def __init__(self, model_cfg: ModelConfig, da_cfg: DAConfig,
                 train_cfg: TrainConfig, source_loader: TSNLoader,
                 target_loader: TSNLoader, val_loader: TSNLoader,
                 path_exp: str = "exp/", class_weights=None,
                 domain_weights=None, use_mesh: bool = True,
                 log_files: Optional[LogFiles] = None,
                 print_freq: int = 10, show_freq: int = 10,
                 eval_freq: int = 1, save_model: bool = False,
                 save_attention: int = -1, seed: int = 1,
                 tensorboard_dir: Optional[str] = None,
                 profile_dir: Optional[str] = None,
                 num_devices: Optional[int] = None,
                 device_store: bool = False,
                 steps_per_call: int = 1,
                 prefetch_depth: int = 2,
                 store_budget_rows: Optional[int] = None,
                 store_dtype: Optional[str] = None,
                 device_sampler: bool = False,
                 accum_steps: int = 1,
                 model_parallel: int = 1,
                 nan_guard: bool = True):
        self.model_cfg, self.da_cfg, self.train_cfg = (model_cfg, da_cfg,
                                                       train_cfg)
        self.source_loader = source_loader
        self.target_loader = target_loader
        self.val_loader = val_loader
        self.path_exp = path_exp
        self.print_freq, self.show_freq = print_freq, show_freq
        self.eval_freq = eval_freq
        self.save_model = save_model
        self.save_attention = save_attention
        self.logs = log_files
        self.profile_dir = profile_dir
        self.nan_guard = nan_guard
        self.prefetch_depth = max(1, prefetch_depth)
        from ta3n_tpu.io_utils.tensorboard import EmbeddingWriter
        self.tb = EmbeddingWriter(tensorboard_dir)
        self._need_aux = save_attention >= 0 or self.tb.active

        self.model = VideoModel(model_cfg)
        self.rng = jax.random.PRNGKey(seed)
        self._pretrain_rng = jax.random.PRNGKey(seed + 7919)
        self.state = create_train_state(
            self.model, self.rng, train_cfg.batch_size[0],
            train_cfg.batch_size[1], train_cfg)
        cw = jnp.asarray(class_weights) if class_weights is not None else None
        dw = jnp.asarray(domain_weights) if domain_weights is not None \
            else None
        self.device_store = device_store
        # K optimizer steps per dispatch (device-store only; falls back to
        # 1 when per-step aux outputs are requested)
        self.steps_per_call = steps_per_call if (
            device_store and not self._need_aux
            and not da_cfg.pretrain_source) else 1

        devices = jax.devices()
        if num_devices is not None:
            devices = devices[:num_devices]
        self.mesh = None
        self.batch_sharding = None
        store_sharding = None
        if model_parallel > 1 and not (use_mesh and len(devices) > 1):
            import warnings
            warnings.warn(
                f"--model_parallel {model_parallel} ignored: requires a "
                f"multi-device mesh (use_mesh={use_mesh}, "
                f"{len(devices)} device(s) visible) — training proceeds "
                "without tensor parallelism", stacklevel=2)
        if use_mesh and len(devices) > 1:
            from ta3n_tpu.parallel import (batch_sharding, make_mesh_2d,
                                           pad_to_multiple,
                                           replicated_sharding)
            if model_parallel > 1:
                # (data x model) mesh: batch over 'data', large dense
                # kernels column-sharded over 'model' (tensor
                # parallelism — train/step.py::_tp_param_constrainer)
                self.mesh = make_mesh_2d(devices, model_parallel)
            else:
                self.mesh = make_mesh(devices)
            n_shard = int(self.mesh.shape["data"])
            self.batch_sharding = batch_sharding(self.mesh)
            store_sharding = replicated_sharding(self.mesh)
            # batch divisibility by the DATA axis via masked padding (the
            # static analogue of main.py:366-372)
            for loader in (source_loader, target_loader, val_loader):
                loader.pad_to = pad_to_multiple(loader.batch_size, n_shard)
            if model_parallel > 1:
                # TP state in_shardings are unspecified — place the fresh
                # (single-device) state replicated so the first call
                # doesn't pin un-constrained leaves to one device
                self.state = jax.device_put(self.state, store_sharding)

        # every step is built mesh-aware (in_shardings compiled in):
        # batch axes sharded, state/stores replicated — including the
        # flagship device-store production mode (VERDICT r1 #2)
        self.multi_step = None
        if self.steps_per_call > 1:
            from ta3n_tpu.train.step import make_multi_train_step
            self.multi_step = make_multi_train_step(
                self.model, da_cfg, train_cfg, cw, dw, mesh=self.mesh)
        self.train_step = make_train_step(self.model, da_cfg, train_cfg,
                                          cw, dw,
                                          return_aux=self._need_aux,
                                          gather_on_device=device_store,
                                          mesh=self.mesh)
        self.pretrain_step = (
            make_train_step(self.model, da_cfg, train_cfg, cw, dw,
                            pretrain_classification_only=True,
                            gather_on_device=device_store, mesh=self.mesh)
            if da_cfg.pretrain_source else None)
        self.eval_step = make_eval_step(self.model, cw,
                                        gather_on_device=device_store,
                                        mesh=self.mesh)
        # device stores may live in HBM at a narrower dtype: bfloat16
        # halves residency + per-step gather bytes (the model casts
        # gathered rows to compute_dtype and the first GEMM runs in
        # bf16 on the MXU either way); int8 quarters them via per-row
        # symmetric quantization (data/quantized.py — the store becomes
        # a (q, scale) pair dequantized on device in device_gather).
        # None/float32 keeps exact f32 rows.
        self._store_dtype = (jnp.dtype(store_dtype)
                             if store_dtype not in (None, "") else None)
        self.streaming = False
        if device_store and store_budget_rows:
            # larger-than-HBM mode: shards of <= budget_rows streamed
            # through a double buffer (data/streaming.py); the same
            # jitted gather steps run against the resident shard
            from ta3n_tpu.data.streaming import ShardPlan, ShardStream
            self.streaming = True

            def plan_stream(loader):
                plan = ShardPlan(loader.store.offsets, store_budget_rows)
                return plan, ShardStream(loader.store.features, plan,
                                         store_sharding,
                                         dtype=self._store_dtype,
                                         scales=loader.store.scales)
            self._plan_s, self._stream_s = plan_stream(source_loader)
            self._plan_t, self._stream_t = plan_stream(target_loader)
            self._plan_v, self._stream_v = plan_stream(val_loader)
        elif device_store:
            # HBM-resident packed stores: uploaded ONCE; per-step host work
            # collapses to index arithmetic
            def put_store(store):
                if store.quantized:
                    # disk-quantized store: ship the int8 (q, scale)
                    # pair as-is (4x fewer upload bytes); --store_dtype
                    # is moot, rows are already quantized
                    return jax.device_put(
                        (np.ascontiguousarray(store.features),
                         np.ascontiguousarray(store.scales)),
                        store_sharding)
                arr = np.ascontiguousarray(store.features)
                if self._store_dtype == np.int8:
                    from ta3n_tpu.data.quantized import quantize_rows
                    return jax.device_put(quantize_rows(arr),
                                          store_sharding)
                if (self._store_dtype is not None
                        and arr.dtype != self._store_dtype):
                    arr = arr.astype(self._store_dtype)
                return jax.device_put(arr, store_sharding)
            self._dev_store_s = put_store(source_loader.store)
            self._dev_store_t = put_store(target_loader.store)
            self._dev_store_v = put_store(val_loader.store)

        # device-side index pipeline (data/device_sampler.py): epoch
        # permutation + TSN sampling traced into the K-step scan — no
        # per-step host sampling or index upload.  Resident-store multi-
        # step mode only (streaming/aux/pretrain fall back to host feed).
        self.sampled_step = None
        self.shard_sampled_step = None
        if device_sampler and not (device_store
                                   and self.steps_per_call > 1):
            import warnings
            unmet = []
            if not device_store:
                unmet.append("--device_store")
            if self.steps_per_call <= 1:
                unmet.append("--steps_per_call > 1")
            warnings.warn(
                "--device_sampler ignored; requires " + ", ".join(unmet)
                + " — falling back to host-side sampling", stacklevel=2)
        if (device_sampler and device_store and self.streaming
                and self.steps_per_call > 1):
            # streaming + device sampling: shard-local batches generated
            # inside the scan against the resident shard buffers — the
            # larger-than-HBM path loses its last host sampler
            from ta3n_tpu.data.device_sampler import (
                StreamingDeviceSampler, plan_zip_shard_chunks)
            from ta3n_tpu.train.step import make_sampled_shard_multi_step
            self._ssampler_s = StreamingDeviceSampler(
                source_loader, self._plan_s, seed=seed + 101)
            self._ssampler_t = StreamingDeviceSampler(
                target_loader, self._plan_t, seed=seed + 202)
            total_s = sum(self._ssampler_s.shard_steps(s)
                          for s in range(self._ssampler_s.num_shards))
            total_t = sum(self._ssampler_t.shard_steps(s)
                          for s in range(self._ssampler_t.num_shards))
            # zip-shortest steps/epoch — drives both the schedule and the
            # on-device epoch (= state.step // spe) derivation
            self._stream_spe = min(total_s, total_t)
            self._plan_chunks = plan_zip_shard_chunks
            self.shard_sampled_step = make_sampled_shard_multi_step(
                self.model, da_cfg, train_cfg, self._ssampler_s,
                self._ssampler_t, self._stream_spe, cw, dw,
                mesh=self.mesh)
        if (device_sampler and device_store and not self.streaming
                and self.steps_per_call > 1):
            from ta3n_tpu.data.device_sampler import DeviceSampler
            from ta3n_tpu.train.step import make_sampled_multi_step
            self._sampler_s = DeviceSampler(source_loader, seed=seed + 101)
            self._sampler_t = DeviceSampler(target_loader, seed=seed + 202)
            # zip-shortest epoch semantics (main.py:330): both samplers
            # advance on a common steps-per-epoch; each epoch reshuffles
            # and drops the longer loader's tail, like the host zip
            spe = min(len(source_loader), len(target_loader))
            self._sampler_s.steps_per_epoch = spe
            self._sampler_t.steps_per_epoch = spe
            self.sampled_step = make_sampled_multi_step(
                self.model, da_cfg, train_cfg, self._sampler_s,
                self._sampler_t, cw, dw, mesh=self.mesh)

        # gradient accumulation (--accum_steps): G host-fed micro-batch
        # pairs -> averaged gradients -> ONE optimizer update (effective
        # batch G*B; capability absent in the reference).  Host-feed path
        # only — the device-store/K-step modes already scale batch via
        # the mesh, and the accum step consumes features directly.
        self.accum_step = None
        self.accum_steps = 1
        if accum_steps > 1:
            unmet = []
            if device_store:
                unmet.append("--device_store")
            if self.steps_per_call > 1:
                unmet.append("--steps_per_call > 1")
            if da_cfg.pretrain_source:
                unmet.append("--pretrain_source")
            if self._need_aux:
                unmet.append("attention/tensorboard collection")
            if unmet:
                import warnings
                warnings.warn(
                    "--accum_steps ignored with " + ", ".join(unmet)
                    + " — falling back to per-batch updates", stacklevel=2)
            else:
                from ta3n_tpu.train.step import make_grad_accum_step
                self.accum_steps = accum_steps
                self.accum_step = make_grad_accum_step(
                    self.model, da_cfg, train_cfg, cw, dw,
                    accum_steps=accum_steps, mesh=self.mesh)

        # whole-epoch batched validation: one dispatch + one 4-scalar
        # fetch instead of per-batch dispatch+device_get (resident
        # device-store mode; tensorboard needs per-batch features)
        self.multi_eval_step = None
        self._val_stack = None
        if (device_store and not self.streaming and not self.tb.active
                and not val_loader.shuffle):  # cached stack needs a
            # deterministic val epoch (build_loaders uses shuffle=False)
            from ta3n_tpu.train.step import make_multi_eval_step
            self.multi_eval_step = make_multi_eval_step(self.model, cw,
                                                        mesh=self.mesh)

        self._profile_chunks_seen = 0
        self._profile_done = False
        self.lr_current = train_cfg.lr
        self.best_prec1 = 0.0
        self.start_epoch = 1
        self.loss_c_current = 999.0
        self.loss_c_previous = 999.0
        self.attn_epoch_source = []
        self.attn_epoch_target = []

    # ---- checkpoint (main.py:91-106,266-274) ----
    def resume(self, path: str, resume_hp: bool = False):
        payload = load_checkpoint(path, template={
            "epoch": 0, "arch": self.model_cfg.base_model,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "best_prec1": 0.0, "prec1": 0.0,
            "step": 0,
        })
        self.state = self.state._replace(
            params=payload["params"], batch_stats=payload["batch_stats"])
        if resume_hp:
            self.state = self.state._replace(opt_state=payload["opt_state"])
            # the reference's --resume_hp also restores the optimizer's
            # CURRENT lr (main.py:102-104); ours lives in lr_current (the
            # dann mode decays it after every batch, main.py:619-621) —
            # without this the first resumed steps train at the undecayed
            # base lr (found by the bitwise resume-equivalence test)
            if "lr_current" in payload:
                self.lr_current = float(payload["lr_current"])
        self.start_epoch = int(payload["epoch"]) + 1
        self.best_prec1 = float(payload["best_prec1"])
        # restore the step counter: it drives the on-device dropout-rng
        # fold and the device sampler's epoch/permutation derivation, so
        # a resumed run continues the exact same streams.  Checkpoints
        # from before this field was saved derive it from the epoch.
        step = int(payload.get("step", 0))
        if step == 0 and self.start_epoch > 1:
            spe = min(len(self.source_loader), len(self.target_loader))
            step = (self.start_epoch - 1) * spe
        self.state = self.state._replace(
            step=jnp.asarray(step, jnp.int32))
        return self.start_epoch

    def _ckpt_payload(self, epoch: int, prec1: float) -> dict:
        return {
            "epoch": epoch,
            "lr_current": float(self.lr_current),
            "arch": self.model_cfg.base_model,
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "opt_state": self.state.opt_state,
            "best_prec1": self.best_prec1,
            "prec1": prec1,
            "step": int(self.state.step),
        }

    def save(self, epoch: int, prec1: float, is_best: bool):
        # multi-host note: EVERY process must call this together —
        # orbax's save is a collective; save_checkpoint itself restricts
        # the filesystem side-effects to the primary host
        save_checkpoint(self.path_exp, self._ckpt_payload(epoch, prec1),
                        is_best)

    # ---- one epoch (main.py:309-667) ----
    def train_epoch(self, epoch: int) -> float:
        tc = self.train_cfg
        meters = {k: AverageMeter() for k in
                  ("batch_time", "data_time", "loss", "loss_c", "loss_d",
                   "loss_a", "loss_e", "loss_s", "top1", "top5")}
        if self.streaming:
            # schedule denominator: the SOURCE stream's length, like the
            # reference (main.py:347 uses len(source_loader)) and the
            # host streaming path — the device-sampled variant keeps its
            # separate zip-truncated spe (self._stream_spe) ONLY for the
            # on-device epoch derivation, so the two streaming modes'
            # beta/lr schedules stay bitwise-identical
            len_loader = self.source_loader.shard_epoch_len(self._plan_s)
        else:
            len_loader = len(self.source_loader)
        start_steps = epoch * len_loader
        total_steps = tc.epochs * len_loader
        alpha = alpha_schedule(tc.alpha, epoch, tc.epochs)

        from ta3n_tpu.data.loader import device_prefetch
        end = time.time()

        def stream(loader):
            if self.streaming:
                # (shard_id, IndexBatch) stream; shard buffers are device
                # arrays managed by ShardStream, index batches are placed
                # by the jit's in_shardings
                plan = (self._plan_s if loader is self.source_loader
                        else self._plan_t)
                return prefetch(loader.shard_index_epoch(plan),
                                self.prefetch_depth)
            it = (loader.index_epoch() if self.device_store
                  else loader.epoch())
            if self.multi_step is not None or self.accum_step is not None:
                # multi-step/accum modes stack K (G) host batches before
                # dispatch; the stacked [K,B,..] arrays are placed by the
                # jit's own in_shardings (batch axis 1), so no per-batch
                # device_put
                return prefetch(it, self.prefetch_depth)
            return device_prefetch(prefetch(it, self.prefetch_depth),
                                   self.batch_sharding)

        last_line = ""
        pending = []  # unmaterialized device metrics: sync only at print
        attn_src_epoch, attn_tgt_epoch = [], []

        def flush(keep_last: int = 0):
            """Materialize pending metrics into the meters.

            keep_last=N leaves the newest N chunks unmaterialized: their
            execution is still in flight, and blocking on them would
            serialize the dispatch pipeline on this ~39 ms-roundtrip
            tunnel.  Chunk producers start copy_to_host_async at dispatch
            so older chunks' device_get is a cheap local read.  Printed
            'val' columns therefore lag up to keep_last chunks
            (<= keep_last*K steps; callers pass 2) behind the header
            step — logging-only divergence, meter averages are exact
            (documented in PARITY.md)."""
            if meters["loss"].count == 0:
                keep_last = 0  # first print of the epoch: block once so
                # the line shows real values instead of zeros
            if len(pending) <= keep_last:
                return
            take, keep = pending[:len(pending) - keep_last], \
                pending[len(pending) - keep_last:]
            host = jax.device_get(take)
            pending[:] = keep
            rows = []
            for item in host:
                if isinstance(item, tuple) and item[0] == "stacked":
                    _, m, k = item
                    rows.extend({key: v[j] for key, v in m.items()}
                                for j in range(k))
                else:
                    rows.append(item)
            for m in rows:
                n = float(m["n"])
                if self.nan_guard and not math.isfinite(float(m["loss"])):
                    # divergence detection at the existing host sync: no
                    # extra device roundtrips; fit()'s crash handler then
                    # writes the emergency checkpoint before re-raising
                    raise TrainingDivergedError(
                        f"non-finite training loss {float(m['loss'])} at "
                        f"epoch {epoch} (nan_guard=False disables)")
                # weighted by batch size like the reference (main.py:569)
                meters["loss"].update(float(m["loss"]), n)
                meters["loss_c"].update(float(m["loss_c"]), n)
                for key in ("loss_d", "loss_a", "loss_e", "loss_s"):
                    if key in m:
                        meters[key].update(float(m[key]), n)
                meters["top1"].update(100.0 * float(m["top1"]) / max(n, 1),
                                      n)
                meters["top5"].update(100.0 * float(m["top5"]) / max(n, 1),
                                      n)

        if self.shard_sampled_step is not None:
            # streaming + device sampling: shard-local batches generated
            # on device; the host walks the chunk plan and rotates shards
            return self._train_epoch_sampled_stream(
                epoch, meters, flush, pending, alpha, start_steps,
                total_steps)

        if self.sampled_step is not None:
            # device-side index pipeline: no host iterators at all
            return self._train_epoch_sampled(epoch, meters, flush, pending,
                                             alpha, start_steps,
                                             total_steps)

        # thread prefetch (host gather) + device prefetch (async H2D)
        pairs = zip(stream(self.source_loader), stream(self.target_loader))

        if self.multi_step is not None:
            return self._train_epoch_multi(epoch, meters, pairs, flush,
                                           pending, alpha, start_steps,
                                           total_steps, len_loader)

        if self.accum_step is not None:
            return self._train_epoch_accum(epoch, meters, pairs, flush,
                                           pending, alpha, start_steps,
                                           total_steps, len_loader)

        profiling = False
        for i, (bs, bt) in enumerate(pairs):
            p = progress(i, start_steps, total_steps)
            beta = effective_beta(tc.beta, p)
            meters["data_time"].update(time.time() - end)

            if self.profile_dir and epoch == self.start_epoch and i == 2:
                jax.profiler.start_trace(self.profile_dir)
                profiling = True

            # host numpy scalars: shipped with the step call, not as
            # separate per-step device ops (tunnel dispatch latency)
            scalars = StepScalars(np.asarray(beta, np.float32),
                                  np.float32(tc.mu),
                                  np.float32(alpha),
                                  np.float32(tc.gamma),
                                  np.float32(self.lr_current))
            if self.streaming:
                (sid_s, bs), (sid_t, bt) = bs, bt
                args = (self._stream_s.get(sid_s), bs.abs_indices,
                        bs.labels, bs.mask,
                        self._stream_t.get(sid_t), bt.abs_indices,
                        bt.labels, bt.mask)
            elif self.device_store:
                args = (self._dev_store_s, bs.abs_indices, bs.labels,
                        bs.mask, self._dev_store_t, bt.abs_indices,
                        bt.labels, bt.mask)
            else:
                args = (bs.features, bs.labels, bs.mask,
                        bt.features, bt.labels, bt.mask)
            if self.pretrain_step is not None:  # main.py:387-414
                self.state, _ = self.pretrain_step(
                    self.state, *args, scalars, self._pretrain_rng)
            self.state, m = self.train_step(self.state, *args, scalars,
                                            self.rng)
            pending.append(m)
            _start_async_fetch(m)

            if profiling and i == 7:
                jax.block_until_ready(m["loss"])
                jax.profiler.stop_trace()
                profiling = False

            if self._need_aux:
                # attention rows of the selected class (main.py:623-628)
                if self.save_attention >= 0:
                    a_s = np.asarray(m["attn_s"])
                    a_t = np.asarray(m["attn_t"])
                    sel_s = (bs.labels == self.save_attention) \
                        & (bs.mask > 0)
                    sel_t = (bt.labels == self.save_attention) \
                        & (bt.mask > 0)
                    attn_src_epoch.append(np.atleast_2d(a_s)[sel_s]
                                          if a_s.ndim > 1 else
                                          a_s[sel_s, None])
                    attn_tgt_epoch.append(np.atleast_2d(a_t)[sel_t]
                                          if a_t.ndim > 1 else
                                          a_t[sel_t, None])
                self.tb.collect(m.get("feat_s"), bs.labels,
                                m.get("feat_t"), bt.labels,
                                bs.mask, bt.mask)

            meters["batch_time"].update(time.time() - end)
            end = time.time()

            if i % self.print_freq == 0:
                flush(keep_last=2)
                last_line = self._format_train_line(
                    epoch, i, len_loader, meters, alpha, beta, tc)
                if i % self.show_freq == 0:
                    print(last_line)
                if self.logs:
                    self.logs.write("train.log", last_line)

            # DANN per-step lr for the NEXT step (main.py:619-621)
            if tc.lr_adaptive == "dann":
                self.lr_current = dann_lr(tc.lr, p)

        if profiling:  # epoch shorter than the profiling window
            jax.block_until_ready(self.state.params)
            jax.profiler.stop_trace()
        flush()
        if self.save_attention >= 0:
            # per-epoch mean attention vector (main.py:242-244,667)
            for buf, store in ((attn_src_epoch, self.attn_epoch_source),
                               (attn_tgt_epoch, self.attn_epoch_target)):
                rows = np.concatenate(buf) if buf else np.zeros((0, 1))
                store.append(rows.mean(axis=0) if len(rows) else
                             np.zeros(rows.shape[1]))
        self.tb.write_epoch(epoch * len_loader)
        if self.logs and last_line:
            self.logs.write("train_short.log", last_line)
        return meters["loss_c"].avg

    def _maybe_profile_chunk(self, epoch, n_chunks) -> bool:
        """--profile_dir window for the K-step paths: trace the SECOND
        chunk dispatched in this run, whatever epoch it falls in (the
        first chunk compiles) — mode-agnostic, so single-chunk epochs
        and streaming shard plans all still produce a trace.  The
        single-step path has its own steps-2..7 window."""
        if not self.profile_dir or self._profile_done:
            return False
        self._profile_chunks_seen += 1
        if self._profile_chunks_seen == 2:
            self._profile_done = True
            jax.profiler.start_trace(self.profile_dir)
            return True
        return False

    def _chunk_scalars(self, i, k, alpha, start_steps, total_steps):
        """Per-step schedule values for steps [i, i+k) stacked for one
        scan dispatch (shared by the host-fed and device-sampled K-step
        paths so a schedule fix cannot diverge them)."""
        tc = self.train_cfg
        betas, lrs = [], []
        for j in range(k):
            p = progress(i + j, start_steps, total_steps)
            betas.append(effective_beta(tc.beta, p))
            lrs.append(self.lr_current)
            if tc.lr_adaptive == "dann":  # main.py:619-621
                self.lr_current = dann_lr(tc.lr, p)
        sc = StepScalars(
            np.asarray(betas, np.float32),
            np.full(k, tc.mu, np.float32),
            np.full(k, alpha, np.float32),
            np.full(k, tc.gamma, np.float32),
            np.asarray(lrs, np.float32))
        return sc, betas

    def _train_epoch_multi(self, epoch, meters, pairs, flush, pending,
                           alpha, start_steps, total_steps, len_loader):
        """K-steps-per-dispatch epoch (device-store mode): stack K index
        batches + per-step schedule scalars and scan them in one call."""
        tc = self.train_cfg
        K = self.steps_per_call
        end = time.time()
        last_line = ""
        chunk = []
        i = 0
        n_chunks = 0

        def run_chunk(chunk, store_s=None, store_t=None):
            nonlocal last_line, end, i, n_chunks
            if store_s is None:
                store_s, store_t = self._dev_store_s, self._dev_store_t
            k = len(chunk)
            sc, betas = self._chunk_scalars(i, k, alpha, start_steps,
                                            total_steps)
            profiling = self._maybe_profile_chunk(epoch, n_chunks)
            stack = lambda xs: np.stack(xs)  # host stack; jit places/shards
            bs_list, bt_list = zip(*chunk)
            self.state, m = self.multi_step(
                self.state,
                store_s, stack([b.abs_indices for b in bs_list]),
                stack([b.labels for b in bs_list]),
                stack([b.mask for b in bs_list]),
                store_t, stack([b.abs_indices for b in bt_list]),
                stack([b.labels for b in bt_list]),
                stack([b.mask for b in bt_list]),
                sc, self.rng)
            # keep the stacked dict; split per step lazily at flush time
            pending.append(("stacked", m, k))
            if profiling:
                jax.device_get(m["loss"])  # force execution in-window
                jax.profiler.stop_trace()
            _start_async_fetch(m)
            meters["batch_time"].update((time.time() - end) / k, k)
            end = time.time()
            i += k
            n_chunks += 1
            if (i - k) // K % max(self.print_freq // K, 1) == 0:
                flush(keep_last=2)
                last_line = self._format_train_line(
                    epoch, i - 1, len_loader, meters, alpha, betas[-1], tc)
                if self.logs:
                    self.logs.write("train.log", last_line)
                print(last_line)

        if self.streaming:
            # chunks may not span shard switches (one resident store per
            # compiled scan); ShardStream double-buffers across switches
            cur_key = None
            for (sid_s, bs), (sid_t, bt) in pairs:
                key = (sid_s, sid_t)
                if chunk and key != cur_key:
                    run_chunk(chunk, self._stream_s.get(cur_key[0]),
                              self._stream_t.get(cur_key[1]))
                    chunk = []
                cur_key = key
                chunk.append((bs, bt))
                if len(chunk) == K:
                    run_chunk(chunk, self._stream_s.get(sid_s),
                              self._stream_t.get(sid_t))
                    chunk = []
            if chunk:
                run_chunk(chunk, self._stream_s.get(cur_key[0]),
                          self._stream_t.get(cur_key[1]))
        else:
            for bs, bt in pairs:
                chunk.append((bs, bt))
                if len(chunk) == K:
                    run_chunk(chunk)
                    chunk = []
            if chunk:
                run_chunk(chunk)
        flush()
        if self.logs and last_line:
            self.logs.write("train_short.log", last_line)
        return meters["loss_c"].avg

    def _train_epoch_accum(self, epoch, meters, pairs, flush, pending,
                           alpha, start_steps, total_steps, len_loader):
        """Gradient-accumulation epoch: every G consecutive micro-batch
        pairs become ONE optimizer update with averaged gradients
        (make_grad_accum_step).  Schedule scalars (beta/lr) are evaluated
        once per UPDATE at the chunk's first micro-step index; a tail of
        fewer than G pairs falls back to plain per-batch updates so no
        data is dropped."""
        tc = self.train_cfg
        G = self.accum_steps
        end = time.time()
        last_line = ""
        chunk = []
        i = 0

        def scalars_at(step_i):
            p = progress(step_i, start_steps, total_steps)
            beta = effective_beta(tc.beta, p)
            return StepScalars(np.asarray(beta, np.float32),
                               np.float32(tc.mu), np.float32(alpha),
                               np.float32(tc.gamma),
                               np.float32(self.lr_current)), p, beta

        def run_chunk(chunk):
            nonlocal last_line, end, i
            bs_list, bt_list = zip(*chunk)
            k = len(chunk)
            if k == G:
                # one UPDATE: scalars evaluated once at the chunk's first
                # micro-step index, lr decays once
                scalars, p, beta = scalars_at(i)
                stack = lambda xs: np.stack(xs)
                self.state, m = self.accum_step(
                    self.state,
                    stack([b.features for b in bs_list]),
                    stack([b.labels for b in bs_list]),
                    stack([b.mask for b in bs_list]),
                    stack([b.features for b in bt_list]),
                    stack([b.labels for b in bt_list]),
                    stack([b.mask for b in bt_list]),
                    scalars, self.rng)
                pending.append(("stacked", m, k))
                _start_async_fetch(m)
                if tc.lr_adaptive == "dann":  # per-UPDATE lr decay
                    self.lr_current = dann_lr(tc.lr, p)
            else:  # tail: plain per-batch updates, per-step schedules
                for j, (bs, bt) in enumerate(chunk):
                    scalars, p, beta = scalars_at(i + j)
                    self.state, m = self.train_step(
                        self.state, bs.features, bs.labels, bs.mask,
                        bt.features, bt.labels, bt.mask, scalars,
                        self.rng)
                    pending.append(m)
                    _start_async_fetch(m)
                    if tc.lr_adaptive == "dann":
                        self.lr_current = dann_lr(tc.lr, p)
            meters["batch_time"].update((time.time() - end) / k, k)
            end = time.time()
            i += k
            if (i - k) // G % max(self.print_freq // G, 1) == 0:
                flush(keep_last=2)
                last_line = self._format_train_line(
                    epoch, i - 1, len_loader, meters, alpha, beta, tc)
                if self.logs:
                    self.logs.write("train.log", last_line)
                print(last_line)

        for bs, bt in pairs:
            chunk.append((bs, bt))
            if len(chunk) == G:
                run_chunk(chunk)
                chunk = []
        if chunk:
            run_chunk(chunk)
        flush()
        if self.logs and last_line:
            self.logs.write("train_short.log", last_line)
        return meters["loss_c"].avg

    def _train_epoch_sampled_stream(self, epoch, meters, flush, pending,
                                    alpha, start_steps, total_steps):
        """Streaming + device-sampled epoch: per chunk the host ships the
        resident shard buffers (ShardStream double-buffered), the shard
        ids/offsets and schedule scalars; the scan generates every batch
        shard-locally on device."""
        tc = self.train_cfg
        chunks = self._plan_chunks(self._ssampler_s, self._ssampler_t,
                                   self.steps_per_call)
        spe = self._stream_spe
        end = time.time()
        last_line = ""
        i = 0
        n_chunks = 0
        for sid_s, j0_s, sid_t, j0_t, k in chunks:
            sc, betas = self._chunk_scalars(i, k, alpha, start_steps,
                                            total_steps)
            profiling = self._maybe_profile_chunk(epoch, n_chunks)
            self.state, m = self.shard_sampled_step(
                self.state, self._stream_s.get(sid_s),
                self._stream_t.get(sid_t), sc, self.rng,
                np.int32(sid_s), np.int32(j0_s), np.int32(sid_t),
                np.int32(j0_t))
            pending.append(("stacked", m, k))
            if profiling:
                jax.device_get(m["loss"])  # force execution in-window
                jax.profiler.stop_trace()
            _start_async_fetch(m)
            meters["batch_time"].update((time.time() - end) / k, k)
            end = time.time()
            i += k
            n_chunks += 1
            K = self.steps_per_call
            if (i - k) // K % max(self.print_freq // K, 1) == 0:
                flush(keep_last=2)
                last_line = self._format_train_line(
                    epoch, i - 1, spe, meters, alpha, betas[-1], tc)
                if self.logs:
                    self.logs.write("train.log", last_line)
                print(last_line)
        flush()
        if self.logs and last_line:
            self.logs.write("train_short.log", last_line)
        return meters["loss_c"].avg

    def _train_epoch_sampled(self, epoch, meters, flush, pending, alpha,
                             start_steps, total_steps):
        """Device-sampled epoch: the scan generates its own index batches
        from state.step; the host only ships schedule scalars."""
        tc = self.train_cfg
        K = self.steps_per_call
        spe = self._sampler_s.steps_per_epoch
        end = time.time()
        last_line = ""
        i = 0
        n_chunks = 0
        while i < spe:
            k = min(K, spe - i)
            sc, betas = self._chunk_scalars(i, k, alpha, start_steps,
                                            total_steps)
            profiling = self._maybe_profile_chunk(epoch, n_chunks)
            self.state, m = self.sampled_step(
                self.state, self._dev_store_s, self._dev_store_t, sc,
                self.rng)
            pending.append(("stacked", m, k))
            if profiling:
                jax.device_get(m["loss"])  # force execution in-window
                jax.profiler.stop_trace()
            _start_async_fetch(m)
            meters["batch_time"].update((time.time() - end) / k, k)
            end = time.time()
            i += k
            n_chunks += 1
            if (i - k) // K % max(self.print_freq // K, 1) == 0:
                flush(keep_last=2)
                last_line = self._format_train_line(
                    epoch, i - 1, spe, meters, alpha, betas[-1], tc)
                if self.logs:
                    self.logs.write("train.log", last_line)
                print(last_line)
        flush()
        if self.logs and last_line:
            self.logs.write("train_short.log", last_line)
        return meters["loss_c"].avg

    def _format_train_line(self, epoch, i, total, meters, alpha, beta, tc):
        line = (f"Train: [{epoch}][{i}/{total}], lr: {self.lr_current:.5f}\t"
                f"Time {meters['batch_time'].val:.3f} "
                f"({meters['batch_time'].avg:.3f})\t"
                f"Data {meters['data_time'].val:.3f} "
                f"({meters['data_time'].avg:.3f})\t"
                f"Prec@1 {meters['top1'].val:.3f} "
                f"({meters['top1'].avg:.3f})\t"
                f"Prec@5 {meters['top5'].val:.3f} "
                f"({meters['top5'].avg:.3f})\t"
                f"Loss {meters['loss'].val:.4f} "
                f"({meters['loss'].avg:.4f})   "
                f"loss_c {meters['loss_c'].avg:.4f}\t")
        da = self.da_cfg
        if da.dis_DA != 'none' and da.use_target != 'none':
            line += f"alpha {alpha:.3f}  loss_d {meters['loss_d'].avg:.4f}\t"
        if da.adv_DA != 'none' and da.use_target != 'none':
            line += (f"beta {beta[0]:.3f}, {beta[1]:.3f}, {beta[2]:.3f}  "
                     f"loss_a {meters['loss_a'].avg:.4f}\t")
        if da.add_loss_DA != 'none' and da.use_target != 'none':
            line += (f"gamma {tc.gamma:.6f}  "
                     f"loss_e {meters['loss_e'].avg:.4f}\t")
        if da.ens_DA != 'none' and da.use_target != 'none':
            line += f"mu {tc.mu:.6f}  loss_s {meters['loss_s'].avg:.4f}\t"
        return line

    # ---- validation (main.py:669-761) ----
    def validate(self, epoch: int) -> float:
        if self.multi_eval_step is not None:
            # deterministic val loader: the stacked index batches are
            # identical every epoch — built once, then each validation
            # is one dispatch + one 4-scalar fetch
            if self._val_stack is None:
                bs = list(self.val_loader.index_epoch())
                self._val_stack = (
                    np.stack([b.abs_indices for b in bs]),
                    np.stack([b.labels for b in bs]),
                    np.stack([b.mask for b in bs]))
            idx, ys, mk = self._val_stack
            r = jax.device_get(self.multi_eval_step(
                self.state.params, self.state.batch_stats,
                self._dev_store_v, idx, ys, mk))
            n = max(float(r["n"]), 1.0)
            top1 = 100.0 * float(r["top1"]) / n
            top5 = 100.0 * float(r["top5"]) / n
            loss = float(r["loss_sum"]) / n
            line = (f"Testing Results: Prec@1 {top1:.3f} "
                    f"Prec@5 {top5:.3f} Loss {loss:.5f}")
            print(line)
            if self.logs:
                self.logs.write("val.log", line)
            return top1

        meters = {k: AverageMeter() for k in ("loss", "top1", "top5")}
        feat_val, label_val = [], []
        if self.streaming:
            val_iter = self.val_loader.shard_index_epoch(self._plan_v)
        elif self.device_store:
            val_iter = self.val_loader.index_epoch()
        else:
            val_iter = self.val_loader.epoch()
        for i, b in enumerate(prefetch(val_iter)):
            if self.device_store:
                if self.streaming:
                    sid, b = b
                    store_v = self._stream_v.get(sid)
                else:
                    store_v = self._dev_store_v
                r = self.eval_step(self.state.params,
                                   self.state.batch_stats,
                                   store_v, b.abs_indices,
                                   b.labels, b.mask)
            else:
                r = self.eval_step(self.state.params,
                                   self.state.batch_stats,
                                   b.features, b.labels, b.mask)
            if not self.tb.active:
                r.pop("feat", None)
                r.pop("logits", None)
            r = jax.device_get(r)  # one transfer per batch
            n = float(r["n"])
            meters["loss"].update(float(r["loss"]), n)
            meters["top1"].update(100.0 * float(r["top1"]) / max(n, 1), n)
            meters["top5"].update(100.0 * float(r["top5"]) / max(n, 1), n)
            if self.tb.active:
                sel = np.asarray(b.mask) > 0
                feat_val.append(np.asarray(r["feat"])[sel])
                label_val.append(np.asarray(b.labels)[sel])
        line = (f"Testing Results: Prec@1 {meters['top1'].avg:.3f} "
                f"Prec@5 {meters['top5'].avg:.3f} "
                f"Loss {meters['loss'].avg:.5f}")
        print(line)
        if self.logs:
            self.logs.write("val.log", line)
        if self.tb.active and feat_val:
            self.tb.write_val_embedding(np.concatenate(feat_val),
                                        np.concatenate(label_val),
                                        epoch * len(self.val_loader))
        return meters["top1"].avg

    # ---- full run (main.py:228-306) ----
    def fit(self):
        """Epoch loop with emergency checkpointing: an interrupt, SIGTERM
        (pod preemption / scheduler kill — see ``_sigterm_as_interrupt``),
        or crash mid-run saves a resumable checkpoint before re-raising
        (failure recovery the reference lacks, SURVEY §5.3)."""
        try:
            with _sigterm_as_interrupt():
                return self._fit()
        except BaseException:
            if self.save_model and self._last_epoch_done >= 1:
                if jax.process_count() > 1:
                    # a real preemption can interrupt processes at
                    # DIFFERENT points, so the collective orbax save
                    # would deadlock at its barrier if any peer never
                    # reaches this handler (ADVICE r4) — each process
                    # writes its own collective-free pickle instead;
                    # any one file resumes the run (Trainer.resume)
                    from ta3n_tpu.io_utils.checkpoint import \
                        save_emergency_local
                    p = save_emergency_local(
                        self.path_exp,
                        self._ckpt_payload(self._last_epoch_done,
                                           self.best_prec1))
                    print(f"emergency checkpoint (process-local, "
                          f"collective-free) saved at epoch "
                          f"{self._last_epoch_done} -> {p}")
                else:
                    self.save(self._last_epoch_done, self.best_prec1,
                              False)
                    print(f"emergency checkpoint saved at epoch "
                          f"{self._last_epoch_done} -> {self.path_exp}")
            raise

    _last_epoch_done = 0

    def _fit(self):
        tc = self.train_cfg
        for epoch in range(self.start_epoch, tc.epochs + 1):
            # epoch-level lr rules (main.py:234-237)
            if tc.lr_adaptive == "loss":
                self.lr_current = loss_plateau_lr(
                    self.lr_current, tc.lr_decay, self.loss_c_current,
                    self.loss_c_previous)
            elif tc.lr_adaptive == "none":
                # cumulative form (schedules.step_decay_lr) instead of
                # dividing only when `epoch in lr_steps`: a resumed run
                # starting past a step epoch re-derives the decayed lr
                # (the reference restores it from optimizer state,
                # main.py:102-104; review finding)
                self.lr_current = step_decay_lr(tc.lr, tc.lr_decay, epoch,
                                                tc.lr_steps)

            loss_c = self.train_epoch(epoch)
            self._last_epoch_done = epoch
            self.loss_c_previous = self.loss_c_current
            self.loss_c_current = loss_c

            if epoch % self.eval_freq == 0 or epoch == tc.epochs:
                prec1 = self.validate(epoch)
                is_best = prec1 > self.best_prec1
                line_update = (' ==> updating the best accuracy'
                               if is_best else '')
                print(f"Best score {self.best_prec1} vs current score "
                      f"{prec1}{line_update}")
                if self.logs:
                    self.logs.write("val_short.log", "%.3f" % prec1)
                self.best_prec1 = max(prec1, self.best_prec1)
                self.tb.write_best_text(self.best_prec1, epoch)
                if self.save_model:
                    self.save(epoch, prec1, is_best)
        if (self.profile_dir and not self._profile_done
                and self.steps_per_call > 1):
            import warnings
            warnings.warn(
                "--profile_dir produced no trace: the run dispatched "
                f"only {self._profile_chunks_seen} chunk(s) and the "
                "first chunk (compilation) is never traced — run at "
                "least 2 chunks", stacklevel=2)
        if self.logs:
            self.logs.write_best(self.best_prec1)
        if self.save_attention >= 0 and self.attn_epoch_source:
            # attention-value dumps (main.py:304-306; written under the
            # experiment dir rather than the reference's cwd)
            np.savetxt(os.path.join(self.path_exp,
                                    f"attn_source_{self.save_attention}.log"),
                       np.stack(self.attn_epoch_source), fmt="%s")
            np.savetxt(os.path.join(self.path_exp,
                                    f"attn_target_{self.save_attention}.log"),
                       np.stack(self.attn_epoch_target), fmt="%s")
        self.tb.close()
        return self.best_prec1
