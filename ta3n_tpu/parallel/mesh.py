"""Device-mesh data parallelism.

TPU-native replacement for the reference's `torch.nn.DataParallel`
single-process replication (main.py:79, test_models.py:108): a 1-D
``jax.sharding.Mesh`` over the chips with the batch axis sharded; XLA
inserts the gradient all-reduce (psum over ICI) automatically because the
loss is a mean over the sharded batch.  The reference's replica-divisibility
dummy-padding (main.py:366-372,695-698) becomes `pad_to_multiple` + masks.

Multi-host (DCN) scale-out — a capability the reference lacks entirely —
is `jax.distributed.initialize()` before `make_mesh()`; the same code path
then spans all processes' devices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_mesh_2d", "batch_sharding",
           "replicated_sharding", "pad_to_multiple", "shard_train_step",
           "lift_to_global"]


def lift_to_global(a: np.ndarray, sharding: NamedSharding) -> jax.Array:
    """Lift a host-numpy array every process holds IN FULL into a global
    array under ``sharding``, each process contributing the shards it
    owns.

    This is the one place that encodes the multi-host batch contract:
    every process holds the identical full global batch (loaders and
    samplers are seed-synchronized; the per-host-slice feeding variant
    lives in scripts/multihost_integration.py).  Needed because
    multi-controller jit / device_put reject host-numpy destined for a
    non-replicated sharding ("Passing non-trivial shardings for numpy
    inputs is not allowed").  Callers: train.step._multiprocess_lift,
    data.loader.device_prefetch.
    """
    a = np.asarray(a)
    return jax.make_array_from_callback(a.shape, sharding,
                                        lambda idx: a[idx])


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def make_mesh_2d(devices: Optional[Sequence[jax.Device]] = None,
                 model_parallel: int = 1,
                 axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """(data x model) mesh: batch sharded over 'data', large weight
    matrices column-sharded over 'model' (tensor parallelism — capability
    beyond the reference's DataParallel-only scaling, SURVEY §2.9).  XLA
    inserts the activation all-gathers / gradient reduce-scatters from
    the in_shardings; on hardware the 'model' axis should map to the
    faster ICI ring."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading (batch/video) axis sharded across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(batch_size: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= batch_size (mask covers the rest)."""
    return -(-batch_size // n_devices) * n_devices


def shard_train_step(train_step, mesh: Mesh, axis_name: str = "data"):
    """Re-jit a built (host-feed) train step with explicit in_shardings:
    state/scalars/rng replicated, xs/ys/mask_s/xt/yt/mask_t batch-sharded.

    Sharding is part of the compiled program (no per-call device_put on
    the host; donation still applies).  Uncommitted/numpy inputs are
    placed by the jit itself; arrays already committed elsewhere are
    rejected rather than silently left unsharded.  Prefer passing
    ``mesh=`` to ``make_train_step`` directly; this wrapper exists for
    steps built without one.
    """
    raw = getattr(train_step, "raw", None)
    if raw is None:
        raise ValueError("train_step has no .raw underlying function; "
                         "build it with make_train_step(..., mesh=mesh) "
                         "instead")
    data = batch_sharding(mesh, axis_name)
    rep = replicated_sharding(mesh)
    return jax.jit(raw, donate_argnums=(0,),
                   in_shardings=(rep, data, data, data, data, data, data,
                                 rep, rep),
                   out_shardings=(rep, rep))
