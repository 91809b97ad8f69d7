"""Multi-host (DCN) initialization.

A capability the reference lacks entirely (SURVEY §2.9: single-process
DataParallel only).  On a TPU pod slice, run the SAME training command on
every host after calling `initialize_multihost()`; `make_mesh()` then spans
all processes' devices and the data-parallel gradient psum rides ICI within
a slice and DCN across slices — XLA picks the collectives.

Each host feeds its own shard of the global batch: use
`host_batch_slice(global_batch)` to carve the per-host range, and build
loaders with `seed=per_host_seed` so sampling streams are independent.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

__all__ = ["initialize_multihost", "host_batch_slice", "is_primary_host"]


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with TPU auto-detection fallbacks."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary_host() -> bool:
    return jax.process_index() == 0


def host_batch_slice(global_batch: int) -> Tuple[int, int]:
    """[start, end) rows of the global batch this host must feed.

    global_batch must divide evenly by process_count (pad with masked rows
    via TSNLoader.pad_to otherwise).
    """
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes — pad with masked rows")
    per = global_batch // n
    start = jax.process_index() * per
    return start, start + per
