"""Checkpoint save / resume.

Parity with the reference semantics (main.py:91-106,266-274,764-770):
  * save every eval epoch: {epoch, arch, state (params+batch_stats+opt),
    best_prec1, prec1} to ``checkpoint``; copy to ``model_best`` on a new
    best;
  * resume restores model/epoch/best always, optimizer state only with
    ``--resume_hp``.
Array pytrees go through orbax (async-capable, TPU-host friendly); scalar
metadata (epoch/arch/accuracies) lives in a JSON sidecar.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "save_emergency_local",
           "load_checkpoint"]

_CKPT_NAME = "checkpoint"
_BEST_NAME = "model_best"
_META_KEYS = ("epoch", "arch", "best_prec1", "prec1", "step",
              "lr_current")


def save_checkpoint(path_exp: str, payload: Dict[str, Any],
                    is_best: bool = False) -> str:
    """payload: {'epoch', 'arch', 'params', 'batch_stats', 'opt_state',
    'best_prec1', 'prec1'} — array pytrees + scalar metadata."""
    os.makedirs(path_exp, exist_ok=True)
    path = os.path.abspath(os.path.join(path_exp, _CKPT_NAME))
    import jax
    import numpy as np
    meta = {k: payload[k] for k in _META_KEYS if k in payload}
    arrays = {k: v for k, v in payload.items() if k not in _META_KEYS}
    # drop empty subtrees (orbax rejects empty dicts at the leaves)
    arrays = {k: v for k, v in arrays.items()
              if not (isinstance(v, dict) and not v)}
    # host-numpy leaves: checkpoints restore on ANY device topology (train
    # on a pod, eval on one chip) — orbax otherwise pins saved shardings
    arrays = jax.tree_util.tree_map(lambda a: np.asarray(a), arrays)
    # multi-host: orbax's save is a COLLECTIVE (sync_global_processes) —
    # every process must call it (the primary writes); but the plain
    # filesystem side-effects (rmtree, meta sidecar, best copy) must run
    # on the primary only, or concurrent writers corrupt the shared dir
    primary = jax.process_index() == 0
    if primary and os.path.exists(path):
        shutil.rmtree(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, arrays)
    ckpt.wait_until_finished()
    if not primary:
        return path
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    if is_best:
        best = os.path.abspath(os.path.join(path_exp, _BEST_NAME))
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
        shutil.copyfile(path + ".meta.json", best + ".meta.json")
    return path


def save_emergency_local(path_exp: str, payload: Dict[str, Any]) -> str:
    """NON-COLLECTIVE single-file emergency checkpoint (one pickle per
    process, ``emergency.p{process_index}.pkl``).

    Why it exists (ADVICE r4): orbax's save is a collective — every
    process must enter it or the job deadlocks at the save barrier.  A
    real multi-host preemption can interrupt processes at DIFFERENT
    points (one host raises mid-epoch, another after validate), so the
    emergency path must never rely on peers reaching the same handler.
    This writer has no barriers: each process independently dumps its
    own host-local copy of the (replicated) state; ANY one file restores
    the full run (load_checkpoint/Trainer.resume accept the .pkl path
    directly).  Requires host-addressable state — true for the DP /
    multi-host-replicated design; a cross-host-sharded TP state would
    need the collective save (use synchronized interrupts there).

    Atomic: written to a .tmp and renamed, so a crash mid-dump never
    leaves a half-written file where the resume looks.
    """
    import pickle

    import jax
    import numpy as np
    os.makedirs(path_exp, exist_ok=True)
    meta = {k: payload[k] for k in _META_KEYS if k in payload}
    arrays = {k: v for k, v in payload.items() if k not in _META_KEYS}
    arrays = jax.tree_util.tree_map(lambda a: np.asarray(a), arrays)
    path = os.path.abspath(os.path.join(
        path_exp, f"emergency.p{jax.process_index()}.pkl"))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({**meta, **arrays}, f)
    os.replace(tmp, path)
    return path


def load_checkpoint(path: str,
                    template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint directory saved by save_checkpoint, or a
    process-local emergency ``.pkl`` (save_emergency_local).

    template: matching pytree of arrays for typed restoration (the scalar
    metadata keys in it are ignored).
    """
    path = os.path.abspath(path)
    if path.endswith(".pkl") and os.path.isfile(path):
        import pickle
        with open(path, "rb") as f:
            payload = pickle.load(f)
        payload.setdefault("batch_stats", {})
        return payload
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        tmpl = {k: v for k, v in template.items() if k not in _META_KEYS}
        tmpl = {k: v for k, v in tmpl.items()
                if not (isinstance(v, dict) and not v)}
        payload = dict(ckpt.restore(path, tmpl))
    else:
        payload = dict(ckpt.restore(path))
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            payload.update(json.load(f))
    payload.setdefault("batch_stats", {})
    return payload
