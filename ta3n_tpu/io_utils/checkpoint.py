"""Checkpoint save / resume.

Parity with the reference semantics (main.py:91-106,266-274,764-770):
  * save every eval epoch: {epoch, arch, state (params+batch_stats+opt),
    best_prec1, prec1} to ``checkpoint``; copy to ``model_best`` on a new
    best;
  * resume restores model/epoch/best always, optimizer state only with
    ``--resume_hp``.
Storage is orbax (async-capable, TPU-host friendly) instead of
torch.save pickles.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint"]

_CKPT_NAME = "checkpoint"
_BEST_NAME = "model_best"


def save_checkpoint(path_exp: str, payload: Dict[str, Any],
                    is_best: bool = False) -> str:
    """payload: {'epoch', 'arch', 'params', 'batch_stats', 'opt_state',
    'best_prec1', 'prec1'} — pytrees of jax/numpy arrays + scalars."""
    os.makedirs(path_exp, exist_ok=True)
    path = os.path.abspath(os.path.join(path_exp, _CKPT_NAME))
    if os.path.exists(path):
        shutil.rmtree(path)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, payload)
    ckpt.wait_until_finished()
    if is_best:
        best = os.path.abspath(os.path.join(path_exp, _BEST_NAME))
        if os.path.exists(best):
            shutil.rmtree(best)
        shutil.copytree(path, best)
    return path


def load_checkpoint(path: str,
                    template: Optional[Dict[str, Any]] = None
                    ) -> Dict[str, Any]:
    """Restore a checkpoint directory saved by save_checkpoint.

    template: a matching pytree of abstract/real arrays for strict/typed
    restoration (optional — untyped restore otherwise).
    """
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(path, template)
    return ckpt.restore(path)
