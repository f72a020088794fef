"""Checkpoint save/load via orbax (reference ``agents/base.py:63-128``).

Checkpoint contents mirror the reference's single-file dict: epoch,
iteration, best validation loss, model params, optimizer state, plus the
host-side scheduler / loss-switch / logger states. ``model_best`` is kept
alongside the rolling checkpoint (reference ``agents/base.py:126-128``).

Deliberate deviation: the reference SAVES optimizer/scheduler state but
skips restoring it on resume (the restore lines are commented out,
``agents/base.py:74-75``), so a resumed run restarts Adam moments from
zero. We restore the full optimizer state (``train/loop.py:load_checkpoint``)
— resuming is then a true continuation; fidelity to the reference's
accidental reset would only hurt training.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _path(checkpoint_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name))


def _save_atomic(ckptr, target: str, payload: Dict[str, Any]) -> None:
    """Write to ``<target>.new`` and swap only on success.

    orbax's ``force=True`` deletes the existing target BEFORE serializing;
    if the device->host readback then fails (observed: tunneled-TPU backend
    dropping mid-save) the previous checkpoint is destroyed along with the
    new one. Keep the old checkpoint until the new write has committed.
    """
    new, old = target + ".new", target + ".old"
    for p in (new, old):
        shutil.rmtree(p, ignore_errors=True)
    ckptr.save(new, payload, force=True)
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(new, target)
    shutil.rmtree(old, ignore_errors=True)


def save_checkpoint(checkpoint_dir: str, payload: Dict[str, Any],
                    is_best: bool = False, name: str = "checkpoint") -> None:
    ckptr = ocp.PyTreeCheckpointer()
    _save_atomic(ckptr, _path(checkpoint_dir, name), payload)
    if is_best:
        _save_atomic(ckptr, _path(checkpoint_dir, "model_best"), payload)


def load_checkpoint(checkpoint_dir: str, name: str = "checkpoint",
                    template: Optional[Dict[str, Any]] = None
                    ) -> Optional[Dict[str, Any]]:
    path = _path(checkpoint_dir, name)
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    if template is not None:
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(), template)
        return ckptr.restore(path, item=template, restore_args=restore_args)
    return ckptr.restore(path)
