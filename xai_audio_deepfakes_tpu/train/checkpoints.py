"""Orbax checkpointing with resume — replacing the reference's
`torch.save(state_dict)` + manual DDP `module.` prefix stripping
(`LMAC_metrics.py:22-26`, `train_addvisor.py:108-116,387-393`; note the
reference's own save call is commented out and it stores no optimizer state
and cannot resume).

Checkpoints carry the FULL train state: decoder params + batch stats, raw
loss weights, and both optimizer states. Directory names keep the reference's
epoch+loss encoding (`addvisor_epoch_{n}_loss_{x:.4f}`)."""

from __future__ import annotations

import os
import re
from typing import Any

import jax
import orbax.checkpoint as ocp


def checkpoint_name(epoch: int, loss: float) -> str:
    return f"addvisor_epoch_{epoch}_loss_{loss:.4f}"


_NAME_RE = re.compile(r"addvisor_epoch_(\d+)_loss_([0-9.]+)$")


_async_ckptr: ocp.AsyncCheckpointer | None = None


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def save_checkpoint(
    directory: str, epoch: int, loss: float, state: Any, async_save: bool = False
) -> str:
    """Save `state` (any pytree) under directory/addvisor_epoch_N_loss_X.

    async_save=True hands the write to a background thread (Orbax async):
    the device-to-host copy happens now, the filesystem write overlaps the
    next epoch's compute. Call `wait_for_saves()` before reading the
    checkpoint back or exiting."""
    path = os.path.abspath(os.path.join(directory, checkpoint_name(epoch, loss)))
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
        return path
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def wait_for_saves() -> None:
    """Block until all async checkpoint writes have committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_checkpoint(directory: str) -> str | None:
    if not os.path.isdir(directory):
        return None
    best = None
    for name in os.listdir(directory):
        m = _NAME_RE.match(name)
        if m:
            epoch = int(m.group(1))
            if best is None or epoch > best[0]:
                best = (epoch, name)
    return os.path.join(directory, best[1]) if best else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of `target` (a matching abstract/concrete
    pytree)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(path),
            jax.tree.map(ocp.utils.to_shape_dtype_struct, target),
        )


def parse_checkpoint_name(path: str) -> tuple[int, float] | None:
    m = _NAME_RE.search(os.path.basename(os.path.normpath(path)))
    return (int(m.group(1)), float(m.group(2))) if m else None
