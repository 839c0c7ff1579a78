"""Checkpoint save/restore via Orbax (sharding-aware, async-capable).

Replaces the reference's torch checkpointing zoo: DDP splinter-by-module
`step-XXXX-epoch-YY-loss=Z.pt` + latest copy (strategies/ddp.py:26-53) and the
FSDP rank-0 CPU-offloaded full-state-dict save (fsdp.py:95-120). Orbax writes
each shard from the host that owns it — no offload gymnastics needed.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(
    directory: str,
    step: int,
    params: Dict,
    opt_state: Any = None,
    epoch: int = 0,
    loss: Optional[float] = None,
    keep_latest_copy: bool = True,
) -> str:
    """Write <dir>/step-{step:06d}-epoch-{epoch:02d}[-loss={loss}] (the
    reference's naming scheme) and refresh <dir>/latest-checkpoint."""
    ocp = _ckptr()
    name = f"step-{step:06d}-epoch-{epoch:02d}"
    if loss is not None:
        name += f"-loss={loss:.4f}"
    path = os.path.abspath(os.path.join(directory, name))
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    if keep_latest_copy:
        latest = os.path.abspath(os.path.join(directory, "latest-checkpoint"))
        if os.path.islink(latest) or os.path.exists(latest):
            if os.path.islink(latest):
                os.unlink(latest)
            else:
                shutil.rmtree(latest)
        os.symlink(path, latest)
    return path


def restore_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    ocp = _ckptr()
    path = os.path.abspath(path)
    if os.path.basename(path) == "latest-checkpoint" or os.path.islink(path):
        path = os.path.realpath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, item=template)
        return ckptr.restore(path)


def latest_checkpoint(directory: str) -> Optional[str]:
    latest = os.path.join(directory, "latest-checkpoint")
    return os.path.realpath(latest) if os.path.exists(latest) else None
