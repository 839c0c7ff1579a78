"""Multi-host initialization: the torchrun replacement.

The reference launches DDP with `torchrun --nproc_per_node=N` + NCCL
rendezvous (UADA_wrapper_ddp.py, README.md:107-126). On TPU pods, one process
per host calls `initialize_multihost()`; JAX's coordination service plays the
rendezvous role and every jitted computation then spans all hosts' devices
automatically — the attack code is unchanged (single-controller SPMD).
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Call once per host before any jax operation on a multi-host slice.

    On Cloud TPU slices all arguments auto-detect from the metadata server;
    explicit values support torchrun-style env plumbing (MASTER_ADDR / RANK /
    WORLD_SIZE are honored as fallbacks)."""
    import jax

    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", "8476")
        coordinator_address = f"{os.environ['MASTER_ADDR']}:{port}"
        num_processes = num_processes or int(os.environ.get("WORLD_SIZE", "1"))
        process_id = process_id if process_id is not None else int(os.environ.get("RANK", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    print(
        f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
