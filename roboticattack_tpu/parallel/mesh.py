"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's torchrun/NCCL DDP stack (UADA_ddp.py, §2.6 of SURVEY.md).

Semantics mapping:
  DDP gradient bucket allreduce  -> batch sharded over the 'data' axis; the
                                    patch (the only trainable tensor) stays
                                    replicated, and XLA inserts the psum when
                                    differentiating the global-mean loss.
  dist.broadcast(patch, src=0)   -> replicated device_put of the host patch.
  all_reduce(AVG/MAX) on metrics -> metrics are computed as global reductions
                                    inside the jitted step; nothing to do.
  torchrun rendezvous            -> jax.distributed.initialize() (multi-host).

An optional 'model' axis tensor-parallelizes the frozen 7B weights over ICI
when one chip's HBM can't hold weights + activations (v5e: 16 GB)."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (data, model, len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def make_serving_mesh(tp: int = 1, dp: int = 1) -> Optional[Mesh]:
    """The ONE dp x tp serving-mesh constructor behind `--tp/--dp` on
    cli.serve, cli.eval_libero, and scripts/bench_decode (three CLIs, one
    error behavior): grids the first dp*tp attached devices, returns None
    for the 1x1 case, and raises a clear error — not make_mesh's bare
    AssertionError — when the box has too few devices."""
    if tp <= 1 and dp <= 1:
        return None
    need = tp * dp
    have = len(jax.devices())
    if have < need:
        raise ValueError(
            f"--dp {dp} x --tp {tp} needs >= {need} devices; this process "
            f"has {have} attached"
        )
    return make_mesh(data=dp, model=tp, devices=jax.devices()[:need])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over 'data'; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array of an AttackBatch (or any pytree of per-example
    arrays) with its batch dim split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def process_zero() -> bool:
    """rank-0 gate for artifact/wandb writes (UADA_ddp.py:229-231)."""
    return jax.process_index() == 0
