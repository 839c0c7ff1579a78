"""Explicit shard_map data-parallel attack step — exact torch-DDP semantics.

The default path (attacks/engine.py under a sharded batch) computes the
GLOBAL-mean loss and lets GSPMD insert the collectives — mathematically the
cleanest formulation. torch DDP (UADA_ddp.py:144-221) instead averages the
PER-RANK gradients of PER-RANK mean losses: when ranks see different numbers
of valid action tokens, the two differ by the token-count weighting.

This module reproduces the reference's semantics exactly with `shard_map`:
  - each device computes grad of its LOCAL mean loss on its batch shard
    (per-rank CE mean, per-rank masked means);
  - `lax.pmean(grad, 'data')` replaces the DDP bucket all-reduce
    (average-of-rank-gradients);
  - metrics are `lax.pmean`'d, matching `dist.all_reduce(AVG)`
    (UADA_ddp.py:214-221);
  - the (replicated) patch update runs identically on every device.

Use whichever matches your comparison target; both are tested equivalent on
uniform shards (tests/test_ddp_shard_map.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.config import VLAConfig
from ..models.vlm import vla_forward
from ..ops.patch_ops import apply_patch_batch
from ..utils.labels import mask_labels as _mask_labels
from ..utils.labels import overwrite_with_target
from ..utils.normalization import dual_normalize
from .engine import AttackBatch, AttackSpec, AttackState
from .losses import clip_grad_l1, tma_metrics, uada_loss, upa_loss
from .optimizer import adamw_update, pgd_update


def _local_loss(spec: AttackSpec, cfg: VLAConfig, params, patch, batch, labels, rng):
    patched = apply_patch_batch(
        batch.images, patch, rng, geometry=spec.geometry, resize_patch=spec.resize_patch
    )
    pixels = dual_normalize(patched).astype(jnp.dtype(cfg.dtype))
    out = vla_forward(params, cfg, batch.input_ids, batch.attention_mask, pixels, labels)
    ce = out.loss
    if spec.objective == "tma":
        m = tma_metrics(out.logits, labels, ce, cfg)
        return ce, {"ce": ce, "l1": m.l1}
    if spec.objective == "uada":
        r = uada_loss(out.logits, labels, ce, cfg, mse_weight=spec.mse_weight,
                      add_inverse_ce=spec.add_inverse_ce)
        return r.loss, {"ce": ce, "mse_distance": r.mse_distance, "uad": r.uad}
    if spec.objective == "upa_guide":
        return ce, {"ce": ce}
    if spec.objective == "upa_negce":
        return -ce, {"ce": ce}
    r = upa_loss(out.logits, labels, ce, cfg, alpha=spec.upa_alpha, beta=spec.upa_beta)
    return r.loss, {"ce": ce, "angle": r.angle_loss, "distance": r.distance_loss}


def make_ddp_attack_step(
    spec: AttackSpec,
    cfg: VLAConfig,
    target_tokens: Optional[np.ndarray],
    maskidx: Sequence[int],
    mesh: Mesh,
):
    """step(params, state, batch, lr, rng) -> (state, metrics). `batch` must be
    sharded over mesh axis 'data'; params/state replicated."""
    maskidx = tuple(maskidx)
    if spec.accumulate_steps != 1:
        raise NotImplementedError(
            "make_ddp_attack_step supports accumulate_steps=1 only (the "
            "reference DDP variant, UADA_ddp.py, has no accumulation either); "
            "use the default engine step for accumulation"
        )
    target = jnp.asarray(target_tokens) if target_tokens is not None else None

    def prepare_labels(labels, rng):
        if spec.objective == "tma":
            return overwrite_with_target(labels, target)
        if spec.objective in ("uada", "upa_negce"):
            return _mask_labels(labels, maskidx)
        if spec.objective == "upa_guide":
            from ..utils.labels import change_target

            # non-reverse path applies mask_labels before change_target
            # (UPA.py:128-131)
            return change_target(_mask_labels(labels, maskidx), rng)
        return labels

    def per_device(params, state: AttackState, batch: AttackBatch, lr, rng):
        # Split once (no key reuse between the label coin and the inner
        # placement streams) and give each rank its own label-flip stream,
        # mirroring the reference's per-rank torch RNG (UADA_ddp.py:81-87).
        k_label, k_inner = jax.random.split(rng)
        k_label = jax.random.fold_in(k_label, jax.lax.axis_index("data"))
        labels = prepare_labels(batch.labels, k_label)
        keys = jax.random.split(k_inner, spec.inner_loop)

        def inner(st: AttackState, key):
            # per-image placement RNG must differ across devices: fold in the
            # device index (the reference's per-rank torch RNG streams)
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            (loss, aux), grad = jax.value_and_grad(
                lambda p: _local_loss(spec, cfg, params, p, batch, labels, key),
                has_aux=True,
            )(st.patch)
            # THE DDP all-reduce: average of per-rank gradients
            grad = jax.lax.pmean(grad, "data")
            if spec.grad_clip_l1 is not None:
                grad = clip_grad_l1(grad, spec.grad_clip_l1)
            if spec.optimizer == "adamW":
                new_patch, new_opt = adamw_update(grad, st.opt, st.patch, lr)
            else:
                new_patch, new_opt = pgd_update(grad, st.patch, spec.pgd_alpha), st.opt
            new_patch = jnp.clip(new_patch, 0.0, 1.0)
            metrics = {k: jax.lax.pmean(v, "data") for k, v in aux.items()}
            metrics["loss"] = jax.lax.pmean(loss, "data")
            metrics["grad_mean"] = jnp.mean(grad)
            return AttackState(patch=new_patch, opt=new_opt, grad_acc=st.grad_acc), metrics

        return jax.lax.scan(inner, state, keys)

    batch_spec = AttackBatch(P("data"), P("data"), P("data"), P("data"))

    shard_fn = jax.shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(shard_fn, donate_argnums=(1,))
