"""The fused attack step: the framework's hot path.

One call = one reference 'outer iteration': `innerLoop` rounds of
  re-randomized patch placement/affine -> dual normalize -> frozen-VLM fwd/bwd
  w.r.t. the patch pixels only -> AdamW/PGD update -> clamp to [0, 1]
as a single jitted XLA program with `lax.scan` over the inner loop
(vs the reference's Python loop with per-step `.item()` syncs, TMA.py:113-175).

Data parallelism: call `shard_batch` on the inputs and the same jitted step
runs DDP-equivalently — batch sharded over the mesh's 'data' axis, patch and
weights replicated; XLA inserts the gradient all-reduce that torch DDP does by
hand (UADA_ddp.py:166). See parallel/mesh.py.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import VLAConfig
from ..models.vlm import vla_forward
from ..ops.patch_ops import apply_patch_batch
from ..utils.labels import mask_labels as _mask_labels
from ..utils.labels import overwrite_with_target
from ..utils.normalization import dual_normalize
from ..utils.action_tokenizer import decode_tokens
from ..utils.constants import ACTION_TOKEN_ZERO as ACTION_TOKEN_ZERO_
from .losses import (
    action_preds_and_mask,
    clip_grad_l1,
    per_dim_relative_distance,
    per_example_metrics,
    tma_metrics,
    uada_loss,
    upa_loss,
)
from .optimizer import AdamState, adam_init, adamw_update, pgd_update


class AttackBatch(NamedTuple):
    """One data batch. images are *raw* [B, H, W, 3] float32 in [0, 1] —
    patching happens before normalization, exactly like the reference (the
    RLDS transform keeps raw PIL frames, RLDSBatchTransform.py:42)."""

    images: jnp.ndarray
    input_ids: jnp.ndarray
    attention_mask: jnp.ndarray
    labels: jnp.ndarray


class AttackState(NamedTuple):
    patch: jnp.ndarray          # [ph, pw, 3] float32 in [0, 1]
    opt: AdamState
    grad_acc: jnp.ndarray       # accumulation buffer (reference zero-grad quirk)


class AttackSpec(NamedTuple):
    """Static attack configuration (hashable; closed over by the jitted step)."""

    objective: str = "tma"          # tma | uada | upa | upa_guide | upa_negce
    geometry: bool = True
    resize_patch: bool = False
    inner_loop: int = 50
    accumulate_steps: int = 1
    optimizer: str = "adamW"        # adamW | pgd
    pgd_alpha: float = 2e-3
    mse_weight: float = 5.0         # UADA (--MSE_weights in DDP variant)
    add_inverse_ce: bool = True     # UADA single-device keeps +1/CE; DDP drops it
    upa_alpha: float = 0.8
    upa_beta: float = 0.2
    grad_clip_l1: Optional[float] = None  # UPA uses 1e-3 (UPA.py:157)


def init_attack_state(rng: jax.Array, patch_hw: Tuple[int, int]) -> AttackState:
    """patch = U[0,1) init (TMA.py:90)."""
    patch = jax.random.uniform(rng, (patch_hw[0], patch_hw[1], 3), dtype=jnp.float32)
    return AttackState(patch=patch, opt=adam_init(patch), grad_acc=jnp.zeros_like(patch))


def _objective_loss(
    spec: AttackSpec, cfg: VLAConfig, out, labels: jnp.ndarray
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    ce = out.loss
    if spec.objective == "tma":
        m = tma_metrics(out.logits, labels, ce, cfg)
        return ce, {"ce": ce, "l1": m.l1, "asr": m.asr, "rel_dist": m.relative_distance}
    if spec.objective == "uada":
        r = uada_loss(
            out.logits, labels, ce, cfg,
            mse_weight=spec.mse_weight, add_inverse_ce=spec.add_inverse_ce,
        )
        return r.loss, {"ce": ce, "mse_distance": r.mse_distance, "uad": r.uad}
    if spec.objective == "upa":
        r = upa_loss(out.logits, labels, ce, cfg, alpha=spec.upa_alpha, beta=spec.upa_beta)
        return r.loss, {"ce": ce, "angle": r.angle_loss, "distance": r.distance_loss}
    if spec.objective == "upa_guide":
        return ce, {"ce": ce}
    if spec.objective == "upa_negce":
        return -ce, {"ce": ce}
    raise ValueError(f"unknown objective {spec.objective}")


def _inner_step(
    spec: AttackSpec,
    cfg: VLAConfig,
    params: Dict,
    state: AttackState,
    batch: AttackBatch,
    labels: jnp.ndarray,
    lr: jnp.ndarray,
    apply_update: jnp.ndarray,
    rng: jax.Array,
) -> Tuple[AttackState, Dict[str, jnp.ndarray]]:
    def loss_fn(patch):
        patched = apply_patch_batch(
            batch.images, patch, rng, geometry=spec.geometry, resize_patch=spec.resize_patch
        )
        pixels = dual_normalize(patched).astype(jnp.dtype(cfg.dtype))
        out = vla_forward(params, cfg, batch.input_ids, batch.attention_mask, pixels, labels)
        loss, metrics = _objective_loss(spec, cfg, out, labels)
        if spec.objective == "tma":
            loss = loss / spec.accumulate_steps
        return loss, metrics

    (loss, metrics), grad = jax.value_and_grad(loss_fn, has_aux=True)(state.patch)
    metrics = dict(metrics, loss=loss, grad_mean=jnp.mean(grad))

    grad_total = state.grad_acc + grad
    # Clip only at optimizer-step time (UPA.py:155-158); the accumulation
    # buffer keeps raw gradients — clipping the running buffer each inner step
    # would repeatedly rescale (annihilate) earlier contributions.
    update_grad = grad_total
    if spec.grad_clip_l1 is not None:
        update_grad = clip_grad_l1(grad_total, spec.grad_clip_l1)

    if spec.optimizer == "adamW":
        new_patch, new_opt = adamw_update(update_grad, state.opt, state.patch, lr)
    elif spec.optimizer == "pgd":
        new_patch, new_opt = pgd_update(update_grad, state.patch, spec.pgd_alpha), state.opt
    else:
        raise ValueError(f"unknown optimizer {spec.optimizer}")
    new_patch = jnp.clip(new_patch, 0.0, 1.0)

    # On non-update iterations (grad accumulation), keep accumulating instead.
    patch = jnp.where(apply_update, new_patch, state.patch)
    opt = jax.tree.map(
        lambda new, old: jnp.where(apply_update, new, old), new_opt, state.opt
    )
    grad_acc = jnp.where(apply_update, jnp.zeros_like(grad_total), grad_total)
    return AttackState(patch=patch, opt=opt, grad_acc=grad_acc), metrics


def make_attack_step(spec: AttackSpec, cfg: VLAConfig, target_tokens: Optional[np.ndarray],
                     maskidx: Sequence[int]):
    """Build the jitted outer-iteration function.

    Returns step(params, state, batch, lr, apply_update, rng) ->
    (state, metrics) where metrics values are [inner_loop]-stacked.
    """
    maskidx = tuple(maskidx)
    target = jnp.asarray(target_tokens) if target_tokens is not None else None

    def prepare_labels(labels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
        if spec.objective == "tma":
            return overwrite_with_target(labels, target)
        if spec.objective == "uada" or spec.objective == "upa_negce":
            return _mask_labels(labels, maskidx)
        if spec.objective == "upa_guide":
            from ..utils.labels import change_target

            # guide mode is reached via the non-reverse path, which applies
            # mask_labels BEFORE change_target (UPA.py:128-131): only the
            # --maskidx action dims (+ EOS) get flipped targets.
            return change_target(_mask_labels(labels, maskidx), rng)
        return labels  # upa reverse-direction keeps raw labels (UPA.py:127-131)

    def step(params, state: AttackState, batch: AttackBatch, lr, apply_update, rng):
        k_label, k_inner = jax.random.split(rng)
        labels = prepare_labels(batch.labels, k_label)
        keys = jax.random.split(k_inner, spec.inner_loop)

        def body(st, key):
            st, metrics = _inner_step(
                spec, cfg, params, st, batch, labels, lr, apply_update, key
            )
            return st, metrics

        state, metrics = jax.lax.scan(body, state, keys)
        return state, metrics

    return jax.jit(step, donate_argnums=(1,))


# --- Validation scorer -----------------------------------------------------------

def make_val_step(spec: AttackSpec, cfg: VLAConfig, target_tokens: Optional[np.ndarray],
                  maskidx: Sequence[int]):
    """Jitted no-grad scorer for the eval cadence (TMA.py:202-318).

    Returns val(params, patch, batch, rng) -> dict of scalar metrics plus
    per-example extras needed for the reference's host-side aggregation.
    The clean-image forward that feeds the gripper pre-filter (TMA.py:223-250)
    is only compiled in when maskidx == [6] — it would otherwise double the
    val cost for nothing.
    """
    maskidx = tuple(maskidx)
    need_clean_filter = len(maskidx) == 1 and maskidx[0] == 6
    target = jnp.asarray(target_tokens) if target_tokens is not None else None

    def val(params, patch, batch: AttackBatch, rng):
        k_label, k_patch, k_clean = jax.random.split(rng, 3)
        if spec.objective == "tma":
            labels = overwrite_with_target(batch.labels, target)
        elif spec.objective in ("uada", "upa_negce"):
            labels = _mask_labels(batch.labels, maskidx)
        elif spec.objective == "upa_guide":
            from ..utils.labels import change_target

            labels = change_target(_mask_labels(batch.labels, maskidx), k_label)
        else:
            labels = batch.labels

        patched = apply_patch_batch(
            batch.images, patch, k_patch, geometry=spec.geometry, resize_patch=spec.resize_patch
        )
        pixels = dual_normalize(patched).astype(jnp.dtype(cfg.dtype))
        out = vla_forward(params, cfg, batch.input_ids, batch.attention_mask, pixels, labels)
        loss, metrics = _objective_loss(spec, cfg, out, labels)
        metrics = dict(metrics, loss=loss)

        base_obj = "upa" if spec.objective.startswith("upa") else spec.objective
        per_ex = per_example_metrics(out.logits, labels, cfg, base_obj, spec.mse_weight)
        metrics.update({f"ex_{k}": v for k, v in per_ex.items()})

        # gripper flip accounting runs against the ORIGINAL labels
        # (calculate_01_ASR is called with gt=labels[:,1:], TMA.py:291 — the
        # pre-overwrite batch labels), per-example so the host can apply the
        # clean-correct filter before aggregating
        o_preds, o_gt, o_mask = action_preds_and_mask(out.logits, batch.labels, cfg)
        order_all = jnp.argsort(~o_mask, axis=-1, stable=True)
        grip_slot = order_all[:, 6][:, None]
        metrics["gripper_pred_token"] = jnp.take_along_axis(o_preds, grip_slot, 1)[:, 0]
        metrics["gripper_gt_token"] = jnp.take_along_axis(o_gt, grip_slot, 1)[:, 0]

        preds, gt, mask = action_preds_and_mask(out.logits, labels, cfg)

        if not need_clean_filter:
            metrics["clean_gripper_correct"] = jnp.ones(batch.images.shape[0], bool)
        # else: the clean-image pre-filter forward lives in its OWN compiled
        # program (make_clean_filter_step) and the runner merges its output —
        # fusing a SECOND full forward into this program pushes the 7B val
        # compile over HBM (XLA adds ~3 GB of transposed weight-stack copies
        # on top of 13.97 GB of args; measured round 3, objective-independent:
        # any maskidx==[6] val OOMs fused, every single-forward val fits)

        # per-dim relative distance for UADA logging (UADA.py:354-369)
        if spec.objective == "uada" and len(maskidx) > 0:
            pred_act = decode_tokens(preds)
            gt_act = decode_tokens(jnp.where(mask, gt, ACTION_TOKEN_ZERO_))
            rd = per_dim_relative_distance(pred_act, gt_act, mask, maskidx)
            metrics.update({f"rd_{k}": v for k, v in rd.items()})
        # example image for artifact dumps: first patched image, denormalized
        metrics["_patched_images"] = patched
        return metrics

    return jax.jit(val)


def make_clean_filter_step(cfg: VLAConfig):
    """Jitted clean-image gripper pre-filter (TMA.py:223-250): per-example
    correctness of the gripper dim on the UNPATCHED image. Kept as its own
    compiled program — see the note in make_val_step."""

    def clean(params, batch: AttackBatch):
        pixels = dual_normalize(batch.images).astype(jnp.dtype(cfg.dtype))
        out = vla_forward(params, cfg, batch.input_ids, batch.attention_mask, pixels, None)
        c_preds, c_gt, c_mask = action_preds_and_mask(out.logits, batch.labels, cfg)
        # last action token per row == gripper dim
        order = jnp.argsort(~c_mask, axis=-1, stable=True)
        last = order[:, 6]
        return jnp.take_along_axis(c_preds, last[:, None], 1)[:, 0] == jnp.take_along_axis(
            c_gt, last[:, None], 1
        )[:, 0]

    return jax.jit(clean)
