"""Patch optimizer: AdamW (transformers-semantics) + cosine-warmup schedule.

The reference optimizes the patch with `transformers.AdamW` (betas 0.9/0.999,
eps 1e-6, no weight decay, bias correction) under
`get_cosine_schedule_with_warmup` (TMA.py:101-109) — with the quirk that the
*optimizer* steps once per inner loop while the *scheduler* steps once per
outer iteration boundary (TMA.py:164-181). We reproduce that exactly by
passing the LR for the current outer iteration into the jitted step.

State is a plain pytree (m, v, count) so it lives inside the compiled step and
is donated across iterations.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class AdamState(NamedTuple):
    m: jnp.ndarray
    v: jnp.ndarray
    count: jnp.ndarray  # int32 scalar


def adam_init(patch: jnp.ndarray) -> AdamState:
    return AdamState(
        m=jnp.zeros_like(patch), v=jnp.zeros_like(patch), count=jnp.zeros((), jnp.int32)
    )


def adamw_update(
    grad: jnp.ndarray,
    state: AdamState,
    patch: jnp.ndarray,
    lr: jnp.ndarray,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
) -> tuple[jnp.ndarray, AdamState]:
    """One AdamW step. Returns (new_patch, new_state). Matches the HF AdamW
    implementation (bias-corrected step size, eps outside the sqrt, decoupled
    weight decay)."""
    count = state.count + 1
    m = b1 * state.m + (1.0 - b1) * grad
    v = b2 * state.v + (1.0 - b2) * grad * grad
    cf = count.astype(jnp.float32)
    step_size = lr * jnp.sqrt(1.0 - b2**cf) / (1.0 - b1**cf)
    new_patch = patch - step_size * m / (jnp.sqrt(v) + eps)
    if weight_decay > 0.0:
        new_patch = new_patch - lr * weight_decay * patch
    return new_patch, AdamState(m=m, v=v, count=count)


def pgd_update(grad: jnp.ndarray, patch: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Signed-gradient PGD step (TMA.py:171-175)."""
    return patch - alpha * jnp.sign(grad)


def cosine_schedule_with_warmup(
    step: int, base_lr: float, warmup_steps: int, total_steps: int, num_cycles: float = 0.5
) -> float:
    """transformers.get_cosine_schedule_with_warmup, evaluated on host.

    `step` is the scheduler's step count = floor(outer_iter / accumulate).
    """
    if step < warmup_steps:
        return base_lr * float(step) / float(max(1, warmup_steps))
    progress = float(step - warmup_steps) / float(max(1, total_steps - warmup_steps))
    return base_lr * max(0.0, 0.5 * (1.0 + math.cos(math.pi * num_cycles * 2.0 * progress)))
