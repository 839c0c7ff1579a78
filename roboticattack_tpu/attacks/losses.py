"""Attack objectives (TMA / UADA / UPA) and their metrics, as pure jit-safe
functions over (logits, labels).

The reference computes these with boolean indexing + host round-trips through
the tokenizer (UADA.py:381-418, UPA.py:367-387, TMA.py:470-483); here every
select is a static-shape masked reduction so the whole objective — including
the de-tokenize — stays inside the compiled step on TPU.

Conventions:
  logits: [B, P + S, V] fp32 (P = num image patches, S = text length)
  labels: [B, S] with IGNORE_INDEX outside the 7 action tokens (+EOS)
  `action slice` of the vocab: [31744, 32000) — slot 0 <-> token 31744 <->
  action ~ +1; slot 255 <-> token 31999 <-> action ~ -1.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.config import VLAConfig
from ..models.vlm import action_logit_slice
from ..utils.action_tokenizer import decode_tokens
from ..utils.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    ACTION_TOKEN_MIN,
    ACTION_TOKEN_ZERO,
    IGNORE_INDEX,
    N_ACTION_BINS,
)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cosine_similarity(x: jnp.ndarray, y: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """F.cosine_similarity semantics over the last axis: EACH vector's norm is
    clamped to eps separately (torch clamps per-norm, not the product — the
    reference calls it at UPA.py:382). On degenerate near-zero vectors
    max(prod, eps) gives a different value; both the UPA train loss and the
    per-example val metric must use this one helper so they agree
    (property-tested vs torch on zero/tiny vectors in tests/test_losses.py)."""
    dot = jnp.sum(x * y, axis=-1)
    nx = jnp.maximum(jnp.linalg.norm(x, axis=-1), eps)
    ny = jnp.maximum(jnp.linalg.norm(y, axis=-1), eps)
    return dot / (nx * ny)


def shifted_action_logits(logits: jnp.ndarray, cfg: VLAConfig, text_len: int) -> jnp.ndarray:
    """[B, S-1, V]: position j predicts labels[:, 1 + j] (TMA.py:151)."""
    return action_logit_slice(logits, cfg, text_len)


def action_preds_and_mask(
    logits: jnp.ndarray, labels: jnp.ndarray, cfg: VLAConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(argmax token preds [B, S-1], gt labels [B, S-1], action mask [B, S-1])."""
    sl = shifted_action_logits(logits, cfg, labels.shape[1])
    preds = jnp.argmax(sl, axis=-1)
    gt = labels[:, 1:]
    mask = gt > ACTION_TOKEN_BEGIN_IDX
    return preds, gt, mask


# --- TMA metrics ---------------------------------------------------------------

def relative_distance_target(
    pred_actions: jnp.ndarray, gt_actions: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """mean over masked tokens of |pred - gt| / max(1 - gt, gt + 1)
    (TMA.py:470-483)."""
    max_boundary = jnp.maximum(1.0 - gt_actions, gt_actions + 1.0)
    rel = jnp.abs(pred_actions - gt_actions) / max_boundary
    return _masked_mean(rel, mask)


class TMAMetrics(NamedTuple):
    ce_loss: jnp.ndarray
    l1: jnp.ndarray                  # mean |pred - gt| over masked tokens
    asr: jnp.ndarray                 # fraction of examples with ALL masked dims exact
    relative_distance: jnp.ndarray


def tma_metrics(
    logits: jnp.ndarray, target_labels: jnp.ndarray, ce_loss: jnp.ndarray, cfg: VLAConfig
) -> TMAMetrics:
    preds, gt, mask = action_preds_and_mask(logits, target_labels, cfg)
    pred_act = decode_tokens(preds)
    gt_act = decode_tokens(jnp.where(mask, gt, ACTION_TOKEN_ZERO))
    l1 = _masked_mean(jnp.abs(pred_act - gt_act), mask)
    rel = relative_distance_target(pred_act, gt_act, mask)
    # per-example success: every masked dim's decoded action matches exactly
    per_tok_ok = (pred_act == gt_act) | ~mask
    has_any = mask.any(axis=-1)
    asr = _masked_mean(per_tok_ok.all(axis=-1).astype(jnp.float32), has_any)
    return TMAMetrics(ce_loss=ce_loss, l1=l1, asr=asr, relative_distance=rel)


def gripper_asr_counts(
    preds: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """calculate_01_ASR (TMA.py:398-420): flip counts for gripper targets.
    Returns raw counts so callers can aggregate across batches/devices."""
    m = mask
    gt_is_zero = (gt == ACTION_TOKEN_ZERO) & m
    gt_is_one = (gt == ACTION_TOKEN_MIN) & m
    gt_other = m & (gt != ACTION_TOKEN_ZERO) & (gt != ACTION_TOKEN_MIN)
    return {
        "zero_flipped": jnp.sum(gt_is_zero & (preds != ACTION_TOKEN_ZERO)),
        "zero_total": jnp.sum(gt_is_zero),
        "one_flipped": jnp.sum(gt_is_one & (preds != ACTION_TOKEN_MIN)),
        "one_total": jnp.sum(gt_is_one),
        "other_to_zero": jnp.sum(gt_other & (preds == ACTION_TOKEN_ZERO)),
        "other_total": jnp.sum(gt_other),
    }


# --- UADA -----------------------------------------------------------------------

class UADAResult(NamedTuple):
    loss: jnp.ndarray            # MSE distance (+ 1/CE if enabled)
    mse_distance: jnp.ndarray
    uad: jnp.ndarray
    ce_loss: jnp.ndarray


def uada_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ce_loss: jnp.ndarray,
    cfg: VLAConfig,
    mse_weight: float = 5.0,
    add_inverse_ce: bool = True,
) -> UADAResult:
    """UADA soft expected-bin loss (UADA.py:381-406).

    expectation E = sum softmax(action-slice logits) * (i+1)/256 over the 256
    action slots; hard target = 0.0 for negative gt actions and 1.0 for
    gt >= 0; loss = MSE(w*E, w*target).

    Target-value quirk (reproduced faithfully): the reference assigns 1/256
    into an int64 label tensor (UADA.py:393), which silently truncates to 0 —
    so the effective far-bound target for negative actions is 0.0, slightly
    below the minimum attainable expectation 1/256. Same gradient direction,
    different loss floor; we match the executed behavior, not the intent.
    `add_inverse_ce` mirrors the single-device variant's `+ 1/celoss`
    (UADA.py:147); the DDP variant omits it (UADA_ddp.py:204-206) and exposes
    `mse_weight` as --MSE_weights.
    """
    sl = shifted_action_logits(logits, cfg, labels.shape[1])
    gt = labels[:, 1:]
    mask = gt > ACTION_TOKEN_BEGIN_IDX

    action_slice = sl[..., ACTION_TOKEN_MIN : ACTION_TOKEN_MIN + N_ACTION_BINS]
    probs = jax.nn.softmax(action_slice, axis=-1)
    reweigh = (jnp.arange(1, N_ACTION_BINS + 1, dtype=jnp.float32)) / N_ACTION_BINS
    expectation = jnp.sum(probs * reweigh, axis=-1)  # [B, S-1]

    # gt token > zero-token <=> action < 0 -> target 0.0 (the reference's
    # truncated 1/256; see docstring), else 1.0
    hard_target = jnp.where(gt > ACTION_TOKEN_ZERO, 0.0, 1.0)
    sq = (mse_weight * expectation - mse_weight * hard_target) ** 2
    mse_distance = _masked_mean(sq, mask)

    # UAD metric on argmax-decoded actions (cal_UAD, UADA.py:408-418)
    pred_tokens = jnp.argmax(action_slice, axis=-1) + ACTION_TOKEN_MIN
    pred_act = decode_tokens(pred_tokens)
    gt_act = decode_tokens(jnp.where(mask, gt, ACTION_TOKEN_ZERO))
    max_distance = jnp.where(gt_act > 0, jnp.abs(gt_act + 1.0), jnp.abs(gt_act - 1.0))
    uad = _masked_mean(jnp.abs(pred_act - gt_act) / max_distance, mask)

    loss = mse_distance + (1.0 / ce_loss if add_inverse_ce else 0.0)
    return UADAResult(loss=loss, mse_distance=mse_distance, uad=uad, ce_loss=ce_loss)


# --- UPA ------------------------------------------------------------------------

class UPAResult(NamedTuple):
    loss: jnp.ndarray
    angle_loss: jnp.ndarray
    distance_loss: jnp.ndarray
    ce_loss: jnp.ndarray


def upa_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ce_loss: jnp.ndarray,
    cfg: VLAConfig,
    alpha: float = 0.8,
    beta: float = 0.2,
) -> UPAResult:
    """UPA reverse-direction loss (UPA.py:367-387): make the predicted XYZ
    direction anti-parallel (cos-sim -> -1) and far (1/dist -> 0) from gt.

    xyz pred = softmax-expected slot index over the action slice at the first
    three action-token positions, affinely mapped to [0, 1]; xyz gt = the gt
    slot index mapped the same way.
    """
    sl = shifted_action_logits(logits, cfg, labels.shape[1])
    gt = labels[:, 1:]
    is_action = gt > ACTION_TOKEN_BEGIN_IDX

    action_slice = sl[..., ACTION_TOKEN_MIN : ACTION_TOKEN_MIN + N_ACTION_BINS]
    probs = jax.nn.softmax(action_slice, axis=-1)
    reweigh = jnp.arange(1, N_ACTION_BINS + 1, dtype=jnp.float32)
    expectation = jnp.sum(probs * reweigh, axis=-1)  # [B, S-1], in [1, 256]

    # first three action tokens per row == xyz (stable sort gathers them)
    order = jnp.argsort(~is_action, axis=-1, stable=True)[:, :3]
    xyz_pred = jnp.take_along_axis(expectation, order, axis=-1)
    xyz_gt_tok = jnp.take_along_axis(gt, order, axis=-1)
    xyz_pred = (xyz_pred - 1.0) / (N_ACTION_BINS - 1.0)
    xyz_gt = (xyz_gt_tok - (ACTION_TOKEN_BEGIN_IDX + 1)).astype(jnp.float32) / (
        N_ACTION_BINS - 1.0
    )

    angle_loss = jnp.mean(cosine_similarity(xyz_pred, xyz_gt) + 1.0)
    distance_loss = 1.0 / (jnp.mean(jnp.linalg.norm(xyz_pred - xyz_gt, axis=-1)) + 1e-3)
    loss = alpha * angle_loss + beta * distance_loss
    return UPAResult(loss=loss, angle_loss=angle_loss, distance_loss=distance_loss, ce_loss=ce_loss)


# --- shared: per-dim relative distance (UADA logging, UADA.py:354-369) ----------

def per_dim_relative_distance(
    pred_actions: jnp.ndarray, gt_actions: jnp.ndarray, mask: jnp.ndarray,
    maskidx: Sequence[int],
) -> Dict[str, jnp.ndarray]:
    """Mean relative distance per selected action dim. pred/gt: [B, S-1]
    decoded actions; mask: action-token mask. Each row's k-th masked token is
    the maskidx[k]-th action dim."""
    order = jnp.argsort(~mask, axis=-1, stable=True)[:, : len(maskidx)]
    p = jnp.take_along_axis(pred_actions, order, axis=-1)
    g = jnp.take_along_axis(gt_actions, order, axis=-1)
    max_boundary = jnp.maximum(1.0 - g, g + 1.0)
    rel = jnp.abs(p - g) / max_boundary  # [B, k]
    return {str(d): jnp.mean(rel[:, k]) for k, d in enumerate(maskidx)}


# --- per-example metrics (for val aggregation with host-side example filters) ---

def _row_masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def per_example_ce(logits: jnp.ndarray, labels: jnp.ndarray, cfg: VLAConfig) -> jnp.ndarray:
    """[B]: mean CE over each row's valid (non-IGNORE) shifted labels."""
    sl = shifted_action_logits(logits, cfg, labels.shape[1])
    gt = labels[:, 1:]
    valid = gt != IGNORE_INDEX
    lp = jax.nn.log_softmax(sl, axis=-1)
    tok = jnp.take_along_axis(lp, jnp.where(valid, gt, 0)[..., None], axis=-1)[..., 0]
    return _row_masked_mean(-tok, valid)


def per_example_metrics(
    logits: jnp.ndarray, labels: jnp.ndarray, cfg: VLAConfig, objective: str,
    mse_weight: float = 5.0,
) -> Dict[str, jnp.ndarray]:
    """Per-row versions of each objective's val metrics; host code selects and
    averages over whichever example subset the protocol requires
    (e.g. the clean-gripper-correct filter, TMA.py:223-250)."""
    preds, gt, mask = action_preds_and_mask(logits, labels, cfg)
    pred_act = decode_tokens(preds)
    gt_act = decode_tokens(jnp.where(mask, gt, ACTION_TOKEN_ZERO))
    out: Dict[str, jnp.ndarray] = {"ce": per_example_ce(logits, labels, cfg)}

    if objective == "tma":
        out["l1"] = _row_masked_mean(jnp.abs(pred_act - gt_act), mask)
        per_tok_ok = (pred_act == gt_act) | ~mask
        out["success"] = per_tok_ok.all(axis=-1).astype(jnp.float32)
        max_boundary = jnp.maximum(1.0 - gt_act, gt_act + 1.0)
        out["rel_dist"] = _row_masked_mean(jnp.abs(pred_act - gt_act) / max_boundary, mask)
    elif objective == "uada":
        sl = shifted_action_logits(logits, cfg, labels.shape[1])
        action_slice = sl[..., ACTION_TOKEN_MIN : ACTION_TOKEN_MIN + N_ACTION_BINS]
        probs = jax.nn.softmax(action_slice, axis=-1)
        reweigh = jnp.arange(1, N_ACTION_BINS + 1, dtype=jnp.float32) / N_ACTION_BINS
        expectation = jnp.sum(probs * reweigh, axis=-1)
        hard = jnp.where(gt > ACTION_TOKEN_ZERO, 0.0, 1.0)
        out["mse_distance"] = _row_masked_mean(
            (mse_weight * expectation - mse_weight * hard) ** 2, mask
        )
        max_d = jnp.where(gt_act > 0, jnp.abs(gt_act + 1.0), jnp.abs(gt_act - 1.0))
        out["uad"] = _row_masked_mean(jnp.abs(pred_act - gt_act) / max_d, mask)
    elif objective.startswith("upa"):
        sl = shifted_action_logits(logits, cfg, labels.shape[1])
        action_slice = sl[..., ACTION_TOKEN_MIN : ACTION_TOKEN_MIN + N_ACTION_BINS]
        probs = jax.nn.softmax(action_slice, axis=-1)
        reweigh = jnp.arange(1, N_ACTION_BINS + 1, dtype=jnp.float32)
        expectation = jnp.sum(probs * reweigh, axis=-1)
        order = jnp.argsort(~mask, axis=-1, stable=True)[:, :3]
        xyz_pred = (jnp.take_along_axis(expectation, order, axis=-1) - 1.0) / (N_ACTION_BINS - 1.0)
        xyz_gt = (
            jnp.take_along_axis(gt, order, axis=-1) - (ACTION_TOKEN_BEGIN_IDX + 1)
        ).astype(jnp.float32) / (N_ACTION_BINS - 1.0)
        out["angle"] = cosine_similarity(xyz_pred, xyz_gt) + 1.0
        out["xyz_dist"] = jnp.linalg.norm(xyz_pred - xyz_gt, axis=-1)
    return out


def clip_grad_l1(grad: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """torch.nn.utils.clip_grad_norm_(norm_type=1) semantics (UPA.py:157)."""
    total = jnp.sum(jnp.abs(grad))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return grad * scale
