"""Label-masking / label-rewriting primitives shared by the three attacks.

All functions are pure, shape-static, and jit-safe, so they run inside the
compiled attack step instead of as per-row Python loops (the reference does the
same transforms with boolean indexing on host tensors).

Reference provenance:
  - TMA target overwrite:   VLAAttacker/white_patch/TMA.py:124-129 (+93-99 target build)
  - UADA mask_labels:       VLAAttacker/white_patch/UADA.py:371-379
  - UPA mask_labels:        VLAAttacker/white_patch/UPA.py:344-356 (same semantics)
  - UPA change_target:      VLAAttacker/white_patch/UPA.py:358-364
  - gripper filter:         VLAAttacker/white_patch/TMA.py:422-452
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .action_tokenizer import encode_actions_np
from .constants import (
    ACTION_DIM,
    ACTION_TOKEN_BEGIN_IDX,
    ACTION_TOKEN_MIN,
    ACTION_TOKEN_ZERO,
    ACTION_TOKEN_MAX,
    EOS_TOKEN_ID,
    IGNORE_INDEX,
)


def maskidx_to_onehot(maskidx: Sequence[int], length: int = ACTION_DIM + 1) -> np.ndarray:
    """Static boolean vector over the 7 action slots (+1 EOS slot) selected by
    ``--maskidx``. Kept host-side: maskidx is a CLI constant, never traced."""
    sel = np.zeros(length, dtype=bool)
    for i in maskidx:
        sel[int(i)] = True
    return sel


def build_tma_target_tokens(target_action: np.ndarray, maskidx: Sequence[int]) -> np.ndarray:
    """TMA's per-example target sequence: 7 action token ids + EOS, with every
    slot *not* in maskidx set to IGNORE_INDEX (TMA.py:93-99).

    The reference builds this by decoding the action tokens to text and
    re-tokenizing; arithmetic encoding produces identical ids.
    """
    tokens = encode_actions_np(np.asarray(target_action, dtype=np.float64))
    target = np.concatenate([tokens, np.array([EOS_TOKEN_ID], dtype=np.int64)])
    keep = maskidx_to_onehot(maskidx, length=target.shape[0])
    return np.where(keep, target, IGNORE_INDEX).astype(np.int32)


def overwrite_with_target(labels: jnp.ndarray, target_tokens: jnp.ndarray) -> jnp.ndarray:
    """Replace the non-ignored label positions of each row with
    ``target_tokens`` (length action_dim+1), preserving IGNORE elsewhere.

    Equivalent to TMA.py:124-129 ``temp_label[temp_label != -100] = target``:
    each row has exactly len(target_tokens) non-ignore labels (7 action + EOS).
    """
    valid = labels != IGNORE_INDEX
    # position of each valid label within its row's valid subsequence
    slot = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1
    slot = jnp.clip(slot, 0, target_tokens.shape[0] - 1)
    return jnp.where(valid, target_tokens[slot], labels)


def mask_labels(labels: jnp.ndarray, maskidx: Sequence[int]) -> jnp.ndarray:
    """UADA/UPA label masking: keep only the action slots in maskidx; all other
    *action-token* labels become IGNORE. EOS labels (==2) are left untouched
    (UADA.py:371-379 only rewrites positions with label > 2)."""
    is_action = labels > ACTION_TOKEN_BEGIN_IDX
    slot = jnp.cumsum(is_action.astype(jnp.int32), axis=-1) - 1
    slot = jnp.clip(slot, 0, ACTION_DIM - 1)
    keep = jnp.asarray(maskidx_to_onehot(maskidx, length=ACTION_DIM))[slot]
    return jnp.where(is_action & ~keep, IGNORE_INDEX, labels)


def change_target(labels: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """UPA 'guide' mode target flipping: labels at the zero bin flip to a
    random extreme; labels above it (action < 0) flip to the +1 token; all
    other valid labels below it — including the EOS label 2 — flip to the -1
    token.

    This implements the reference's *intent* (UPA.py:358-364), which is a
    known defect we fix (SURVEY.md §7): the reference mutates ``gt`` in place
    sequentially, so its ``gt>31872 -> 31744`` writes are re-caught by the
    final ``gt<31872 -> 31999`` pass and EVERY valid label collapses to 31999
    — a constant-target attack where the random flip and the sign flip are
    dead code. We evaluate all three conditions against the original labels
    instead, producing the directional sign-flip target the branches were
    written to express. The EOS-slot flip (EOS label 2 < 31872 -> 31999) is
    shared by both readings and kept."""
    valid = labels != IGNORE_INDEX
    coin = jax.random.bernoulli(rng, 0.5, labels.shape)
    flipped_zero = jnp.where(coin, ACTION_TOKEN_MIN, ACTION_TOKEN_MAX)
    out = jnp.where(valid & (labels == ACTION_TOKEN_ZERO), flipped_zero, labels)
    out = jnp.where(valid & (labels > ACTION_TOKEN_ZERO), ACTION_TOKEN_MIN, out)
    out = jnp.where(valid & (labels < ACTION_TOKEN_ZERO), ACTION_TOKEN_MAX, out)
    return out


def extract_action_tokens(labels: jnp.ndarray) -> jnp.ndarray:
    """Gather each row's 7 action-token labels into a dense [B, 7] array.

    The reference does ``labels[mask].view(-1, 7)``; with static shapes we sort
    action positions to the front instead. Rows are assumed to contain exactly
    ACTION_DIM action tokens (guaranteed by the batch transform).
    """
    is_action = labels > ACTION_TOKEN_BEGIN_IDX
    # argsort of ~is_action is stable -> action positions first, in order
    order = jnp.argsort(~is_action, axis=-1, stable=True)
    gathered = jnp.take_along_axis(labels, order[:, :ACTION_DIM], axis=-1)
    return gathered


def gripper_open_rows(labels: jnp.ndarray) -> jnp.ndarray:
    """Boolean [B]: rows whose 7th action dim (gripper) is the +1 token, used by
    --filterGripTrainTo1 (TMA.py:422-452)."""
    acts = extract_action_tokens(labels)
    return acts[:, ACTION_DIM - 1] == ACTION_TOKEN_MIN


def modify_labels_dict(labels: jnp.ndarray, target_action: dict) -> jnp.ndarray:
    """Secondary TMA label-rewrite API (modifiy_labels, TMA.py:385-396): for
    each row, overwrite the label at (first-valid-index + int(key)) with the
    given value; entries with value -100 are skipped."""
    valid = labels != IGNORE_INDEX
    first_valid = jnp.argmax(valid, axis=-1)  # [B]
    out = labels
    for key, value in target_action.items():
        if int(value) == IGNORE_INDEX:
            continue
        pos = first_valid + int(key)
        rows = jnp.arange(labels.shape[0])
        out = out.at[rows, pos].set(int(value))
    return out
