"""Uniform-bin action <-> token-id codec, as pure JAX (and NumPy) functions.

Mirrors the behavior of the reference `ActionTokenizer`
(/root/reference/prismatic/vla/action_tokenizer.py:31-68): 256 uniform bins over
[-1, 1] are mapped onto the *last 256 tokens* of the 32000-entry Llama vocab via
``token = vocab_size - digitize(action, bins)``, and decoded through the 255 bin
centers with the off-by-one clip the reference documents.

Unlike the reference (which round-trips through the text tokenizer), encoding is
pure integer arithmetic here, so the whole codec can live *inside* a jitted
attack step on TPU. Properties:
  - encode(+1.0) == 31744, encode(0.0) == 31872, encode(-1.0) == 31999
  - decode(encode(a)) == nearest bin center of a
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .constants import N_ACTION_BINS, VOCAB_SIZE

# Static bin geometry (float64 on host; cast on device as needed).
BINS = np.linspace(-1.0, 1.0, N_ACTION_BINS)
BIN_CENTERS = (BINS[:-1] + BINS[1:]) / 2.0


def encode_actions(actions: jnp.ndarray, vocab_size: int = VOCAB_SIZE) -> jnp.ndarray:
    """Continuous actions in [-1, 1] -> token ids in [31744, 31999].

    ``np.digitize(x, bins)`` for increasing bins equals
    ``searchsorted(bins, x, side='right')``; we clip to the valid range first
    exactly like the reference (action_tokenizer.py:40-41).
    """
    actions = jnp.clip(actions, -1.0, 1.0)
    bins = jnp.asarray(BINS, dtype=actions.dtype)
    discretized = jnp.searchsorted(bins, actions, side="right")
    # x == +1.0 digitizes to 256 via 'right' except that searchsorted('right')
    # of the exact max endpoint returns 256 already; x slightly above is clipped.
    return (vocab_size - discretized).astype(jnp.int32)


def decode_tokens(token_ids: jnp.ndarray, vocab_size: int = VOCAB_SIZE) -> jnp.ndarray:
    """Token ids -> continuous actions (bin centers), incl. the terminal clip.

    Mirrors action_tokenizer.py:65-68: ``centers[clip(vocab - id - 1, 0, 254)]``.
    """
    discretized = vocab_size - token_ids
    discretized = jnp.clip(discretized - 1, 0, BIN_CENTERS.shape[0] - 1)
    centers = jnp.asarray(BIN_CENTERS, dtype=jnp.float32)
    return centers[discretized]


def encode_actions_np(actions: np.ndarray, vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    """Host-side (NumPy) twin of :func:`encode_actions`, bit-identical to the
    reference's ``vocab_size - np.digitize(clip(a), bins)``."""
    actions = np.clip(actions, -1.0, 1.0)
    return (vocab_size - np.digitize(actions, BINS)).astype(np.int64)


def decode_tokens_np(token_ids: np.ndarray, vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    discretized = vocab_size - np.asarray(token_ids)
    discretized = np.clip(discretized - 1, 0, BIN_CENTERS.shape[0] - 1)
    return BIN_CENTERS[discretized]


def action_token_string(actions: np.ndarray) -> str:
    """Debug helper: the reference renders action tokens via tokenizer.decode;
    we render ids directly (no text tokenizer needed)."""
    return " ".join(str(int(t)) for t in encode_actions_np(np.asarray(actions)))
