"""Action normalization (BOUNDS_Q99) and image normalization statistics.

Reference provenance:
  - BOUNDS_Q99 normalize:  prismatic/vla/datasets/rlds/utils/data_utils.py:61-103
      clip(2 * (x - q01) / (q99 - q01 + 1e-8) - 1, -1, 1); dims where the mask
      is False pass through unchanged.
  - unnormalize:           prismatic/extern/hf/modeling_prismatic.py:527-534
      where(mask, 0.5 * (a + 1) * (q99 - q01) + q01, a)
  - dual image normalize:  VLAAttacker/white_patch/appply_random_transform.py:16-24
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .constants import DINO_MEAN, DINO_STD, SIGLIP_MEAN, SIGLIP_STD


def normalize_actions_q99(
    actions: jnp.ndarray,
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Dataset-statistics normalization used by the RLDS pipeline."""
    if mask is None:
        mask = jnp.ones_like(q01, dtype=bool)
    normed = jnp.clip(2.0 * (actions - q01) / (q99 - q01 + 1e-8) - 1.0, -1.0, 1.0)
    return jnp.where(mask, normed, actions)


def unnormalize_actions_q99(
    actions: jnp.ndarray,
    q01: jnp.ndarray,
    q99: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Inverse map used by `predict_action` before driving the robot."""
    if mask is None:
        mask = jnp.ones_like(q01, dtype=bool)
    return jnp.where(mask, 0.5 * (actions + 1.0) * (q99 - q01) + q01, actions)


# --- Image normalization ------------------------------------------------------
# NHWC layout (TPU-native). Channels-last lets XLA fuse the normalize into the
# patch-embed matmul input without a transpose.
_DINO_MEAN = np.asarray(DINO_MEAN, dtype=np.float32)
_DINO_STD = np.asarray(DINO_STD, dtype=np.float32)
_SIGLIP_MEAN = np.asarray(SIGLIP_MEAN, dtype=np.float32)
_SIGLIP_STD = np.asarray(SIGLIP_STD, dtype=np.float32)


def normalize_image(images: jnp.ndarray, mean: np.ndarray, std: np.ndarray) -> jnp.ndarray:
    """images: [..., H, W, 3] in [0, 1]."""
    mean = jnp.asarray(mean, dtype=images.dtype)
    std = jnp.asarray(std, dtype=images.dtype)
    return (images - mean) / std


def denormalize_image(images: jnp.ndarray, mean: np.ndarray, std: np.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(mean, dtype=images.dtype)
    std = jnp.asarray(std, dtype=images.dtype)
    return images * std + mean


def dual_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] in [0,1] -> [..., 2, H, W, 3]: (DINO-normed, SigLIP-normed).

    TPU-native equivalent of the reference's 6-channel NCHW stack
    (appply_random_transform.py:132-135). Axis -4 indexes the backbone.
    """
    dino = normalize_image(images, _DINO_MEAN, _DINO_STD)
    sig = normalize_image(images, _SIGLIP_MEAN, _SIGLIP_STD)
    return jnp.stack([dino, sig], axis=-4)


def dual_normalize_from_nchw6(pixel_values: jnp.ndarray) -> jnp.ndarray:
    """Compatibility shim: accept the reference's [B, 6, H, W] layout and return
    our [B, 2, H, W, 3] stack (values are already normalized in that format)."""
    b, c, h, w = pixel_values.shape
    assert c == 6, f"expected 6-channel stacked pixel_values, got {c}"
    nchw = pixel_values.reshape(b, 2, 3, h, w)
    return jnp.transpose(nchw, (0, 1, 3, 4, 2))
