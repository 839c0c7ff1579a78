"""Differentiable adversarial-patch compositing, TPU-native.

Replaces the reference's per-image Python loop
(/root/reference/VLAAttacker/white_patch/appply_random_transform.py:104-197)
with batched, shape-static ops that live *inside* the jitted attack step:

  paste (dynamic_update_slice at traced x,y)
    -> optional affine warp (gather bilinear, border padding)
    -> `where(canvas < -20)` composite
    -> dual normalization (at the attack layer)

Patch layout here is [ph, pw, 3] (HWC) in [0, 1]; images are [B, H, W, 3].
Randomness comes from threaded `jax.random` keys instead of Python `random`.

The optional patch rescale (``--resize_patch``; 0.61-1.39 uniform scale,
appply_random_transform.py:113-116) is implemented as an implicit-coordinate
bilinear gather so the scale can be a traced scalar under static shapes. (The
reference's version crashes on an undefined variable — SURVEY.md §7 classifies
it as a defect to fix, not copy.)

There is deliberately NO ``colorjitter`` knob here: the reference's is a latent
crash — `TMA.py:141` forwards ``colorjitter=`` to `apply_random_patch_batch`,
whose signature (appply_random_transform.py:104) doesn't accept it, so enabling
it raises TypeError; no reference script ever sets it True (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.constants import CANVAS_FILL, COMPOSITE_THRESHOLD
from .grid_sample import affine_warp, fixed_affine_matrix, random_affine_matrix


def paste_patch(
    patch: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, height: int, width: int,
    fill: float = CANVAS_FILL,
) -> jnp.ndarray:
    """Place `patch` [ph, pw, C] at traced integer (x, y) on a fill canvas."""
    canvas = jnp.full((height, width, patch.shape[-1]), fill, dtype=patch.dtype)
    return jax.lax.dynamic_update_slice(canvas, patch, (y, x, jnp.int32(0)))


def paste_patch_scaled(
    patch: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, scale: jnp.ndarray,
    height: int, width: int, fill: float = CANVAS_FILL,
) -> jnp.ndarray:
    """Paste a bilinearly rescaled patch (traced `scale`) at (x, y).

    For output pixel (i, j): patch coords u=(j-x)/scale, v=(i-y)/scale; sample
    the patch where 0 <= u < pw and 0 <= v < ph, else `fill`. Static shapes,
    differentiable w.r.t. the patch.
    """
    ph, pw, c = patch.shape
    jj = jnp.arange(width, dtype=jnp.float32)[None, :]
    ii = jnp.arange(height, dtype=jnp.float32)[:, None]
    u = (jj - x.astype(jnp.float32)) / scale
    v = (ii - y.astype(jnp.float32)) / scale
    inside = (u >= 0) & (u <= pw - 1) & (v >= 0) & (v <= ph - 1)
    u = jnp.clip(u, 0.0, pw - 1.0)
    v = jnp.clip(v, 0.0, ph - 1.0)
    u0, v0 = jnp.floor(u), jnp.floor(v)
    wu, wv = (u - u0).astype(patch.dtype), (v - v0).astype(patch.dtype)

    def gather(vi, ui):
        return patch[
            jnp.clip(vi, 0, ph - 1).astype(jnp.int32),
            jnp.clip(ui, 0, pw - 1).astype(jnp.int32),
        ]

    p00, p01 = gather(v0, u0), gather(v0, u0 + 1)
    p10, p11 = gather(v0 + 1, u0), gather(v0 + 1, u0 + 1)
    top = p00 * (1 - wu)[..., None] + p01 * wu[..., None]
    bot = p10 * (1 - wu)[..., None] + p11 * wu[..., None]
    vals = top * (1 - wv)[..., None] + bot * wv[..., None]
    return jnp.where(inside[..., None], vals, jnp.asarray(fill, patch.dtype))


def composite(canvas: jnp.ndarray, image: jnp.ndarray,
              threshold: float = COMPOSITE_THRESHOLD) -> jnp.ndarray:
    """`where(canvas < threshold, image, canvas)` — the geometry-path blend
    (appply_random_transform.py:131). Interpolated canvas borders above the
    threshold count as patch, matching the reference."""
    return jnp.where(canvas < threshold, image, canvas)


def composite_exact(canvas: jnp.ndarray, image: jnp.ndarray,
                    fill: float = CANVAS_FILL) -> jnp.ndarray:
    """`where(canvas != fill, canvas, image)` — the no-affine paste blend
    (appply_random_transform.py:153,179)."""
    return jnp.where(canvas != fill, canvas, image)


def random_placement(
    rng: jax.Array, height: int, width: int, ph: int, pw: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x ~ U{0..W-pw}, y ~ U{0..H-ph} (appply_random_transform.py:120-124)."""
    kx, ky = jax.random.split(rng)
    x = jax.random.randint(kx, (), 0, width - pw + 1)
    y = jax.random.randint(ky, (), 0, height - ph + 1)
    return x, y


def apply_patch_single(
    image: jnp.ndarray,
    patch: jnp.ndarray,
    rng: jax.Array,
    geometry: bool,
    resize_patch: bool = False,
    scale_range: Tuple[float, float] = (0.61, 1.39),
) -> jnp.ndarray:
    """Randomly place (and optionally warp/rescale) the patch on one image.

    Mirrors apply_random_patch_batch / paste_patch_fix semantics per image.
    `geometry` and `resize_patch` are static Python bools (compiled variants).
    """
    H, W, _ = image.shape
    ph, pw, _ = patch.shape
    k_place, k_scale, k_aff = jax.random.split(rng, 3)

    if resize_patch:
        scale = jax.random.uniform(
            k_scale, (), minval=scale_range[0], maxval=scale_range[1]
        )
        # keep the scaled patch fully inside the frame for the worst case
        max_side = int(np.ceil(max(ph, pw) * scale_range[1]))
        kx, ky = jax.random.split(k_place)
        x = jax.random.randint(kx, (), 0, max(W - max_side, 1))
        y = jax.random.randint(ky, (), 0, max(H - max_side, 1))
        canvas = paste_patch_scaled(patch, x, y, scale, H, W)
    else:
        x, y = random_placement(k_place, H, W, ph, pw)
        canvas = paste_patch(patch, x, y, H, W)

    if geometry:
        matrix = random_affine_matrix(k_aff)
        canvas = affine_warp(canvas, matrix, padding_mode="border")
        return composite(canvas, image)
    return composite_exact(canvas, image)


def apply_patch_batch(
    images: jnp.ndarray,
    patch: jnp.ndarray,
    rng: jax.Array,
    geometry: bool = True,
    resize_patch: bool = False,
) -> jnp.ndarray:
    """Batched random patch application: one independent placement/warp per
    image (vmapped over the batch). images: [B, H, W, 3] in [0, 1]."""
    keys = jax.random.split(rng, images.shape[0])
    return jax.vmap(
        lambda im, k: apply_patch_single(im, patch, k, geometry, resize_patch)
    )(images, keys)


# --- Inference-time (uint8) paste for closed-loop eval ------------------------

def quantize_patch_u8(patch: np.ndarray) -> np.ndarray:
    """float [3-last?, h, w] or [h, w, 3] in [0,1] -> uint8 via truncation,
    matching torchvision's ToPILImage round-trip (`mul(255).byte()`), which the
    reference applies before eval pastes (appply_random_transform.py:60)."""
    patch = np.asarray(patch)
    return (np.clip(patch, 0.0, 1.0) * 255.0).astype(np.uint8)


def simulation_paste_patch(
    image_u8: np.ndarray,
    patch: np.ndarray,
    position: Tuple[int, int],
    geometry: bool = False,
    angle: float = 0.0,
    shx: float = 0.0,
    shy: float = 0.0,
) -> np.ndarray:
    """Fixed-position uint8 paste used in LIBERO rollouts
    (simulation_random_patch, appply_random_transform.py:43-78).

    image_u8: [H, W, 3] uint8 frame. patch: [ph, pw, 3] float in [0,1] (HWC).
    Composite threshold is 0 on this path (canvas fill -100, uint8 patch >= 0).
    """
    H, W, _ = image_u8.shape
    patch_u8 = quantize_patch_u8(patch).astype(np.float32)
    x, y = int(position[0]), int(position[1])
    canvas = np.full((H, W, 3), -100.0, dtype=np.float32)
    ph, pw, _ = patch_u8.shape
    canvas[y : y + ph, x : x + pw] = patch_u8
    if geometry:
        m = fixed_affine_matrix(angle, shx, shy)
        canvas = np.asarray(
            affine_warp(jnp.asarray(canvas), jnp.asarray(m), padding_mode="border")
        )
    out = np.where(canvas < 0, image_u8.astype(np.float32), canvas)
    return out.astype(np.uint8)
