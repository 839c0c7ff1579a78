"""Affine warp via gather-based bilinear sampling (XLA-native `grid_sample`).

Numerically matches ``torch.nn.functional.affine_grid(align_corners=False)`` +
``grid_sample(align_corners=False, padding_mode='border'|'zeros')`` which the
reference uses for patch augmentation
(/root/reference/VLAAttacker/white_patch/appply_random_transform.py:93-102).

Everything is shape-static and differentiable w.r.t. the image, so the warp
sits inside the compiled attack step and gradients flow through to the patch
pixels. XLA lowers the gathers onto the VPU and fuses the surrounding
elementwise math; no Pallas needed for this op at 224x224 scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def affine_warp(
    image: jnp.ndarray,
    matrix: jnp.ndarray,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Warp a single image [H, W, C] by the 2x3 (or 3x3) matrix `matrix`.

    The matrix maps *output* normalized coordinates to *input* normalized
    coordinates, exactly like the theta of ``F.affine_grid``.
    """
    H, W, _ = image.shape
    m = matrix[:2, :]

    # Output-pixel normalized coordinates, align_corners=False convention.
    xs = (2.0 * jnp.arange(W, dtype=jnp.float32) + 1.0) / W - 1.0
    ys = (2.0 * jnp.arange(H, dtype=jnp.float32) + 1.0) / H - 1.0
    gx = m[0, 0] * xs[None, :] + m[0, 1] * ys[:, None] + m[0, 2]
    gy = m[1, 0] * xs[None, :] + m[1, 1] * ys[:, None] + m[1, 2]

    # Unnormalize into input pixel space.
    ix = ((gx + 1.0) * W - 1.0) / 2.0
    iy = ((gy + 1.0) * H - 1.0) / 2.0

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode={padding_mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = (ix - x0).astype(image.dtype)
    wy = (iy - y0).astype(image.dtype)

    def gather(yi, xi):
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = image[yc, xc]  # [H, W, C]
        if padding_mode == "zeros":
            inside = ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1))
            vals = jnp.where(inside[..., None], vals, 0.0)
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)

    top = v00 * (1.0 - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (1.0 - wx)[..., None] + v11 * wx[..., None]
    return top * (1.0 - wy)[..., None] + bot * wy[..., None]


def rotation_matrix(theta_deg: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation about the image center in normalized coordinates
    (appply_random_transform.py:26-34)."""
    theta = jnp.deg2rad(theta_deg)
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array(
        [[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def shear_matrix(shx: jnp.ndarray, shy: jnp.ndarray) -> jnp.ndarray:
    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    return jnp.array(
        [[one, shx, zero], [shy, one, zero], [zero, zero, one]], dtype=jnp.float32
    )


def random_affine_matrix(
    rng: jax.Array,
    max_angle: float = 30.0,
    max_shear: float = 0.2,
    identity_prob: float = 0.2,
) -> jnp.ndarray:
    """The reference's augmentation matrix: with prob 0.2 identity, else
    shear(shx, shy) @ rotate(angle) with angle ~ U(-30, 30), sh ~ U(-0.2, 0.2)
    (appply_random_transform.py:80-91). Traced, branchless via select."""
    k_id, k_ang, k_shx, k_shy = jax.random.split(rng, 4)
    angle = jax.random.uniform(k_ang, (), minval=-max_angle, maxval=max_angle)
    shx = jax.random.uniform(k_shx, (), minval=-max_shear, maxval=max_shear)
    shy = jax.random.uniform(k_shy, (), minval=-max_shear, maxval=max_shear)
    m = shear_matrix(shx, shy) @ rotation_matrix(angle)
    identity = jnp.eye(3, dtype=jnp.float32)
    take_identity = jax.random.uniform(k_id, ()) < identity_prob
    return jnp.where(take_identity, identity, m)


def fixed_affine_matrix(angle_deg: float, shx: float, shy: float) -> np.ndarray:
    """Host-side matrix for evaluation-time fixed-geometry pastes
    (simulation_random_patch, appply_random_transform.py:68-75)."""
    theta = np.deg2rad(angle_deg)
    c, s = np.cos(theta), np.sin(theta)
    r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    sh = np.array([[1, shx, 0], [shy, 1, 0], [0, 0, 1]], dtype=np.float32)
    return sh @ r
