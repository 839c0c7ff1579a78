"""Parity tests: our affine warp vs torch F.affine_grid/F.grid_sample, and
composite semantics vs the reference formulas (SURVEY.md §4(b))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from roboticattack_tpu.ops import (
    affine_warp,
    apply_patch_batch,
    composite,
    composite_exact,
    paste_patch,
    paste_patch_scaled,
    simulation_paste_patch,
)
from roboticattack_tpu.ops.grid_sample import fixed_affine_matrix


def _torch_warp(image_hwc: np.ndarray, matrix: np.ndarray, padding_mode: str):
    img = torch.from_numpy(image_hwc).permute(2, 0, 1).unsqueeze(0).float()
    theta = torch.from_numpy(matrix[:2, :]).unsqueeze(0).float()
    grid = F.affine_grid(theta, img.size(), align_corners=False)
    out = F.grid_sample(img, grid, align_corners=False, padding_mode=padding_mode)
    return out.squeeze(0).permute(1, 2, 0).numpy()


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_affine_warp_matches_torch(padding_mode):
    rng = np.random.default_rng(0)
    image = rng.standard_normal((31, 37, 3)).astype(np.float32)
    for angle, shx, shy in [(0, 0, 0), (17.0, 0.1, -0.15), (-30.0, 0.2, 0.2), (90.0, 0, 0)]:
        m = fixed_affine_matrix(angle, shx, shy)
        ours = np.asarray(affine_warp(jnp.asarray(image), jnp.asarray(m), padding_mode))
        theirs = _torch_warp(image, m, padding_mode)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_paste_and_composites_match_reference_semantics():
    rng = np.random.default_rng(1)
    image = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    patch = rng.uniform(0, 1, (5, 5, 3)).astype(np.float32)
    canvas = np.asarray(paste_patch(jnp.asarray(patch), jnp.int32(3), jnp.int32(7), 16, 16))
    assert (canvas[7:12, 3:8] == patch).all()
    assert (canvas[0, 0] == -100.0).all()

    out_exact = np.asarray(composite_exact(jnp.asarray(canvas), jnp.asarray(image)))
    expected = np.where(canvas != -100.0, canvas, image)
    np.testing.assert_array_equal(out_exact, expected)

    out_geo = np.asarray(composite(jnp.asarray(canvas), jnp.asarray(image)))
    np.testing.assert_array_equal(out_geo, np.where(canvas < -20.0, image, canvas))


def test_paste_patch_scaled_identity_scale():
    rng = np.random.default_rng(2)
    patch = rng.uniform(0, 1, (6, 6, 3)).astype(np.float32)
    exact = np.asarray(paste_patch(jnp.asarray(patch), jnp.int32(4), jnp.int32(2), 20, 20))
    scaled = np.asarray(
        paste_patch_scaled(jnp.asarray(patch), jnp.int32(4), jnp.int32(2), jnp.float32(1.0), 20, 20)
    )
    np.testing.assert_allclose(scaled, exact, atol=1e-6)


def test_apply_patch_batch_patch_present_and_differentiable():
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32))
    patch = jnp.asarray(rng.uniform(0, 1, (8, 8, 3)).astype(np.float32))

    out = apply_patch_batch(images, patch, jax.random.key(0), geometry=False)
    # exactly 8*8 pixels replaced per image
    changed = (np.asarray(out) != np.asarray(images)).any(-1).sum(axis=(1, 2))
    assert (changed == 64).all()

    def loss(p):
        return apply_patch_batch(images, p, jax.random.key(1), geometry=True).sum()

    g = jax.grad(loss)(patch)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_geometry_identity_branch():
    # with a fixed key, identity matrices occur ~20%: just check both branches compile
    rng = np.random.default_rng(4)
    images = jnp.asarray(rng.uniform(0, 1, (2, 24, 24, 3)).astype(np.float32))
    patch = jnp.asarray(rng.uniform(0, 1, (6, 6, 3)).astype(np.float32))
    out = apply_patch_batch(images, patch, jax.random.key(2), geometry=True)
    assert out.shape == images.shape
    assert np.isfinite(np.asarray(out)).all()


def test_simulation_paste_patch_uint8():
    rng = np.random.default_rng(5)
    frame = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    patch = rng.uniform(0, 1, (10, 10, 3)).astype(np.float32)
    out = simulation_paste_patch(frame, patch, position=(5, 20))
    assert out.dtype == np.uint8
    expected_patch = (patch * 255).astype(np.uint8)
    np.testing.assert_array_equal(out[20:30, 5:15], expected_patch)
    np.testing.assert_array_equal(out[:20, :5], frame[:20, :5])

    out_geo = simulation_paste_patch(frame, patch, position=(5, 20), geometry=True, angle=15.0, shx=0.1, shy=0.0)
    assert out_geo.dtype == np.uint8 and out_geo.shape == frame.shape
