import numpy as np
import jax.numpy as jnp

from roboticattack_tpu.utils import (
    denormalize_image,
    dual_normalize,
    dual_normalize_from_nchw6,
    normalize_actions_q99,
    normalize_image,
    unnormalize_actions_q99,
)
from roboticattack_tpu.utils.constants import DINO_MEAN, DINO_STD


def test_q99_roundtrip():
    rng = np.random.default_rng(0)
    q01 = rng.uniform(-2, 0, size=7)
    q99 = q01 + rng.uniform(0.5, 2, size=7)
    mask = np.array([True] * 6 + [False])
    actions = q01 + (q99 - q01) * rng.uniform(0.05, 0.95, size=(32, 7))
    normed = normalize_actions_q99(jnp.asarray(actions), jnp.asarray(q01), jnp.asarray(q99), jnp.asarray(mask))
    # masked-out dim passes through
    np.testing.assert_allclose(np.asarray(normed)[:, 6], actions[:, 6])
    back = unnormalize_actions_q99(normed, jnp.asarray(q01), jnp.asarray(q99), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(back), actions, rtol=2e-5, atol=2e-6)


def test_q99_formula_matches_reference():
    actions = np.array([[0.3, -0.1, 0.0, 0.5, -0.5, 0.9, 1.0]])
    q01 = np.zeros(7) - 1.0
    q99 = np.zeros(7) + 1.0
    expected = np.clip(2 * (actions - q01) / (q99 - q01 + 1e-8) - 1, -1, 1)
    got = np.asarray(normalize_actions_q99(jnp.asarray(actions), jnp.asarray(q01), jnp.asarray(q99)))
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-7)


def test_image_normalize_roundtrip_and_dual_stack():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    normed = normalize_image(jnp.asarray(img), np.asarray(DINO_MEAN), np.asarray(DINO_STD))
    back = denormalize_image(normed, np.asarray(DINO_MEAN), np.asarray(DINO_STD))
    np.testing.assert_allclose(np.asarray(back), img, rtol=1e-5, atol=1e-6)

    stacked = dual_normalize(jnp.asarray(img))
    assert stacked.shape == (2, 2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(stacked)[:, 0], np.asarray(normed), rtol=1e-6)
    # siglip half: (x - .5) / .5
    np.testing.assert_allclose(np.asarray(stacked)[:, 1], (img - 0.5) / 0.5, rtol=1e-5)


def test_nchw6_compat_shim():
    rng = np.random.default_rng(2)
    ours = rng.standard_normal((3, 2, 4, 4, 3)).astype(np.float32)
    # reference layout: channel-concat [B, 6, H, W]
    nchw6 = np.concatenate(
        [ours[:, 0].transpose(0, 3, 1, 2), ours[:, 1].transpose(0, 3, 1, 2)], axis=1
    )
    got = np.asarray(dual_normalize_from_nchw6(jnp.asarray(nchw6)))
    np.testing.assert_allclose(got, ours, rtol=1e-6)
