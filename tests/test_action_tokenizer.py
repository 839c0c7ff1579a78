"""Golden tests for the action token codec (SURVEY.md §4(a))."""

import numpy as np
import jax.numpy as jnp

from roboticattack_tpu.utils import (
    BIN_CENTERS,
    decode_tokens,
    decode_tokens_np,
    encode_actions,
    encode_actions_np,
)
from roboticattack_tpu.utils.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    ACTION_TOKEN_MAX,
    ACTION_TOKEN_MIN,
    ACTION_TOKEN_ZERO,
    VOCAB_SIZE,
)


def test_golden_constants():
    assert ACTION_TOKEN_BEGIN_IDX == 31743
    assert int(encode_actions_np(np.array([1.0]))[0]) == ACTION_TOKEN_MIN == 31744
    assert int(encode_actions_np(np.array([0.0]))[0]) == ACTION_TOKEN_ZERO == 31872
    assert int(encode_actions_np(np.array([-1.0]))[0]) == ACTION_TOKEN_MAX == 31999


def test_encode_matches_reference_digitize():
    rng = np.random.default_rng(0)
    actions = rng.uniform(-1.5, 1.5, size=(512,))
    bins = np.linspace(-1, 1, 256)
    expected = VOCAB_SIZE - np.digitize(np.clip(actions, -1.0, 1.0), bins)
    np.testing.assert_array_equal(encode_actions_np(actions), expected)
    np.testing.assert_array_equal(
        np.asarray(encode_actions(jnp.asarray(actions, dtype=jnp.float64))), expected
    )


def test_decode_matches_reference_formula():
    ids = np.arange(ACTION_TOKEN_MIN, ACTION_TOKEN_MAX + 1)
    disc = np.clip(VOCAB_SIZE - ids - 1, 0, BIN_CENTERS.shape[0] - 1)
    expected = BIN_CENTERS[disc]
    np.testing.assert_allclose(decode_tokens_np(ids), expected)
    np.testing.assert_allclose(np.asarray(decode_tokens(jnp.asarray(ids))), expected, rtol=1e-6)


def test_roundtrip_hits_nearest_bin_center():
    rng = np.random.default_rng(1)
    actions = rng.uniform(-1, 1, size=(1000,))
    decoded = decode_tokens_np(encode_actions_np(actions))
    # error bounded by bin half-width (2/255/2), except the shared last interval
    assert np.max(np.abs(decoded - actions)) <= (2 / 255) * 1.01


def test_out_of_range_clipping():
    np.testing.assert_array_equal(
        encode_actions_np(np.array([5.0, -5.0])), np.array([31744, 31999])
    )
    # decoding a non-action token clips into the centers table without error
    assert decode_tokens_np(np.array([0])).shape == (1,)
