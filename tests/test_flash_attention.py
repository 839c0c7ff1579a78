"""Pallas head-resident attention vs the XLA reference (interpret mode on CPU):
forward values and all three gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.ops.attention import causal_bias, mha, padding_bias
from roboticattack_tpu.ops.flash_attention import mha_flash


def _inputs(b=2, h=4, s=64, d=32, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), dtype)
    mask = np.ones((b, s), np.int32)
    mask[b - 1, s - 7 :] = 0
    bias = causal_bias(s, s) + padding_bias(jnp.asarray(mask))  # [B,1,S,S]
    return q, k, v, bias, jnp.asarray(mask)


def test_forward_matches_mha():
    q, k, v, bias, mask = _inputs()
    want = np.asarray(mha(q, k, v, bias=bias))
    got = np.asarray(mha_flash(q, k, v, bias=bias, interpret=True))
    # compare only valid query positions (padded queries differ by NEG_INF handling)
    for b in range(q.shape[0]):
        valid = np.asarray(mask[b]).astype(bool)
        np.testing.assert_allclose(got[b][:, valid], want[b][:, valid], rtol=2e-5, atol=2e-5)


def test_gradients_match_mha():
    q, k, v, bias, mask = _inputs(b=1, h=2, s=48, d=16, seed=1)
    mask_q = np.asarray(mask[0]).astype(bool)

    def loss_ref(q, k, v):
        out = mha(q, k, v, bias=bias)
        return jnp.sum(out[:, :, jnp.asarray(mask_q)] ** 2)

    def loss_flash(q, k, v):
        out = mha_flash(q, k, v, bias=bias, interpret=True)
        return jnp.sum(out[:, :, jnp.asarray(mask_q)] ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_fl):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), rtol=3e-5, atol=3e-5)


def test_bf16_forward_close():
    q, k, v, bias, mask = _inputs(b=1, h=2, s=32, d=32, seed=2, dtype=jnp.bfloat16)
    want = np.asarray(mha(q, k, v, bias=bias), np.float32)
    got = np.asarray(mha_flash(q, k, v, bias=bias, interpret=True), np.float32)
    valid = np.asarray(mask[0]).astype(bool)
    np.testing.assert_allclose(got[0][:, valid], want[0][:, valid], rtol=2e-2, atol=2e-2)
