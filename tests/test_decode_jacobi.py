"""Jacobi self-speculative decode: bit-parity vs the sequential tail, pass
counts, and composition with kv8 / TP / quantized weights.

The decode tail is num_steps-1 weight-streaming-bound sequential steps; with
`draft_tokens` the tail runs as fixed-point verification passes instead
(models/decode.py) — one s=7 pass costs ~one s=1 step, so a fully-correct
draft (the robot-control common case: consecutive actions repeat tokens)
collapses 6 weight streams into 1. The reference's `generate` is strictly
sequential (modeling_prismatic.py:506-534) — no counterpart.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.models.decode import decode_layout_params, greedy_decode_actions

from test_decode import _prompt


@pytest.fixture(scope="module")
def cooked():
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    return jax.tree.map(jnp.asarray, decode_layout_params(params))


@pytest.fixture(scope="module")
def prompt():
    ids, mask, px = _prompt(batch=3, seed=7)
    return jnp.asarray(ids), jnp.asarray(mask), px


def _seq(cooked, prompt, **kw):
    ids, mask, px = prompt
    return greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                 cooked_weights=True, **kw)


def test_jacobi_matches_sequential(cooked, prompt):
    """Any draft -> the same tokens/actions as the sequential tail."""
    ref = _seq(cooked, prompt)
    b, n = ref.tokens.shape

    for name, draft in [
        ("zeros", jnp.zeros((b, n), jnp.int32)),
        ("perfect", ref.tokens),
        # half-right: the realistic control-loop draft (previous action,
        # scene moved a little)
        ("half", ref.tokens.at[:, n // 2 :].set(0)),
        ("garbage", jnp.full((b, n), 31999, jnp.int32)),
    ]:
        got = _seq(cooked, prompt, draft_tokens=draft)
        np.testing.assert_array_equal(
            np.asarray(ref.tokens), np.asarray(got.tokens), err_msg=name
        )
        np.testing.assert_array_equal(
            np.asarray(ref.actions), np.asarray(got.actions), err_msg=name
        )
        passes = int(got.verify_passes)
        assert 1 <= passes <= n - 1, (name, passes)


def test_jacobi_pass_counts(cooked, prompt):
    """A fully-correct draft verifies in ONE pass; a wrong-at-position-k draft
    needs more passes than a correct one (monotonic work in draft quality)."""
    ref = _seq(cooked, prompt)
    perfect = _seq(cooked, prompt, draft_tokens=ref.tokens)
    assert int(perfect.verify_passes) == 1

    # break position 1: the first verification pass fixes it, but the
    # downstream positions were computed against the wrong context and need
    # at least one more pass to re-verify
    broken = ref.tokens.at[:, 1].set((ref.tokens[:, 1] + 1) % 256)
    fixed = _seq(cooked, prompt, draft_tokens=broken)
    assert int(fixed.verify_passes) >= 2
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(fixed.tokens))


def test_jacobi_kv8_matches_sequential(cooked, prompt):
    """kv_cache='int8' composes: jacobi and sequential quantize the same K/V
    rows (deterministic in the token values), so the fixed point matches."""
    ref = _seq(cooked, prompt, kv_cache="int8")
    for draft in (jnp.zeros_like(ref.tokens), ref.tokens):
        got = _seq(cooked, prompt, kv_cache="int8", draft_tokens=draft)
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_jacobi_quantized_weights(prompt):
    """int8 weight-only params take the same jacobi tail (the _pj dispatch is
    per-projection and shape-agnostic)."""
    from roboticattack_tpu.models.quant import quantize_decode_params

    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    q8 = jax.tree.map(jnp.asarray,
                      quantize_decode_params(decode_layout_params(params)))
    ref = _seq(q8, prompt)
    got = _seq(q8, prompt, draft_tokens=ref.tokens)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    assert int(got.verify_passes) == 1


def test_jacobi_tp_matches_single_device(cooked, prompt):
    """dp=2 x tp=2 jacobi decode == single-device jacobi == sequential; the
    verification pass's [B,7,D] psums replace the step's [B,1,D] ones but the
    sharding structure (Megatron splits, head-sharded cache) is unchanged."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params

    ids, mask, px = _prompt(batch=2, seed=3)
    ids, mask = jnp.asarray(ids), jnp.asarray(mask)
    ref = greedy_decode_actions(
        cooked, VLA_TINY, ids, mask, px, cooked_weights=True
    )

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_tp = shard_decode_params(cooked, mesh)
    bsh = NamedSharding(mesh, P("data"))
    placed = [jax.device_put(x, bsh) for x in (ids, mask, px)]
    for draft in (jnp.zeros_like(ref.tokens), ref.tokens):
        got = jax.jit(
            lambda p, i, m, x, d: greedy_decode_actions(
                p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh,
                draft_tokens=d,
            )
        )(p_tp, *placed, jax.device_put(draft, bsh))
        np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_jacobi_rejects_bad_draft_shape(cooked, prompt):
    ids, mask, px = prompt
    with pytest.raises(ValueError, match="draft_tokens"):
        greedy_decode_actions(
            cooked, VLA_TINY, ids, mask, px, cooked_weights=True,
            draft_tokens=jnp.zeros((ids.shape[0], 3), jnp.int32),
        )
