"""int8 KV cache for the serving decode (models/decode.py kv_cache='int8').

Correctness strategy mirrors test_decode_quant.py: the dequantization math
is pinned exactly at the unit level (per-position scales commute around both
attention matmuls — scores take sk AFTER q@k8^T, sv folds into the probs
BEFORE @v8), and the program-level invariant that prefill attention runs on
full-precision K/V makes the FIRST generated token bit-identical to the
unquantized program. The 6 cached decode steps see int8-rounded keys — that
fidelity cost is the feature's price, validated on real weights only when
egress exists (same stance as weight quantization).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.models.decode import (
    _attend_kv8,
    _quantize_kv,
    decode_layout_params,
    greedy_decode_actions,
)

from test_decode import _prompt


def _cooked_tiny(seed=0):
    params = jax.device_get(init_vla_params(jax.random.key(seed), VLA_TINY))
    return decode_layout_params(params, xp=np)


def test_quantize_kv_roundtrip_bound():
    """|x - q*s| <= s/2 per (batch, head, position)."""
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 5, 8)),
                    jnp.float32)
    q8, s = _quantize_kv(x)
    assert q8.dtype == jnp.int8 and s.shape == (2, 3, 5)
    err = np.abs(np.asarray(x) - np.asarray(q8, np.float32) * np.asarray(s)[..., None])
    assert np.all(err <= np.asarray(s)[..., None] * 0.5 * (1 + 1e-3))


def test_attend_kv8_matches_f64_reference():
    """The int8-cache attention against f64 numpy math on the SAME quantized
    values: the scale placement (sk after q@k^T, sv into the probs) must be
    an exact dequantization, not an approximation."""
    rng = np.random.default_rng(1)
    b, h, t, hd = 2, 3, 6, 8
    q = rng.standard_normal((b, h, 1, hd)).astype(np.float32)
    k8 = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)
    v8 = rng.integers(-127, 128, (b, h, t, hd)).astype(np.int8)
    sk = np.exp2(rng.integers(-10, -4, (b, h, t))).astype(np.float32)
    sv = np.exp2(rng.integers(-10, -4, (b, h, t))).astype(np.float32)
    bias = np.where(rng.random((b, 1, 1, t)) < 0.8, 0.0, -2.3819763e38).astype(np.float32)

    got = np.asarray(_attend_kv8(
        jnp.asarray(q), jnp.asarray(k8), jnp.asarray(sk),
        jnp.asarray(v8), jnp.asarray(sv), jnp.asarray(bias),
    ), np.float64)

    k = k8.astype(np.float64) * sk[..., None]
    v = v8.astype(np.float64) * sv[..., None]
    scores = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k)
    scores = scores * hd ** -0.5 + bias
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_kv8_first_token_bit_identical():
    """Prefill attends over the live full-precision K/V, so the first
    generated token (argmax of the prefill logits) is bit-identical to the
    unquantized program; later tokens may differ by int8 rounding."""
    cooked = jax.tree.map(jnp.asarray, _cooked_tiny(seed=2))
    ids_np, mask_np, px = _prompt(batch=2, seed=3)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True)
    got = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int8")
    np.testing.assert_array_equal(
        np.asarray(ref.tokens)[:, 0], np.asarray(got.tokens)[:, 0]
    )
    assert got.tokens.shape == ref.tokens.shape
    assert np.all(np.isfinite(np.asarray(got.actions)))


def test_kv8_rejects_unknown_mode():
    cooked = jax.tree.map(jnp.asarray, _cooked_tiny())
    ids_np, mask_np, px = _prompt(batch=1, seed=4)
    with pytest.raises(ValueError, match="kv_cache"):
        greedy_decode_actions(cooked, VLA_TINY, jnp.asarray(ids_np),
                              jnp.asarray(mask_np), px, cooked_weights=True,
                              kv_cache="fp8")


def test_kv8_tp_matches_single_device():
    """kv8 + tp=2: the scale tensors are pinned head-sharded with their cache
    slices; both sides quantize identically, so tokens match exactly."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params

    cooked = jax.tree.map(jnp.asarray, _cooked_tiny(seed=5))
    ids_np, mask_np, px = _prompt(batch=2, seed=6)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int8")
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    p_tp = shard_decode_params(cooked, mesh)
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh,
            kv_cache="int8",
        )
    )(p_tp, ids, mask, px)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_kv8_composes_with_int4_weights_end_to_end():
    """The full serving stack — int4 grouped weights + int8 KV cache —
    serves batched actions through load_policy."""
    from roboticattack_tpu.eval.policy import load_policy

    pol = load_policy(None, model_name="vla-tiny", quantize="int4:16",
                      kv_cache="int8")
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 56, 56, 3), dtype=np.uint8
    )
    acts = pol.get_action_multi(frames, ["pick up the block", "close the drawer"])
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))


# ------------------------------------------------------------- int4 KV cache
def test_quantize_k4_roundtrip_bound():
    """Grouped K quantization: |x - q*s| <= s/2 per (batch, head, position,
    GROUP) — the group split means a small-magnitude group is not hostage to
    an outlier channel elsewhere in the row."""
    from roboticattack_tpu.models.decode import _quantize_k4

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 5, 8)),
                    jnp.float32)
    q4, s = _quantize_k4(x, gs=4)
    assert np.dtype(q4.dtype).name == "int4" and s.shape == (2, 3, 5, 2)
    xg = np.asarray(x).reshape(2, 3, 5, 2, 4)
    deq = np.asarray(q4, np.float32).reshape(2, 3, 5, 2, 4) * np.asarray(s)[..., None]
    assert np.all(np.abs(xg - deq) <= np.asarray(s)[..., None] * 0.5 * (1 + 1e-3))


def test_attend_kv4_matches_f64_reference():
    """int4-cache attention vs f64 numpy on the SAME quantized values: the
    per-group K contraction and the probs-folded V scale must be an exact
    dequantization."""
    from roboticattack_tpu.models.decode import _attend_kv4

    rng = np.random.default_rng(1)
    b, h, t, hd, g = 2, 3, 6, 8, 2
    q = rng.standard_normal((b, h, 1, hd)).astype(np.float32)
    k4 = rng.integers(-7, 8, (b, h, t, hd)).astype(np.float32)
    v4 = rng.integers(-7, 8, (b, h, t, hd)).astype(np.float32)
    sk = np.exp2(rng.integers(-8, -3, (b, h, t, g))).astype(np.float32)
    sv = np.exp2(rng.integers(-8, -3, (b, h, t))).astype(np.float32)
    bias = np.where(rng.random((b, 1, 1, t)) < 0.8, 0.0, -2.3819763e38).astype(np.float32)

    got = np.asarray(_attend_kv4(
        jnp.asarray(q), jnp.asarray(k4).astype(jnp.int4), jnp.asarray(sk),
        jnp.asarray(v4).astype(jnp.int4), jnp.asarray(sv), jnp.asarray(bias),
    ), np.float64)

    k = (k4.reshape(b, h, t, g, hd // g) * sk[..., None]).reshape(b, h, t, hd)
    v = v4 * sv[..., None]
    scores = np.einsum("bhqd,bhkd->bhqk", q.astype(np.float64), k.astype(np.float64))
    scores = scores * hd ** -0.5 + bias
    probs = np.exp(scores - scores.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", probs, v.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_kv4_first_token_bit_identical_and_finite():
    """Same program-level invariant as kv8: prefill attends full-precision,
    so the first token matches the unquantized decode bit-for-bit; the
    s4 cache only touches the 6 cached steps."""
    cooked = jax.tree.map(jnp.asarray, _cooked_tiny(seed=7))
    ids_np, mask_np, px = _prompt(batch=2, seed=8)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True)
    got = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int4")
    np.testing.assert_array_equal(
        np.asarray(ref.tokens)[:, 0], np.asarray(got.tokens)[:, 0]
    )
    assert got.tokens.shape == ref.tokens.shape
    assert np.all(np.isfinite(np.asarray(got.actions)))


def test_kv4_tp_matches_single_device():
    """kv4 + tp=2: the grouped K scales pin head-sharded with an extra group
    axis; both sides quantize identically, so tokens match exactly."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params

    cooked = jax.tree.map(jnp.asarray, _cooked_tiny(seed=9))
    ids_np, mask_np, px = _prompt(batch=2, seed=10)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int4")
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    p_tp = shard_decode_params(cooked, mesh)
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh,
            kv_cache="int4",
        )
    )(p_tp, ids, mask, px)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_kv4_composes_with_jacobi_and_int4_weights():
    """The maximal-compression serving stack — int4 weights + int4 KV +
    Jacobi drafts — decodes finite actions, and a perfect draft still
    verifies in one pass (quantization is deterministic in the tokens, so
    the fixed point is stable)."""
    from roboticattack_tpu.models.quant import quantize_decode_params

    params = jax.device_get(init_vla_params(jax.random.key(11), VLA_TINY))
    qp = jax.tree.map(
        jnp.asarray,
        quantize_decode_params(decode_layout_params(params, xp=np),
                               mode="int4", group_size=16),
    )
    ids_np, mask_np, px = _prompt(batch=2, seed=12)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int4")
    got = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, kv_cache="int4",
                                draft_tokens=ref.tokens)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    assert int(got.verify_passes) == 1
    assert np.all(np.isfinite(np.asarray(got.actions)))
