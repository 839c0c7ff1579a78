"""Tensor-parallel serving decode: bit-parity vs single-device, and compiled
7B-shape evidence that bs=8 batched `predict_action` fits two v5e chips at
tp=2 (one 15.75 GB chip caps at bs<=4 — BASELINE.md; the reference scales
this path only by big-GPU HBM, modeling_prismatic.py:506-534)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.models.decode import decode_layout_params, greedy_decode_actions
from roboticattack_tpu.parallel import make_mesh
from roboticattack_tpu.parallel.sharding import decode_param_specs, shard_decode_params

from test_decode import _prompt

def test_tp_decode_matches_single_device():
    """dp=2 x tp=2 decode must emit bit-identical tokens (and thus actions —
    they're table lookups from tokens) vs the unsharded cooked decode."""
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    cooked = jax.tree.map(jnp.asarray, decode_layout_params(params))
    ids_np, mask_np, px = _prompt(batch=2, seed=1)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px, cooked_weights=True)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_tp = shard_decode_params(cooked, mesh)
    bsh = NamedSharding(mesh, P("data"))
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh
        )
    )(p_tp, *(jax.device_put(x, bsh) for x in (ids, mask, px)))

    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.actions), np.asarray(got.actions))


def test_tp_decode_rejects_indivisible_heads():
    """vla-tiny has 4 kv heads; tp=8 must fail loudly, not silently replicate."""
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    cooked = jax.tree.map(jnp.asarray, decode_layout_params(params))
    ids_np, mask_np, px = _prompt(batch=2, seed=1)
    mesh = make_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="divisible"):
        greedy_decode_actions(
            shard_decode_params(cooked, mesh), VLA_TINY,
            jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, mesh=mesh,
        )


def test_vla_policy_tp_matches_single_device():
    """VLAPolicy(mesh=...) end-to-end (load -> cook -> shard -> batched
    decode) returns the same actions as the single-device policy."""
    from roboticattack_tpu.eval.policy import load_policy

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    task = "pick up the block"

    single = load_policy(None, model_name="vla-tiny")
    a_single = single.get_action_batch(frames, task)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tp = load_policy(None, model_name="vla-tiny", mesh=mesh)
    a_tp = tp.get_action_batch(frames, task)

    np.testing.assert_array_equal(a_single, a_tp)


# The compiled 7B-shape bs=8 tp=2 evidence (per-chip memory + collective
# inventory) lives in tests/test_multichip_7b_shapes.py via parallel.evidence.


def test_pure_dp_decode_matches_single_device():
    """dp=4 x tp=1 serving (no weight splits — the throughput axis once
    weights fit per chip, exposed as `--dp` on serve/bench_decode): batch
    rows and the KV cache shard over 'data'; tokens must be bit-identical
    to the unsharded decode, and the cache's pinned batch axis keeps any
    chip from holding the full batch."""
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    cooked = jax.tree.map(jnp.asarray, decode_layout_params(params))
    ids_np, mask_np, px = _prompt(batch=4, seed=2)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px,
                                cooked_weights=True)

    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    p_dp = shard_decode_params(cooked, mesh)  # replicated (no model splits)
    bsh = NamedSharding(mesh, P("data"))
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh
        )
    )(p_dp, *(jax.device_put(x, bsh) for x in (ids, mask, px)))
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_vla_policy_pure_dp_matches_single_device():
    """VLAPolicy(mesh=dp-only) — the cli.serve --dp path: batched actions
    equal the single-device policy's."""
    from roboticattack_tpu.eval.policy import load_policy

    frames = np.random.default_rng(5).integers(
        0, 255, (4, 56, 56, 3), dtype=np.uint8)
    ref = load_policy(None, model_name="vla-tiny")
    a_ref = ref.get_action_batch(frames, "stack the cups")

    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    dp = load_policy(None, model_name="vla-tiny", mesh=mesh)
    a_dp = dp.get_action_batch(frames, "stack the cups")
    np.testing.assert_array_equal(a_ref, a_dp)
