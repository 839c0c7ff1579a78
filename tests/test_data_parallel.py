"""DDP-equivalence on the virtual 8-device CPU mesh: the SAME jitted attack
step, fed a batch sharded over the 'data' axis with replicated patch/params,
must produce the same patch update as the single-device full-batch run — the
property torch DDP's gradient allreduce provides by construction
(UADA_ddp.py:144-166), here guaranteed by XLA's partitioner."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.attacks import AttackSpec, init_attack_state, make_attack_step
from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.parallel import make_mesh, replicate, shard_batch
from roboticattack_tpu.utils import WordStubTokenizer, build_tma_target_tokens


def test_sharded_step_matches_single_device():
    assert len(jax.devices()) == 8, jax.devices()
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=1)
    batch = next(batch_iterator(frames, batch_size=8, pad_to=48))

    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    spec = AttackSpec(objective="tma", geometry=True, inner_loop=2)

    def run(shard: bool):
        step = make_attack_step(spec, VLA_TINY, target, maskidx)
        state = init_attack_state(jax.random.key(2), (10, 10))
        local_params, local_batch, local_state = params, batch, state
        if shard:
            mesh = make_mesh(data=8)
            local_params = replicate(params, mesh)
            local_state = replicate(state, mesh)
            local_batch = shard_batch(batch, mesh)
        for i in range(2):
            local_state, metrics = step(
                local_params, local_state, local_batch,
                jnp.float32(1e-2), jnp.bool_(True), jax.random.key(10 + i),
            )
        return np.asarray(local_state.patch), np.asarray(metrics["loss"])

    patch_single, loss_single = run(shard=False)
    patch_shard, loss_shard = run(shard=True)

    np.testing.assert_allclose(loss_shard, loss_single, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(patch_shard, patch_single, rtol=1e-5, atol=1e-6)


def test_dp_step_hlo_gradient_traffic_is_one_patch_allreduce():
    """Pin the GSPMD data-parallel step's collective footprint in compiled
    HLO: the ONLY tensor-sized cross-device traffic is one all-reduce of the
    patch gradient (the reference DDP's bucket allreduce is likewise the only
    gradient traffic, UADA_ddp.py:166); every other all-reduce operand is a
    scalar metric/count, and there are no gathers at all. A subtly wrong
    reduction (e.g. a gathered batch or per-device re-broadcast) would show
    up here even if its numbers drifted within test_exact_ddp_cli's 5% band."""
    import re

    params = init_vla_params(jax.random.key(0), VLA_TINY)
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=1)
    batch = next(batch_iterator(frames, batch_size=8, pad_to=48))
    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    step = make_attack_step(
        AttackSpec(objective="tma", geometry=True, inner_loop=1), VLA_TINY, target, maskidx
    )
    state = init_attack_state(jax.random.key(2), (10, 10))
    mesh = make_mesh(data=8)
    p, s, b = replicate(params, mesh), replicate(state, mesh), shard_batch(batch, mesh)

    hlo = (
        jax.jit(step)
        .lower(p, s, b, jnp.float32(1e-2), jnp.bool_(True), jax.random.key(10))
        .compile()
        .as_text()
    )
    for banned in ("all-gather", "reduce-scatter", "collective-permute", "all-to-all"):
        assert banned not in hlo, f"unexpected {banned} in DP step HLO"

    patch_dims = ",".join(str(d) for d in np.asarray(state.patch).shape)
    tensor_shapes = []
    for line in hlo.splitlines():
        if " all-reduce(" not in line:
            continue  # operand refs / get-tuple-elements, not op definitions
        result_shapes = line.split(" all-reduce(")[0]
        tensor_shapes += [
            dims
            for dims in re.findall(r"(?:f|s|u|bf|pred)\d*\[([\d,]*)\]", result_shapes)
            if dims  # scalars reduce to '' — metric sums/counts are fine
        ]
    assert tensor_shapes == [patch_dims], (
        f"DP gradient traffic must be exactly one patch-shaped all-reduce "
        f"[{patch_dims}]; found tensor-sized reduces: {tensor_shapes}"
    )


def test_uada_sharded_metrics_match():
    params = init_vla_params(jax.random.key(3), VLA_TINY)
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=2)
    batch = next(batch_iterator(frames, batch_size=8, pad_to=48))
    spec = AttackSpec(objective="uada", geometry=True, inner_loop=1, add_inverse_ce=False)

    def run(shard: bool):
        step = make_attack_step(spec, VLA_TINY, None, [0, 1, 2, 3, 4, 5, 6])
        state = init_attack_state(jax.random.key(4), (10, 10))
        p, b, s = params, batch, state
        if shard:
            mesh = make_mesh(data=8)
            p, s, b = replicate(params, mesh), replicate(state, mesh), shard_batch(batch, mesh)
        s, m = step(p, s, b, jnp.float32(1e-2), jnp.bool_(True), jax.random.key(5))
        return {k: np.asarray(v) for k, v in m.items()}, np.asarray(s.patch)

    m1, p1 = run(False)
    m2, p2 = run(True)
    for key in ("loss", "mse_distance", "uad", "ce"):
        np.testing.assert_allclose(m2[key], m1[key], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(p2, p1, rtol=1e-5, atol=1e-6)


def test_tensor_parallel_step_matches_single_device():
    """dp x tp sharded attack step (Megatron-style Llama splits via
    parallel/sharding.py) must match the unsharded step numerically."""
    from roboticattack_tpu.parallel.sharding import shard_params

    params = init_vla_params(jax.random.key(7), VLA_TINY)
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=9)
    batch = next(batch_iterator(frames, batch_size=8, pad_to=48))
    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    spec = AttackSpec(objective="tma", geometry=True, inner_loop=1)

    def run(tp: bool):
        step = make_attack_step(spec, VLA_TINY, target, maskidx)
        state = init_attack_state(jax.random.key(8), (10, 10))
        p, s, b = params, state, batch
        if tp:
            mesh = make_mesh(data=4, model=2)
            p = shard_params(params, mesh, shard_projector=True)
            s = replicate(state, mesh)
            b = shard_batch(batch, mesh)
        s, m = step(p, s, b, jnp.float32(1e-2), jnp.bool_(True), jax.random.key(9))
        return np.asarray(s.patch), float(np.asarray(m["loss"])[-1])

    patch_ref, loss_ref = run(tp=False)
    patch_tp, loss_tp = run(tp=True)
    assert abs(loss_tp - loss_ref) < 1e-4, (loss_ref, loss_tp)
    np.testing.assert_allclose(patch_tp, patch_ref, rtol=2e-4, atol=2e-5)
