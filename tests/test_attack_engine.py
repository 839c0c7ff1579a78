"""End-to-end tiny attack: the jitted step runs, the objective improves, the
patch stays in [0, 1], and the schedule matches transformers' implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.attacks import (
    AttackSpec,
    cosine_schedule_with_warmup,
    init_attack_state,
    make_attack_step,
    make_val_step,
)
from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.utils import WordStubTokenizer, build_tma_target_tokens


def _setup(batch_size=2, image_size=56):
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=image_size, seed=0)
    batches = batch_iterator(frames, batch_size=batch_size, pad_to=48)
    return params, batches


def test_cosine_schedule_matches_transformers():
    import torch
    from transformers import get_cosine_schedule_with_warmup

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=2e-3)
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=20, num_training_steps=100)
    for step in range(100):
        want = sched.get_last_lr()[0]
        got = cosine_schedule_with_warmup(step, 2e-3, 20, 100)
        assert abs(got - want) < 1e-12, (step, got, want)
        opt.step()
        sched.step()


def test_tma_attack_step_runs_and_improves():
    params, batches = _setup()
    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    spec = AttackSpec(objective="tma", geometry=True, inner_loop=2)
    step = make_attack_step(spec, VLA_TINY, target, maskidx)
    state = init_attack_state(jax.random.key(1), (12, 12))

    batch = next(batches)
    losses = []
    for i in range(8):
        lr = cosine_schedule_with_warmup(i + 1, 5e-2, 0, 100)
        state, metrics = step(params, state, batch, jnp.float32(lr), jnp.bool_(True), jax.random.key(i))
        losses.append(float(metrics["loss"][-1]))
    patch = np.asarray(state.patch)
    assert patch.min() >= 0.0 and patch.max() <= 1.0
    assert np.isfinite(losses).all()
    # optimizing the patch against a tiny random model should still reduce CE
    assert min(losses[-3:]) < losses[0], losses


def test_uada_and_upa_steps_run():
    params, batches = _setup()
    batch = next(batches)
    for objective, kwargs in [
        ("uada", dict(mse_weight=5.0)),
        ("upa", dict(grad_clip_l1=1e-3)),
        ("upa_negce", {}),
        ("upa_guide", dict(grad_clip_l1=1e-3)),
    ]:
        spec = AttackSpec(objective=objective, geometry=True, inner_loop=1, **kwargs)
        step = make_attack_step(spec, VLA_TINY, None, [0, 1, 2])
        state = init_attack_state(jax.random.key(2), (12, 12))
        state, metrics = step(
            params, state, batch, jnp.float32(1e-2), jnp.bool_(True), jax.random.key(3)
        )
        assert np.isfinite(float(metrics["loss"][-1]))
        p = np.asarray(state.patch)
        assert p.min() >= 0.0 and p.max() <= 1.0


def test_accumulate_holds_update():
    params, batches = _setup()
    maskidx = [0]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    spec = AttackSpec(objective="tma", geometry=False, inner_loop=1, accumulate_steps=2)
    step = make_attack_step(spec, VLA_TINY, target, maskidx)
    state = init_attack_state(jax.random.key(4), (8, 8))
    p0 = np.asarray(state.patch)
    batch = next(batches)
    state, _ = step(params, state, batch, jnp.float32(1e-2), jnp.bool_(False), jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(state.patch), p0)  # update held
    assert np.abs(np.asarray(state.grad_acc)).sum() > 0          # grads accumulated
    state, _ = step(params, state, batch, jnp.float32(1e-2), jnp.bool_(True), jax.random.key(6))
    assert (np.asarray(state.patch) != p0).any()                 # update applied
    assert np.abs(np.asarray(state.grad_acc)).sum() == 0         # buffer reset


def test_accumulation_buffer_keeps_raw_gradients():
    """The L1 clip applies only to the gradient fed into the optimizer at
    update time (UPA.py:155-158); the accumulation buffer must carry RAW
    gradients — clipping the buffer each inner step would repeatedly rescale
    away earlier contributions."""
    params, batches = _setup()
    batch = next(batches)
    states = {}
    for clip in (None, 1e-3):
        spec = AttackSpec(objective="upa", geometry=False, inner_loop=1,
                          accumulate_steps=2, grad_clip_l1=clip)
        step = make_attack_step(spec, VLA_TINY, None, [0, 1, 2])
        state = init_attack_state(jax.random.key(9), (8, 8))
        state, _ = step(
            params, state, batch, jnp.float32(1e-2), jnp.bool_(False), jax.random.key(10)
        )
        states[clip] = state
    np.testing.assert_array_equal(
        np.asarray(states[None].grad_acc), np.asarray(states[1e-3].grad_acc)
    )


def test_val_step_metrics():
    from roboticattack_tpu.attacks.engine import make_clean_filter_step

    params, batches = _setup()
    maskidx = [6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    spec = AttackSpec(objective="tma", geometry=True, inner_loop=1)
    val = make_val_step(spec, VLA_TINY, target, maskidx)
    state = init_attack_state(jax.random.key(7), (8, 8))
    batch = next(batches)
    metrics = val(params, state.patch, batch, jax.random.key(8))
    assert np.isfinite(float(metrics["ce"]))
    assert metrics["_patched_images"].shape == batch.images.shape
    # the maskidx==[6] clean-image pre-filter is its OWN compiled program
    # (fusing a second full forward into the val OOMs the 7B compile) and
    # the runner merges its output; the val itself no longer emits the key
    assert "clean_gripper_correct" not in metrics
    clean = make_clean_filter_step(VLA_TINY)
    grip_ok = clean(params, batch)
    assert grip_ok.shape == (batch.images.shape[0],) and grip_ok.dtype == bool
    # patch-independent and deterministic
    np.testing.assert_array_equal(np.asarray(grip_ok), np.asarray(clean(params, batch)))


def test_host_prefetch_preserves_order_and_surfaces_errors():
    """host_prefetch assembles batches on a daemon thread but must hand them
    over unchanged and in order, finish cleanly, and re-raise producer
    exceptions at the consumer (the relay-safe feed used by the attack loop;
    all jax calls stay on the consumer thread by construction)."""
    from roboticattack_tpu.data.prefetch import host_prefetch

    assert list(host_prefetch(iter(range(7)), depth=2)) == list(range(7))

    def boom():
        yield 1
        yield 2
        raise RuntimeError("producer died")

    it = host_prefetch(boom(), depth=1)
    assert next(it) == 1 and next(it) == 2
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="producer died"):
        next(it)
