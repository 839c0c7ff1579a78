"""End-to-end integration: train a tiny VLA on an image-dependent task, then
TMA-attack it and verify the patch actually hijacks the policy.

Synthetic task: the correct action is +0.8*ones when the image is bright and
-0.8*ones when dark. The trained model reads brightness; a trained adversarial
patch (white/black square) can then genuinely flip its prediction — giving a
real, non-vacuous ASR signal with no robot or checkpoint required. This is the
framework's own closed-loop sanity proof (SURVEY.md §4(c))."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.attacks import (
    AttackConfig,
    AttackSpec,
    cosine_schedule_with_warmup,
    init_attack_state,
    make_attack_step,
    make_val_step,
)
from roboticattack_tpu.data import collate
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.training import TrainConfig, VLATrainer
from roboticattack_tpu.utils import WordStubTokenizer, build_tma_target_tokens, build_vla_example

BRIGHT = 0.8
IMG = 56
# brightness-dependent xyz DIRECTION for the UPA test: a mid-space vector so
# the soft bin-index geometry UPA operates in (nonnegative coordinates,
# losses.py:286-302) has a well-conditioned angle
XYZ_BRIGHT = np.array([0.8, -0.8, 0.4])


def _brightness_frames(batch, rng, bright=None, directional=False):
    tok = WordStubTokenizer()
    rows = []
    for _ in range(batch):
        is_bright = bool(rng.integers(2)) if bright is None else bright
        # bases close to the 0.5 boundary so a large patch can plausibly flip
        # the model (oracle calibration: an all-white 36x36 patch reaches
        # CE~0.6 / 31% flips on this task)
        base = 0.65 if is_bright else 0.35
        img = np.clip(base + rng.normal(0, 0.03, (IMG, IMG, 3)), 0, 1)
        if directional:
            xyz = XYZ_BRIGHT if is_bright else -XYZ_BRIGHT
            action = np.concatenate([xyz, np.full(4, 0.5 if is_bright else -0.5)])
        else:
            action = np.full(7, BRIGHT if is_bright else -BRIGHT)
        ids, labels = build_vla_example("press the lever", action, tok)
        rows.append(dict(image=(img * 255).astype(np.uint8), input_ids=ids, labels=labels))
    return collate(rows, pad_to=32)


def _batches(batch, seed, bright=None, directional=False):
    rng = np.random.default_rng(seed)
    while True:
        yield _brightness_frames(batch, rng, bright, directional=directional)


@pytest.mark.slow
def test_train_then_attack_flips_policy():
    # --- 1. train the tiny VLA until it predicts brightness-dependent actions
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    trainer = VLATrainer(
        params, VLA_TINY,
        TrainConfig(strategy="ddp", learning_rate=2e-3, max_steps=160, max_grad_norm=1.0),
    )
    final_loss = trainer.run_training(_batches(8, seed=1), num_steps=160)
    assert final_loss < 0.5, f"tiny model failed to learn the task: loss={final_loss}"
    trained = jax.device_get(trainer.params)

    # --- 2. sanity: on DARK images the clean model predicts the dark action
    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.full(7, BRIGHT), maskidx)  # attack: force "bright" output
    spec = AttackSpec(objective="tma", geometry=False, inner_loop=2)
    val = make_val_step(spec, VLA_TINY, target, maskidx)

    dark_val = _brightness_frames(16, np.random.default_rng(2), bright=False)
    m0 = jax.device_get(val(trained, jnp.zeros((14, 14, 3)), dark_val, jax.random.key(3)))
    baseline_success = float(np.asarray(m0["ex_success"]).mean())
    assert baseline_success < 0.3, "dark images should not already yield the bright action"

    # --- 3. TMA: train a patch that forces the BRIGHT action on DARK images
    step = make_attack_step(spec, VLA_TINY, target, maskidx)
    state = init_attack_state(jax.random.key(4), (36, 36))  # ~41% of 56x56
    batches = _batches(8, seed=5, bright=False)
    ce0 = None
    for i in range(60):
        lr = cosine_schedule_with_warmup(i, 5e-2, 3, 60)
        state, metrics = step(
            trained, state, next(batches), jnp.float32(lr), jnp.bool_(True), jax.random.key(6 + i)
        )
        ce = float(np.asarray(metrics["ce"])[-1])
        if ce0 is None:
            ce0 = ce
    m1 = jax.device_get(val(trained, state.patch, dark_val, jax.random.key(7)))
    attacked_success = float(np.asarray(m1["ex_success"]).mean())
    attacked_ce = float(np.asarray(m1["ex_ce"]).mean())
    clean_ce = float(np.asarray(m0["ex_ce"]).mean())

    # the patch must substantially move the model toward the target action,
    # beating the trivial all-white oracle (~CE 0.6 / 31% flips)
    assert attacked_ce < clean_ce * 0.25, (clean_ce, attacked_ce)
    assert attacked_success >= 0.25 and attacked_success > baseline_success, (
        baseline_success, attacked_success,
    )

    # --- 4. the SAME patch hijacks the policy through the EVAL-side path:
    # fixed-position uint8 ToPILImage-quantized paste (simulation_random_patch
    # parity, appply_random_transform.py:43-78) + the KV-cache greedy-decode
    # policy (predict_action). Proves train-time attack efficacy survives the
    # simulator-side quantization + decode pipeline — the closed-loop
    # hand-off the reference never unit-tests.
    from roboticattack_tpu.eval.libero import LiberoEvalConfig, apply_patch_to_frame
    from roboticattack_tpu.eval.policy import VLAPolicy

    stats = {"synthetic": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7,
                                      "mask": [True] * 6 + [False]}}}
    policy = VLAPolicy(
        jax.tree.map(jnp.asarray, trained), VLA_TINY, WordStubTokenizer(),
        stats, "synthetic", False,
    )
    eval_cfg = LiberoEvalConfig(x=10, y=10, resize_size=IMG)
    patch_np = np.asarray(state.patch)
    rng = np.random.default_rng(21)
    clean_xyz, patched_xyz = [], []
    for _ in range(6):
        frame = (np.clip(0.35 + rng.normal(0, 0.03, (IMG, IMG, 3)), 0, 1) * 255
                 ).astype(np.uint8)
        clean_xyz.append(policy.get_action(frame, "press the lever")[:6].mean())
        patched = apply_patch_to_frame(frame, patch_np, eval_cfg)
        patched_xyz.append(policy.get_action(patched, "press the lever")[:6].mean())
    clean_mean, patched_mean = float(np.mean(clean_xyz)), float(np.mean(patched_xyz))
    # clean dark frames decode to the dark action (~ -0.8); patched frames
    # are dragged toward the bright target
    assert clean_mean < -0.3, clean_mean
    assert patched_mean > clean_mean + 0.5, (clean_mean, patched_mean)


@pytest.mark.slow
def test_upa_direction_metrics_and_descent():
    """UPA mechanism validation on a brightness->xyz-direction policy.

    Two properties that must hold end-to-end (and a documented negative
    result): (a) the direction metrics DETECT a turned policy — a dark image
    on bright ground truth drops the cos-sim angle and blows up the xyz
    distance through the whole logits->soft-xyz chain (losses.py:286-302);
    (b) the jitted UPA attack step performs correct first-order descent —
    its loss strictly decreases from a random patch on a soft policy.

    Measured negative result (kept out of the assertions): first-order patch
    optimization can NOT flip this toy policy's direction — once the model
    saturates, the softmax-expectation gradient vanishes (120 full-image
    attack steps move the angle by <0.02), and a half-trained model has no
    crisp direction to reverse. The reference's UPA operates on a calibrated
    7B where the expectation stays differentiable; formula-level parity is
    covered by the torch-replica tests in test_losses.py."""
    params = init_vla_params(jax.random.key(10), VLA_TINY)
    trainer = VLATrainer(
        params, VLA_TINY,
        TrainConfig(strategy="ddp", learning_rate=2e-3, max_steps=160, max_grad_norm=1.0),
    )
    # snapshot a SOFT policy early (unsaturated logits -> live gradients),
    # then train to saturation for the metric-detection check
    trainer.run_training(_batches(8, seed=11, directional=True), num_steps=40)
    soft = jax.device_get(trainer.params)
    final_loss = trainer.run_training(_batches(8, seed=11, directional=True), num_steps=120)
    assert final_loss < 0.5, f"tiny model failed to learn the task: loss={final_loss}"
    trained = jax.device_get(trainer.params)

    maskidx = [0, 1, 2, 3, 4, 5, 6]
    spec = AttackSpec(objective="upa", geometry=False, inner_loop=1,
                      grad_clip_l1=1e-3)
    val = make_val_step(spec, VLA_TINY, None, maskidx)
    bright_val = _brightness_frames(
        16, np.random.default_rng(12), bright=True, directional=True
    )

    # (a) metric chain: clean ~parallel (cos+1 ~ 2), full dark image turns it
    m0 = jax.device_get(
        val(trained, jnp.zeros((14, 14, 3)), bright_val, jax.random.key(13))
    )
    clean_angle = float(np.asarray(m0["ex_angle"]).mean())
    clean_dist = float(np.asarray(m0["ex_xyz_dist"]).mean())
    assert clean_angle > 1.95, clean_angle
    m_dark = jax.device_get(
        val(trained, jnp.full((IMG, IMG, 3), 0.35), bright_val, jax.random.key(14))
    )
    dark_angle = float(np.asarray(m_dark["ex_angle"]).mean())
    dark_dist = float(np.asarray(m_dark["ex_xyz_dist"]).mean())
    assert dark_angle < clean_angle - 0.25, (clean_angle, dark_angle)
    assert dark_dist > clean_dist * 10, (clean_dist, dark_dist)

    # (b) first-order descent on the soft policy, full-image patch
    step = make_attack_step(spec, VLA_TINY, None, maskidx)
    state = init_attack_state(jax.random.key(15), (IMG, IMG))
    batches = _batches(8, seed=16, bright=True, directional=True)
    losses = []
    for i in range(30):
        lr = cosine_schedule_with_warmup(i, 1e-1, 3, 30)
        state, metrics = step(
            soft, state, next(batches), jnp.float32(lr), jnp.bool_(True),
            jax.random.key(17 + i),
        )
        losses.append(float(np.asarray(metrics["loss"])[-1]))
    assert min(losses[-5:]) < losses[0] - 0.01, (losses[0], losses[-5:])
