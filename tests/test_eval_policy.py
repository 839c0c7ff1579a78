"""Eval-layer tests: policy end-to-end on the tiny model, processing parity,
queue resume logic. LIBERO itself is not installed — the env-facing code is
import-gated and exercised via its pure pieces."""

import os

import numpy as np
import pytest

from roboticattack_tpu.eval import (
    SUITE_PLACEMENTS,
    eval_prompt,
    load_policy,
    organize_experiments,
    resize_bicubic_pil,
)
from roboticattack_tpu.eval.libero import (
    DUMMY_ACTION,
    MAX_STEPS_CLEAN,
    MAX_STEPS_PATCHED,
    LiberoEvalConfig,
    apply_patch_to_frame,
)
from roboticattack_tpu.utils import invert_gripper_action, normalize_gripper_action


def test_protocol_constants():
    assert MAX_STEPS_PATCHED == {
        "libero_spatial": 193, "libero_object": 254, "libero_goal": 270,
        "libero_10": 505, "libero_90": 373,
    }
    assert MAX_STEPS_CLEAN["libero_spatial"] == 220
    assert DUMMY_ACTION == [0, 0, 0, 0, 0, 0, -1]
    assert SUITE_PLACEMENTS == {
        "libero_10": (5, 160), "libero_object": (30, 150),
        "libero_goal": (15, 158), "libero_spatial": (120, 160),
    }
    assert eval_prompt("Close The Drawer") == (
        "In: What action should the robot take to close the drawer?\nOut:"
    )


def test_policy_end_to_end_tiny():
    policy = load_policy(None, model_name="vla-tiny")
    frame = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a1 = policy.get_action(frame, "pick up the cup")
    a2 = policy.get_action(frame, "pick up the cup")
    assert a1.shape == (7,)
    np.testing.assert_array_equal(a1, a2)  # deterministic greedy
    # different instruction -> (almost surely) different tokenization path works
    a3 = policy.get_action(frame, "slide the bowl to the left edge of the table")
    assert a3.shape == (7,)

    # full env-side action post-processing
    post = invert_gripper_action(normalize_gripper_action(a1, binarize=True))
    assert post[-1] in (-1.0, 1.0)


def test_patch_applied_to_frame():
    from roboticattack_tpu.attacks.artifacts import save_patch_pt, load_patch

    rng = np.random.default_rng(1)
    patch = rng.uniform(0, 1, (10, 10, 3)).astype(np.float32)
    frame = rng.integers(0, 255, (224, 224, 3), dtype=np.uint8)
    cfg = LiberoEvalConfig(x=120, y=160)
    out = apply_patch_to_frame(frame, patch, cfg)
    np.testing.assert_array_equal(out[160:170, 120:130], (patch * 255).astype(np.uint8))
    np.testing.assert_array_equal(out[:160, :120], frame[:160, :120])


def test_resize_bicubic_matches_pil():
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    ours = resize_bicubic_pil(img, 224)
    want = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC))
    np.testing.assert_array_equal(ours, want)


def test_queue_marker_resume(tmp_path):
    from roboticattack_tpu.eval.queue import COMPLETE_SENTINEL

    out = str(tmp_path)
    patches = {s: f"/fake/{s}/patch.pt" for s in SUITE_PLACEMENTS}
    tasks = organize_experiments(patches, out)
    assert len(tasks) == 4
    x, y = SUITE_PLACEMENTS["libero_goal"]
    marker = os.path.join(out, f"EVAL-libero_goal--{x}_{y}_0_0_0.txt")
    # a PARTIAL episode log (the eval creates it at start; a killed queue
    # can't clean it up) must be retried, not skipped
    with open(marker, "w") as f:
        f.write("task=0 ep=0 success=True running=1/1\n")
    assert len(organize_experiments(patches, out)) == 4
    # only the completion sentinel (stamped by run_task after rc==0,
    # filename per the reference scheme eval_queue_single_four_spec.py:36-39)
    # marks it done
    with open(marker, "a") as f:
        f.write(COMPLETE_SENTINEL + "\n")
    tasks2 = organize_experiments(patches, out)
    assert len(tasks2) == 3
    assert all(t["suite"] != "libero_goal" for t in tasks2)
    # geometry moves the marker: a different angle is a different run id
    tasks3 = organize_experiments(patches, out, angle=15)
    assert len(tasks3) == 4
    assert all(t["angle"] == 15 for t in tasks3)


def test_is_noop_filter():
    from roboticattack_tpu.eval.regenerate_libero import is_noop

    zero = np.zeros(7)
    move = np.array([0.01, 0, 0, 0, 0, 0, -1.0])
    grip_flip = np.array([0, 0, 0, 0, 0, 0, 1.0])
    assert is_noop(zero, None)
    assert not is_noop(move, zero)
    assert is_noop(np.array([0, 0, 0, 0, 0, 0, -1.0]), np.array([1e-9] * 6 + [-1.0]))
    assert not is_noop(grip_flip, np.array([0, 0, 0, 0, 0, 0, -1.0]))


def test_robot_utils_dispatch():
    from roboticattack_tpu.eval.policy import get_action, get_model, set_seed_everywhere

    set_seed_everywhere(0)
    policy = get_model(None, model_family="openvla", model_name="vla-tiny")
    frame = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a = get_action(policy, {"full_image": frame}, "wipe the table")
    assert a.shape == (7,)


def test_policy_jacobi_draft_control_loop():
    """draft_tokens='last' reuses the previous step's tokens as a Jacobi
    draft: identical actions (exact greedy fixed point), and a repeated
    frame verifies in ONE pass (the control-loop steady state)."""
    policy = load_policy(None, model_name="vla-tiny")
    frame = np.random.default_rng(1).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    task = "push the plate forward"

    a_plain = policy.get_action_multi(frame[None], [task])
    assert policy.last_tokens is not None and policy.last_tokens.shape == (1, 7)
    assert policy.last_verify_passes is None  # plain decode

    a_draft = policy.get_action_multi(frame[None], [task], draft_tokens="last")
    np.testing.assert_array_equal(a_plain, a_draft)
    assert policy.last_verify_passes == 1  # the draft was accepted whole

    # cold start semantics: "last" with a batch-width change uses a ZERO
    # draft (stays on the one compiled Jacobi program; never feeds a
    # mismatched draft) — still the exact greedy result
    frames2 = np.stack([frame, frame])
    a2 = policy.get_action_multi(frames2, [task, task], draft_tokens="last")
    assert policy.last_verify_passes is not None  # jacobi ran, zero draft
    np.testing.assert_array_equal(a2[0], a_plain[0])


def test_policy_get_action_array_draft():
    """The single-request convenience wrapper accepts a [7] draft array (the
    shape its own previous call exposes via last_tokens[0])."""
    policy = load_policy(None, model_name="vla-tiny")
    frame = np.random.default_rng(2).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    a1 = policy.get_action(frame, "open the top drawer")
    a2 = policy.get_action(frame, "open the top drawer",
                           draft_tokens=policy.last_tokens[0])
    np.testing.assert_array_equal(a1, a2)
    assert policy.last_verify_passes == 1


def test_quantize_grammar():
    """utils.quant_args is the ONE --quantize grammar: jax-free parse shared
    by the four CLIs and load_policy (eval/policy.py re-exports it)."""
    import argparse

    import pytest

    from roboticattack_tpu.utils.quant_args import (
        parse_quantize,
        quantize_arg,
        resolve_quantize,
    )

    assert parse_quantize(None) == (None, None)
    assert parse_quantize("int8") == ("int8", None)  # gs irrelevant for int8
    assert parse_quantize("int4") == ("int4", None)  # None = per-model auto
    assert parse_quantize("int4:32") == ("int4", 32)
    assert parse_quantize("w8a8") == ("w8a8", None)
    for bad in ("int16", "int4:0", "int4:-8", "int4:x", "fp8", "w4a8"):
        with pytest.raises(ValueError):
            parse_quantize(bad)
        # argparse validator surfaces the grammar message (ArgumentTypeError,
        # not a swallowed ValueError)
        with pytest.raises(argparse.ArgumentTypeError, match="quantize"):
            quantize_arg(bad)
    assert quantize_arg("int4:64") == "int4:64"
    # resolve_quantize = parse + the ONE w8a8 -> (weights, act) split
    assert resolve_quantize(None) == (None, None, None)
    assert resolve_quantize("int8") == ("int8", None, None)
    assert resolve_quantize("w8a8") == ("int8", "int8", None)
    assert resolve_quantize("int4:32") == ("int4", None, 32)
