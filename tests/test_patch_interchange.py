"""Artifact interchange with the reference's RELEASED adversarial patches
(/root/reference/adversarial_patches, read-only): our loader must consume
them, they must paste into eval frames, and our own saves must round-trip
through the same format."""

import glob
import os

import numpy as np
import pytest

REF_PATCHES = sorted(
    glob.glob("/root/reference/adversarial_patches/*/*/*/patch.pt")
)

pytestmark = pytest.mark.skipif(
    not REF_PATCHES, reason="reference patch artifacts not available"
)


def test_load_released_reference_patches():
    from roboticattack_tpu.attacks.artifacts import load_patch

    for path in REF_PATCHES[:6]:
        patch = load_patch(path)
        assert patch.ndim == 3 and patch.shape[-1] == 3, path
        assert patch.dtype == np.float32
        assert patch.min() >= 0.0 and patch.max() <= 1.0, path
        assert patch.shape[0] in (22, 50, 70, 87, 100), (path, patch.shape)


def test_released_patch_matches_released_png():
    """patch.png next to patch.pt is the ToPILImage-quantized render; our
    quantizer must reproduce it from the tensor."""
    from PIL import Image

    from roboticattack_tpu.attacks.artifacts import load_patch
    from roboticattack_tpu.ops.patch_ops import quantize_patch_u8

    checked = 0
    for path in REF_PATCHES[:6]:
        png = os.path.join(os.path.dirname(path), "patch.png")
        if not os.path.exists(png):
            continue
        patch = load_patch(path)
        ours = quantize_patch_u8(patch)
        theirs = np.asarray(Image.open(png).convert("RGB"))
        if theirs.shape != ours.shape:
            continue
        # identical quantization modulo PNG round-trip
        assert np.mean(np.abs(ours.astype(int) - theirs.astype(int))) < 1.0, path
        checked += 1
    assert checked >= 1, "no comparable patch.png found"


def test_released_patch_pastes_into_eval_frame():
    from roboticattack_tpu.attacks.artifacts import load_patch
    from roboticattack_tpu.ops.patch_ops import simulation_paste_patch

    patch = load_patch(REF_PATCHES[0])
    frame = np.random.default_rng(0).integers(0, 255, (224, 224, 3), dtype=np.uint8)
    out = simulation_paste_patch(frame, patch, position=(120, 160))
    ph, pw = patch.shape[:2]
    np.testing.assert_array_equal(
        out[160 : 160 + ph, 120 : 120 + pw], (patch * 255).astype(np.uint8)
    )


def test_our_saves_reload_via_reference_path():
    """torch.load on our artifacts yields the reference's exact format."""
    import torch

    from roboticattack_tpu.attacks.artifacts import load_patch, save_patch_pt

    rng = np.random.default_rng(1)
    patch = rng.uniform(0, 1, (50, 50, 3)).astype(np.float32)
    path = "/tmp/interchange_patch.pt"
    save_patch_pt(patch, path)
    t = torch.load(path, map_location="cpu", weights_only=True)
    ref = torch.load(REF_PATCHES[0], map_location="cpu", weights_only=True)
    assert t.dtype == ref.dtype == torch.float32
    assert t.dim() == ref.dim() == 3 and t.shape[0] == ref.shape[0] == 3
    np.testing.assert_allclose(load_patch(path), patch)
