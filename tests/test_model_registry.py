"""Model-ID zoo + checkpoint acquisition: registry breadth, name resolution,
structural config construction, and the full ID -> mock hub -> converted
pytree path (safetensors OpenVLA layout AND the legacy prismatic .pt layout),
all offline."""

import json
import os

import numpy as np
import jax
import pytest

from roboticattack_tpu.models import (
    GLOBAL_REGISTRY,
    MODEL_REGISTRY,
    OPENVLA_7B,
    VLA_TINY,
    available_model_names,
    available_models,
    build_config,
    get_model_description,
    hub_files,
    init_vla_params,
    load,
)
from roboticattack_tpu.models.registry import prismatic_to_hf_names

from test_convert_roundtrip import _full_state


def _assert_pytrees_equal(a, b):
    flat_a = {jax.tree_util.keystr(k): v for k, v in jax.tree.flatten_with_path(a)[0]}
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree.flatten_with_path(b)[0]}
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_a[k]), np.asarray(flat_b[k]), atol=1e-6, err_msg=k
        )


def test_registry_breadth_and_names():
    # the reference zoo registers 49 public IDs (prismatic/models/registry.py)
    prismatic = [m for m, s in MODEL_REGISTRY.items() if s.family == "prismatic"]
    assert len(prismatic) >= 49
    vla = [m for m, s in MODEL_REGISTRY.items() if s.family == "openvla"]
    assert set(vla) == {
        "openvla-7b",
        "openvla-7b-finetuned-libero-spatial",
        "openvla-7b-finetuned-libero-object",
        "openvla-7b-finetuned-libero-goal",
        "openvla-7b-finetuned-libero-10",
    }
    # alternate display names resolve (GLOBAL_REGISTRY semantics)
    assert GLOBAL_REGISTRY["Prism-DINOSigLIP 224px 7B"].model_id == "prism-dinosiglip-224px+7b"
    assert GLOBAL_REGISTRY["Base"].model_id == "one-stage+7b"
    assert set(available_models()) <= set(available_model_names())
    desc = get_model_description("Prism-CLIP 7B")
    assert desc["model_id"] == "prism-clip+7b"
    with pytest.raises(ValueError):
        get_model_description("not-a-model")


def test_build_config_supported_and_unsupported():
    cfg = build_config("prism-dinosiglip-224px+7b")
    assert cfg.dino.embed_dim == 1024 and cfg.siglip.embed_dim == 1152
    assert cfg.llm.hidden_size == 4096


def test_build_config_errors():
    with pytest.raises(KeyError):
        build_config("nope")
    assert build_config("openvla-7b") is OPENVLA_7B
    assert build_config("dinov2-224px+7b").siglip is None
    assert build_config("dinosiglip-224px-resize-naive+7b").siglip is not None

    from roboticattack_tpu.models.config import PhiConfig

    phi = build_config("phi-2+3b")
    assert isinstance(phi.llm, PhiConfig) and phi.llm.hidden_size == 2560
    assert phi.dino.pre_norm  # clip-vit-l-336px tower


def test_every_zoo_id_constructs():
    """Every registered prismatic/openvla ID builds a structural config;
    fused towers agree on the patch grid (their features concatenate
    per-patch, dinoclip_vit.py:107-123)."""
    for model_id, spec in MODEL_REGISTRY.items():
        cfg = build_config(model_id)
        if cfg.siglip is not None:
            assert cfg.dino.num_patches == cfg.siglip.num_patches, model_id
        assert cfg.num_patches in (196, 256, 576, 729), model_id


def test_zoo_resolutions_and_towers():
    clip = build_config("clip-336px-resize-naive+7b")
    assert clip.siglip is None and clip.dino.pre_norm and clip.dino.use_quick_gelu
    assert clip.dino.image_size == 336 and clip.num_patches == 576
    sig384 = build_config("siglip-384px-letterbox+7b")
    assert sig384.dino.image_size == 384 and sig384.num_patches == 729  # floor(384/14)=27
    dinoclip = build_config("dinoclip-336px-letterbox+7b")
    assert dinoclip.siglip.use_quick_gelu and not dinoclip.dino.use_quick_gelu
    assert dinoclip.vision_dim == 2048
    in1k = build_config("in1k-224px+7b")
    assert in1k.dino.patch_size == 16 and in1k.num_patches == 196
    assert build_config("llama2+13b").llm.hidden_size == 5120
    assert build_config("mistral-v0.1+7b").llm.num_kv_heads == 8


def test_make_image_processor_per_backbone():
    from roboticattack_tpu.models.registry import make_image_processor
    from roboticattack_tpu.models.processing import CLIP_MEAN, IMAGENET_MEAN

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (400, 300, 3), dtype=np.uint8)

    proc = make_image_processor("dinoclip-336px-letterbox+7b")
    out = proc(img)
    assert out.shape == (2, 336, 336, 3)
    assert proc.means == (IMAGENET_MEAN, CLIP_MEAN)

    proc = make_image_processor("siglip-384px-resize-crop+7b")
    out = proc(img)
    assert out.shape == (1, 384, 384, 3)

    # openvla keeps the checkpoint's bf16-rounded stats + 224px
    proc = make_image_processor("openvla-7b")
    assert proc(img).shape == (2, 224, 224, 3)


def test_letterbox_fill_is_per_tower():
    """The reference letterboxes once per tower, each with its own mean fill
    (dinosiglip_vit.py:99-110): padded regions normalize to ~0 for BOTH
    towers even though their means differ."""
    from roboticattack_tpu.models.processing import PrismaticImageProcessor

    proc = PrismaticImageProcessor(image_resize_strategy="letterbox")
    img = np.full((100, 300, 3), 200, np.uint8)  # wide -> pad top/bottom
    out = proc(img)
    # top-left pixel sits in the padded band for both planes
    pad_dino, pad_siglip = out[0, 0, 0], out[1, 0, 0]
    assert np.abs(pad_dino).max() < 0.02, pad_dino  # dino fill / dino norm ~ 0
    assert np.abs(pad_siglip).max() < 0.02, pad_siglip  # siglip fill / siglip norm ~ 0


def test_resize_crop_matches_torchvision_geometry():
    """resize-crop = Resize(shorter->S, long side truncates) + CenterCrop(S,
    rounded origin) — torchvision F.resize/F.center_crop semantics the
    reference's default timm transform uses (base_vision.py:144-168)."""
    from PIL import Image

    from roboticattack_tpu.models.processing import PrismaticImageProcessor

    proc = PrismaticImageProcessor(
        image_size=224, image_resize_strategy="resize-crop",
        means=((0.0,) * 3,), stds=((1.0,) * 3,),
    )
    # w=301 < h=407: resized to (301->224, 407 -> int(224*407/301)=302)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (407, 301, 3), dtype=np.uint8)
    nw, nh = 224, int(224 * 407 / 301)
    resized = Image.fromarray(img).resize((nw, nh), Image.BICUBIC)
    top = int(round((nh - 224) / 2.0))
    want = np.asarray(resized, np.float32)[top : top + 224, :, :] / 255.0
    got = proc(img)[0]
    np.testing.assert_array_equal(got, want)


def test_single_tower_vla_forward_uses_two_layer_projector():
    """Non-fused configs get the 2-layer gelu-mlp projector
    (modeling_prismatic.py:133-137) and run end-to-end."""
    import dataclasses

    import jax.numpy as jnp

    from roboticattack_tpu.models import vla_forward

    cfg = dataclasses.replace(VLA_TINY, name="tiny-single", siglip=None)
    params = jax.device_get(init_vla_params(jax.random.key(3), cfg))
    assert set(params["projector"]) == {"fc1_w", "fc1_b", "fc2_w", "fc2_b"}
    ids = jnp.asarray(np.random.default_rng(4).integers(5, 30000, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)
    pixels = jnp.zeros((2, 1, 56, 56, 3), jnp.float32)
    labels = jnp.where(mask.astype(bool), ids, -100)
    out = vla_forward(params, cfg, ids, mask, pixels, labels)
    assert np.isfinite(float(out.loss))


def test_hub_file_resolution():
    repo, files = hub_files("openvla-7b")
    assert repo == "openvla/openvla-7b"
    assert "dataset_statistics.json" in files
    repo, files = hub_files("Prism-DINOSigLIP 224px 7B")
    assert repo == "TRI-ML/prismatic-vlms"
    assert files == [
        "prism-dinosiglip-224px+7b/config.json",
        "prism-dinosiglip-224px+7b/checkpoints/latest-checkpoint.pt",
    ]


def _write_safetensors_dir(tmp_path, params):
    from safetensors.numpy import save_file

    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
          for k, v in _full_state(params).items()}
    save_file(sd, str(tmp_path / "model-00001-of-00001.safetensors"))
    (tmp_path / "dataset_statistics.json").write_text(json.dumps({
        "bridge_orig": {"action": {
            "q01": [0.0] * 7, "q99": [1.0] * 7, "mask": [True] * 6 + [False],
        }}
    }))
    return tmp_path


def test_load_openvla_id_via_mock_hub(tmp_path):
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    ckpt_dir = _write_safetensors_dir(tmp_path, params)
    calls = {}

    def fake_hub(repo_id, patterns, cache_dir, hf_token):
        calls["repo"] = repo_id
        calls["patterns"] = patterns
        return str(ckpt_dir)

    restored, cfg, stats = load("openvla-7b", download_fn=fake_hub, config=VLA_TINY)
    assert calls["repo"] == "openvla/openvla-7b"
    assert cfg is VLA_TINY
    assert stats is not None and "bridge_orig" in stats
    _assert_pytrees_equal(params, restored)


def test_load_prismatic_id_via_mock_hub(tmp_path):
    """Legacy prismatic layout: torch .pt with {'model': {module: state_dict}}
    and vlms/prismatic.py module names (dino_featurizer / projector.projector.N
    / llm_backbone.llm) — converted through the rename shim."""
    import torch

    params = jax.device_get(init_vla_params(jax.random.key(1), VLA_TINY))
    hf_names = _full_state(params)
    inverse = {
        "vision_backbone.featurizer.": "vision_backbone.dino_featurizer.",
        "vision_backbone.fused_featurizer.": "vision_backbone.siglip_featurizer.",
        "projector.fc1.": "projector.projector.0.",
        "projector.fc2.": "projector.projector.2.",
        "projector.fc3.": "projector.projector.4.",
        "language_model.": "llm_backbone.llm.",
    }
    modules = {"vision_backbone": {}, "projector": {}, "llm_backbone": {}}
    for key, val in hf_names.items():
        for new, old in inverse.items():
            if key.startswith(new):
                key = old + key[len(new):]
                break
        module = key.split(".", 1)[0]
        modules[module][key.split(".", 1)[1]] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(val, np.float32))
        )
    model_id = "prism-dinosiglip-224px+7b"
    run_dir = tmp_path / model_id
    (run_dir / "checkpoints").mkdir(parents=True)
    torch.save({"model": modules}, run_dir / "checkpoints" / "latest-checkpoint.pt")

    restored, cfg, stats = load(
        model_id, download_fn=lambda *a: str(tmp_path), config=VLA_TINY
    )
    assert stats is None
    _assert_pytrees_equal(params, restored)


def test_prismatic_rename_shim_targets_converter_names():
    renamed = prismatic_to_hf_names({
        "vision_backbone.dino_featurizer.blocks.0.attn.qkv.weight": 1,
        "projector.projector.2.bias": 2,
        "llm_backbone.llm.model.layers.0.self_attn.q_proj.weight": 3,
    })
    assert set(renamed) == {
        "vision_backbone.featurizer.blocks.0.attn.qkv.weight",
        "projector.fc2.bias",
        "language_model.model.layers.0.self_attn.q_proj.weight",
    }
