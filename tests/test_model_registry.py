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
    UnsupportedArchitecture,
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
    with pytest.raises(UnsupportedArchitecture, match="vision backbone"):
        build_config("phi-2+3b")  # clip tower
    with pytest.raises(UnsupportedArchitecture, match="vision backbone"):
        build_config("prism-clip+7b")
    with pytest.raises(KeyError):
        build_config("nope")
    assert build_config("openvla-7b") is OPENVLA_7B
    assert build_config("dinov2-224px+7b").siglip is None
    assert build_config("dinosiglip-224px-resize-naive+7b").siglip is not None


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
