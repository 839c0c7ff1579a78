"""Checkpoint converter validation without real checkpoints:

1. Inverse-map our randomly-initialized tiny params into a state dict with the
   exact timm/HF names the OpenVLA checkpoint uses, run `convert_state_dict`,
   and require bit-exact equality with the originals — pinning every name and
   transpose in models/convert.py.
2. Write that state dict as bf16 safetensors shards (what the released
   checkpoints actually contain) and load through `load_checkpoint_dir`.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.models import VLA_TINY, init_vla_params, vla_forward
from roboticattack_tpu.models.convert import convert_state_dict, load_checkpoint_dir


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _vit_state(params, prefix, cfg, use_ls):
    sd = {}
    kernel = np.asarray(params["patch_embed"]["kernel"])  # [P*P*3, D]
    d = kernel.shape[1]
    p = cfg.patch_size
    sd[prefix + "patch_embed.proj.weight"] = (
        kernel.reshape(p, p, 3, d).transpose(3, 2, 0, 1)
    )
    if "bias" in params["patch_embed"]:  # absent on pre-norm (CLIP) towers
        sd[prefix + "patch_embed.proj.bias"] = np.asarray(params["patch_embed"]["bias"])
    sd[prefix + "pos_embed"] = np.asarray(params["pos_embed"])[None]
    if "cls_token" in params:
        sd[prefix + "cls_token"] = np.asarray(params["cls_token"])[None]
    if "reg_tokens" in params:
        sd[prefix + "reg_token"] = np.asarray(params["reg_tokens"])[None]
    blocks = params["blocks"]
    depth = blocks["qkv_w"].shape[0]
    for i in range(depth):
        b = f"{prefix}blocks.{i}."
        sd[b + "norm1.weight"] = np.asarray(blocks["ln1_scale"][i])
        sd[b + "norm1.bias"] = np.asarray(blocks["ln1_bias"][i])
        sd[b + "attn.qkv.weight"] = _t(blocks["qkv_w"][i])
        sd[b + "attn.qkv.bias"] = np.asarray(blocks["qkv_b"][i])
        sd[b + "attn.proj.weight"] = _t(blocks["proj_w"][i])
        sd[b + "attn.proj.bias"] = np.asarray(blocks["proj_b"][i])
        sd[b + "norm2.weight"] = np.asarray(blocks["ln2_scale"][i])
        sd[b + "norm2.bias"] = np.asarray(blocks["ln2_bias"][i])
        sd[b + "mlp.fc1.weight"] = _t(blocks["fc1_w"][i])
        sd[b + "mlp.fc1.bias"] = np.asarray(blocks["fc1_b"][i])
        sd[b + "mlp.fc2.weight"] = _t(blocks["fc2_w"][i])
        sd[b + "mlp.fc2.bias"] = np.asarray(blocks["fc2_b"][i])
        if use_ls:
            sd[b + "ls1.scale_factor"] = np.asarray(blocks["ls1"][i])
            sd[b + "ls2.scale_factor"] = np.asarray(blocks["ls2"][i])
    return sd


def _full_state(params):
    cfg = VLA_TINY
    sd = {}
    sd.update(_vit_state(params["vision"]["dino"], "vision_backbone.featurizer.",
                         cfg.dino, use_ls=True))
    sd.update(_vit_state(params["vision"]["siglip"], "vision_backbone.fused_featurizer.",
                         cfg.siglip, use_ls=False))
    pj = params["projector"]
    for i in (1, 2, 3):
        sd[f"projector.fc{i}.weight"] = _t(pj[f"fc{i}_w"])
        sd[f"projector.fc{i}.bias"] = np.asarray(pj[f"fc{i}_b"])
    llm = params["llm"]
    sd["language_model.model.embed_tokens.weight"] = np.asarray(llm["embed"])
    sd["language_model.model.norm.weight"] = np.asarray(llm["norm"])
    sd["language_model.lm_head.weight"] = _t(llm["lm_head"])
    L = llm["layers"]
    for i in range(cfg.llm.num_layers):
        b = f"language_model.model.layers.{i}."
        sd[b + "input_layernorm.weight"] = np.asarray(L["attn_norm"][i])
        sd[b + "self_attn.q_proj.weight"] = _t(L["q_w"][i])
        sd[b + "self_attn.k_proj.weight"] = _t(L["k_w"][i])
        sd[b + "self_attn.v_proj.weight"] = _t(L["v_w"][i])
        sd[b + "self_attn.o_proj.weight"] = _t(L["o_w"][i])
        sd[b + "post_attention_layernorm.weight"] = np.asarray(L["mlp_norm"][i])
        sd[b + "mlp.gate_proj.weight"] = _t(L["gate_w"][i])
        sd[b + "mlp.up_proj.weight"] = _t(L["up_w"][i])
        sd[b + "mlp.down_proj.weight"] = _t(L["down_w"][i])
    return sd


def test_convert_roundtrip_exact():
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    sd = _full_state(params)
    restored = convert_state_dict(sd, VLA_TINY)
    flat_a, tree_a = jax.tree.flatten_with_path(params)
    flat_b = dict(jax.tree.flatten_with_path(restored)[0])
    flat_b = {jax.tree_util.keystr(k): v for k, v in flat_b.items()}
    for path, a in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(flat_b[key]), err_msg=key)


def test_convert_handles_embed_class_pos_layout():
    """timm checkpoints that store pos_embed with a cls row get the cls-pos
    folded into the cls token (convert.py cls_pos handling)."""
    params = jax.device_get(init_vla_params(jax.random.key(1), VLA_TINY))
    sd = _full_state(params)
    # rewrite dino pos_embed to the [1, 1+N, D] layout
    pos = sd["vision_backbone.featurizer.pos_embed"]
    cls_pos = np.random.default_rng(0).standard_normal((1, 1, pos.shape[-1])).astype(pos.dtype)
    sd["vision_backbone.featurizer.pos_embed"] = np.concatenate([cls_pos, pos], axis=1)
    restored = convert_state_dict(sd, VLA_TINY)
    np.testing.assert_allclose(
        np.asarray(restored["vision"]["dino"]["cls_token"]),
        np.asarray(params["vision"]["dino"]["cls_token"]) + cls_pos[0],
        rtol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(restored["vision"]["dino"]["pos_embed"]),
        np.asarray(params["vision"]["dino"]["pos_embed"]),
    )


def test_convert_pre_norm_tower_and_two_layer_projector():
    """CLIP-flavoured conversion: no patch-embed bias, norm_pre present,
    2-layer projector (single-tower gelu-mlp)."""
    import dataclasses

    from roboticattack_tpu.models.convert import convert_projector, convert_vit

    clip_tiny = dataclasses.replace(
        VLA_TINY.dino, num_reg_tokens=0, use_layerscale=False,
        pre_norm=True, use_quick_gelu=True, ln_eps=1e-5,
    )
    from roboticattack_tpu.models.vit import init_vit_params

    params = jax.device_get(init_vit_params(jax.random.key(5), clip_tiny))
    sd = _vit_state(params, "v.", clip_tiny, use_ls=False)
    assert "v.patch_embed.proj.bias" not in sd  # timm bias=not pre_norm
    sd["v.norm_pre.weight"] = np.asarray(params["norm_pre"]["scale"])
    sd["v.norm_pre.bias"] = np.asarray(params["norm_pre"]["bias"])
    restored = convert_vit(sd, clip_tiny, "v.")
    assert "bias" not in restored["patch_embed"]
    np.testing.assert_array_equal(
        restored["norm_pre"]["scale"], np.asarray(params["norm_pre"]["scale"])
    )
    np.testing.assert_array_equal(restored["pos_embed"], np.asarray(params["pos_embed"]))

    rng = np.random.default_rng(6)
    proj_sd = {
        "projector.fc1.weight": rng.standard_normal((8, 4)).astype(np.float32),
        "projector.fc1.bias": rng.standard_normal(8).astype(np.float32),
        "projector.fc2.weight": rng.standard_normal((8, 8)).astype(np.float32),
        "projector.fc2.bias": rng.standard_normal(8).astype(np.float32),
    }
    proj = convert_projector(proj_sd)
    assert set(proj) == {"fc1_w", "fc1_b", "fc2_w", "fc2_b"}
    np.testing.assert_array_equal(proj["fc1_w"], proj_sd["projector.fc1.weight"].T)


def test_convert_resamples_pos_embed_across_resolutions():
    """Loading a checkpoint at a different resolution resamples the position
    grid bicubically (timm resample_abs_pos_embed semantics, triggered by the
    img_size override at base_vision.py:111)."""
    import dataclasses

    import torch
    import torch.nn.functional as F

    from roboticattack_tpu.models.convert import convert_vit, resample_pos_embed
    from roboticattack_tpu.models.vit import init_vit_params, vit_features

    # checkpoint saved at 56px (grid 4), loaded into an 84px config (grid 6)
    src_cfg = VLA_TINY.dino
    dst_cfg = dataclasses.replace(src_cfg, image_size=84)
    params = jax.device_get(init_vit_params(jax.random.key(7), src_cfg))
    sd = _vit_state(params, "v.", src_cfg, use_ls=True)
    restored = convert_vit(sd, dst_cfg, "v.")
    assert restored["pos_embed"].shape == (36, src_cfg.embed_dim)

    pos = np.asarray(params["pos_embed"], np.float32)
    want = (
        F.interpolate(
            torch.from_numpy(pos).reshape(1, 4, 4, -1).permute(0, 3, 1, 2),
            size=(6, 6), mode="bicubic", antialias=True,
        ).permute(0, 2, 3, 1).reshape(36, -1).numpy()
    )
    np.testing.assert_allclose(restored["pos_embed"], want, rtol=1e-6)

    # identity when the grids match
    np.testing.assert_array_equal(resample_pos_embed(pos, 4), pos)

    # and the resampled tower runs at the new resolution
    rng = np.random.default_rng(8)
    images = jnp.asarray(rng.standard_normal((1, 84, 84, 3)).astype(np.float32))
    feats = vit_features(jax.tree.map(jnp.asarray, restored), dst_cfg, images)
    assert feats.shape == (1, 36, src_cfg.embed_dim)


def test_load_bf16_safetensors_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file

    params = jax.device_get(init_vla_params(jax.random.key(2), VLA_TINY))
    sd = _full_state(params)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v)).to(torch.bfloat16)
               for k, v in sd.items()}
    # two shards + index, like the real checkpoint
    keys = sorted(tensors)
    half = len(keys) // 2
    save_file({k: tensors[k] for k in keys[:half]}, str(tmp_path / "model-00001.safetensors"))
    save_file({k: tensors[k] for k in keys[half:]}, str(tmp_path / "model-00002.safetensors"))
    index = {"weight_map": {k: ("model-00001.safetensors" if k in keys[:half]
                                 else "model-00002.safetensors") for k in keys}}
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump(index, f)
    with open(tmp_path / "dataset_statistics.json", "w") as f:
        json.dump({"synthetic": {"action": {"q01": [-1] * 7, "q99": [1] * 7}}}, f)

    restored = load_checkpoint_dir(str(tmp_path), VLA_TINY)
    emb = np.asarray(restored["llm"]["embed"], dtype=np.float32)
    want = np.asarray(
        torch.from_numpy(sd["language_model.model.embed_tokens.weight"])
        .to(torch.bfloat16).float().numpy()
    )
    np.testing.assert_array_equal(emb, want)

    # the converted bf16 pytree runs a forward pass
    jparams = jax.tree.map(lambda x: jnp.asarray(np.asarray(x, np.float32)), restored)
    ids = jnp.asarray(np.random.default_rng(3).integers(5, 30000, (1, 12)))
    mask = jnp.ones((1, 12), jnp.int32)
    pixels = jnp.zeros((1, 2, 56, 56, 3), jnp.float32)
    out = vla_forward(jparams, VLA_TINY, ids, mask, pixels, None)
    assert np.isfinite(np.asarray(out.logits)).all()
