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
