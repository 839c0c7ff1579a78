"""ViT numeric parity vs HuggingFace reference implementations.

timm isn't installed here, but `transformers` ships the SAME architectures the
OpenVLA checkpoint uses: Dinov2WithRegisters (cls + 4 registers + LayerScale)
and SiglipVisionModel. We convert their random tiny weights into our pytree
and require the second-to-last-block patch features to match — validating the
block math, prefix/pos-embed ordering, the tap point, and the cls-pos folding
the checkpoint converter relies on (models/convert.py).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from roboticattack_tpu.models.config import TINY_DINO, TINY_SIGLIP
from roboticattack_tpu.models.vit import vit_features


def _stack_layers(get, depth, fmt_q, fmt_k, fmt_v, fmt_o, fmt_n1, fmt_n2, fmt_f1, fmt_f2,
                  ls1=None, ls2=None):
    blocks = {k: [] for k in
              ("ln1_scale", "ln1_bias", "qkv_w", "qkv_b", "proj_w", "proj_b",
               "ln2_scale", "ln2_bias", "fc1_w", "fc1_b", "fc2_w", "fc2_b")}
    if ls1:
        blocks["ls1"], blocks["ls2"] = [], []
    for i in range(depth):
        q_w, q_b = get(fmt_q.format(i) + ".weight"), get(fmt_q.format(i) + ".bias")
        k_w, k_b = get(fmt_k.format(i) + ".weight"), get(fmt_k.format(i) + ".bias")
        v_w, v_b = get(fmt_v.format(i) + ".weight"), get(fmt_v.format(i) + ".bias")
        blocks["qkv_w"].append(np.concatenate([q_w.T, k_w.T, v_w.T], axis=1))
        blocks["qkv_b"].append(np.concatenate([q_b, k_b, v_b]))
        blocks["proj_w"].append(get(fmt_o.format(i) + ".weight").T)
        blocks["proj_b"].append(get(fmt_o.format(i) + ".bias"))
        blocks["ln1_scale"].append(get(fmt_n1.format(i) + ".weight"))
        blocks["ln1_bias"].append(get(fmt_n1.format(i) + ".bias"))
        blocks["ln2_scale"].append(get(fmt_n2.format(i) + ".weight"))
        blocks["ln2_bias"].append(get(fmt_n2.format(i) + ".bias"))
        blocks["fc1_w"].append(get(fmt_f1.format(i) + ".weight").T)
        blocks["fc1_b"].append(get(fmt_f1.format(i) + ".bias"))
        blocks["fc2_w"].append(get(fmt_f2.format(i) + ".weight").T)
        blocks["fc2_b"].append(get(fmt_f2.format(i) + ".bias"))
        if ls1:
            blocks["ls1"].append(get(ls1.format(i)))
            blocks["ls2"].append(get(ls2.format(i)))
    return {k: jnp.asarray(np.stack(v)) for k, v in blocks.items()}


def test_dinov2_with_registers_parity():
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    cfg = TINY_DINO
    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_hidden,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_reg_tokens, hidden_act="gelu",
        layer_norm_eps=cfg.ln_eps,
    )
    torch.manual_seed(0)
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    # randomize layerscale away from init=1 so it's actually exercised
    with torch.no_grad():
        for layer in model.encoder.layer:
            layer.layer_scale1.lambda1.mul_(0.3).add_(0.1)
            layer.layer_scale2.lambda1.mul_(0.2).add_(0.05)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    get = lambda n: sd[n]

    conv = get("embeddings.patch_embeddings.projection.weight")
    pos = get("embeddings.position_embeddings")[0]     # [1+N, D]
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)),
            "bias": jnp.asarray(get("embeddings.patch_embeddings.projection.bias")),
        },
        "pos_embed": jnp.asarray(pos[1:]),
        "cls_token": jnp.asarray(get("embeddings.cls_token")[0] + pos[:1]),
        "reg_tokens": jnp.asarray(get("embeddings.register_tokens")[0]),
        "blocks": _stack_layers(
            get, cfg.tap_layer,
            "encoder.layer.{}.attention.attention.query",
            "encoder.layer.{}.attention.attention.key",
            "encoder.layer.{}.attention.attention.value",
            "encoder.layer.{}.attention.output.dense",
            "encoder.layer.{}.norm1", "encoder.layer.{}.norm2",
            "encoder.layer.{}.mlp.fc1", "encoder.layer.{}.mlp.fc2",
            ls1="encoder.layer.{}.layer_scale1.lambda1",
            ls2="encoder.layer.{}.layer_scale2.lambda1",
        ),
    }

    rng = np.random.default_rng(0)
    images = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    # hidden_states[k] = after layer k-1 -> tap (second-to-last block) = [depth-1]
    want = hf_out.hidden_states[cfg.depth - 1].numpy()[:, 1 + cfg.num_reg_tokens :]

    got = np.asarray(vit_features(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


def test_clip_parity():
    """CLIP tower (quick-GELU + pre-norm ln_pre + bias-less patch embed +
    embed_class pos layout folded into cls) vs transformers CLIPVisionModel —
    the same architecture as timm's vit_*_clip_*.openai with
    act_layer='quick_gelu' (clip_vit.py:16-27)."""
    from dataclasses import replace

    from transformers import CLIPVisionConfig, CLIPVisionModel

    from roboticattack_tpu.models.config import ViTConfig

    cfg = ViTConfig(
        embed_dim=32, depth=3, num_heads=2, mlp_hidden=64, patch_size=14,
        image_size=56, use_cls_token=True, pre_norm=True, use_quick_gelu=True,
        ln_eps=1e-5,
    )
    hf_cfg = CLIPVisionConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_hidden,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_act="quick_gelu", layer_norm_eps=cfg.ln_eps,
    )
    torch.manual_seed(2)
    model = CLIPVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    get = lambda n: sd["vision_model." + n]

    conv = get("embeddings.patch_embedding.weight")  # bias=False in CLIP
    pos = get("embeddings.position_embedding.weight")  # [1+N, D], row 0 = cls
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)),
        },
        "pos_embed": jnp.asarray(pos[1:]),
        "cls_token": jnp.asarray(get("embeddings.class_embedding")[None] + pos[:1]),
        "norm_pre": {
            "scale": jnp.asarray(get("pre_layrnorm.weight")),
            "bias": jnp.asarray(get("pre_layrnorm.bias")),
        },
        "blocks": _stack_layers(
            get, cfg.tap_layer,
            "encoder.layers.{}.self_attn.q_proj",
            "encoder.layers.{}.self_attn.k_proj",
            "encoder.layers.{}.self_attn.v_proj",
            "encoder.layers.{}.self_attn.out_proj",
            "encoder.layers.{}.layer_norm1", "encoder.layers.{}.layer_norm2",
            "encoder.layers.{}.mlp.fc1", "encoder.layers.{}.mlp.fc2",
        ),
    }

    rng = np.random.default_rng(2)
    images = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    want = hf_out.hidden_states[cfg.depth - 1].numpy()[:, 1:]  # strip cls

    got = np.asarray(vit_features(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)

    # quick-GELU must actually differ from exact GELU on this graph
    got_gelu = np.asarray(
        vit_features(params, replace(cfg, use_quick_gelu=False), jnp.asarray(images))
    )
    assert np.abs(got_gelu - want).max() > 1e-3


def test_patchify_floor_crop_matches_strided_conv():
    """Non-multiple image sizes (384 @ patch 14) follow conv floor semantics:
    trailing rows/cols are dropped, exactly like torch Conv2d stride=P."""
    from roboticattack_tpu.models.vit import patchify

    rng = np.random.default_rng(3)
    patch, h, w = 14, 62, 62  # grid 4x4, 6 trailing pixels dropped
    images = rng.standard_normal((2, h, w, 3)).astype(np.float32)
    weight = rng.standard_normal((8, 3, patch, patch)).astype(np.float32)

    kernel = weight.transpose(2, 3, 1, 0).reshape(-1, 8)
    ours = np.asarray(patchify(jnp.asarray(images), patch)) @ kernel

    conv = torch.nn.functional.conv2d(
        torch.from_numpy(images.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight), stride=patch,
    ).numpy()  # [B, 8, 4, 4]
    want = conv.reshape(2, 8, -1).transpose(0, 2, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_siglip_parity():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    cfg = TINY_SIGLIP
    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_hidden,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_act="gelu", layer_norm_eps=cfg.ln_eps,
    )
    torch.manual_seed(1)
    model = SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    get = lambda n: sd["vision_model." + n]

    conv = get("embeddings.patch_embedding.weight")
    params = {
        "patch_embed": {
            "kernel": jnp.asarray(conv.transpose(2, 3, 1, 0).reshape(-1, cfg.embed_dim)),
            "bias": jnp.asarray(get("embeddings.patch_embedding.bias")),
        },
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight")),
        "blocks": _stack_layers(
            get, cfg.tap_layer,
            "encoder.layers.{}.self_attn.q_proj",
            "encoder.layers.{}.self_attn.k_proj",
            "encoder.layers.{}.self_attn.v_proj",
            "encoder.layers.{}.self_attn.out_proj",
            "encoder.layers.{}.layer_norm1", "encoder.layers.{}.layer_norm2",
            "encoder.layers.{}.mlp.fc1", "encoder.layers.{}.mlp.fc2",
        ),
    }

    rng = np.random.default_rng(1)
    images = rng.standard_normal((2, cfg.image_size, cfg.image_size, 3)).astype(np.float32)
    with torch.no_grad():
        hf_out = model(
            torch.from_numpy(images.transpose(0, 3, 1, 2)), output_hidden_states=True
        )
    want = hf_out.hidden_states[cfg.depth - 1].numpy()

    got = np.asarray(vit_features(params, cfg, jnp.asarray(images)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)
