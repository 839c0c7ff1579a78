"""HF OpenVLA checkpoint -> roboticattack_tpu parameter pytree.

Maps the `openvla/openvla-7b*` safetensors layout (torch [out, in] linear
weights, timm ViT naming, HF Llama naming) onto our stacked-layer, input-major
pytrees. Includes the LayerScale `gamma -> scale_factor` rename the reference
applies (modeling_prismatic.py:52-59) — both names are accepted.

All outputs are NumPy arrays (host); shard/cast on device placement.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Mapping

import numpy as np

from .config import LlamaConfig, ViTConfig, VLAConfig


def _t(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x).T)


def convert_llama(state: Mapping[str, np.ndarray], cfg: LlamaConfig,
                  prefix: str = "language_model.") -> Dict:
    def get(name):
        return np.asarray(state[prefix + name])

    layers = {k: [] for k in
              ("attn_norm", "q_w", "k_w", "v_w", "o_w", "mlp_norm", "gate_w", "up_w", "down_w")}
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        layers["attn_norm"].append(get(p + "input_layernorm.weight"))
        layers["q_w"].append(_t(get(p + "self_attn.q_proj.weight")))
        layers["k_w"].append(_t(get(p + "self_attn.k_proj.weight")))
        layers["v_w"].append(_t(get(p + "self_attn.v_proj.weight")))
        layers["o_w"].append(_t(get(p + "self_attn.o_proj.weight")))
        layers["mlp_norm"].append(get(p + "post_attention_layernorm.weight"))
        layers["gate_w"].append(_t(get(p + "mlp.gate_proj.weight")))
        layers["up_w"].append(_t(get(p + "mlp.up_proj.weight")))
        layers["down_w"].append(_t(get(p + "mlp.down_proj.weight")))
    return {
        "embed": get("model.embed_tokens.weight"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "norm": get("model.norm.weight"),
        "lm_head": _t(get("lm_head.weight")),
    }


def resample_pos_embed(pos: np.ndarray, new_grid: int) -> np.ndarray:
    """Resample a square [N, D] patch position-embedding grid to
    [new_grid^2, D] with bicubic+antialias interpolation — the semantics timm
    applies when a model is created at a non-native `img_size`
    (timm resample_abs_pos_embed; triggered by base_vision.py:111's
    `img_size=self.default_image_size` override)."""
    old_grid = int(round(pos.shape[0] ** 0.5))
    assert old_grid * old_grid == pos.shape[0], (
        f"pos embed length {pos.shape[0]} is not a square grid"
    )
    if old_grid == new_grid:
        return pos
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.ascontiguousarray(pos, dtype=np.float32))
    t = t.reshape(1, old_grid, old_grid, -1).permute(0, 3, 1, 2)
    t = F.interpolate(t, size=(new_grid, new_grid), mode="bicubic", antialias=True)
    return t.permute(0, 2, 3, 1).reshape(new_grid * new_grid, -1).numpy()


def convert_vit(state: Mapping[str, np.ndarray], cfg: ViTConfig, prefix: str) -> Dict:
    def get(name):
        return np.asarray(state[prefix + name])

    def maybe(name):
        return np.asarray(state[prefix + name]) if (prefix + name) in state else None

    # conv [D, 3, P, P] -> [P, P, 3, D] -> [P*P*3, D] (matches vit.patchify order)
    conv_w = get("patch_embed.proj.weight")
    d = conv_w.shape[0]
    kernel = conv_w.transpose(2, 3, 1, 0).reshape(-1, d)

    pos = get("pos_embed")[0]  # [N(+1), D]
    cls_token = maybe("cls_token")
    cls_pos = None
    if cfg.use_cls_token and pos.shape[0] == int(round((pos.shape[0] - 1) ** 0.5)) ** 2 + 1:
        # embed_class layout: row 0 belongs to cls; fold it into the cls token
        cls_pos, pos = pos[0], pos[1:]
    # non-native resolution (336/384px zoo variants): resample the grid
    pos = resample_pos_embed(pos, cfg.image_size // cfg.patch_size)

    layers: Dict[str, list] = {}

    def push(key, val):
        layers.setdefault(key, []).append(val)

    # only the blocks that execute (0..depth-2); the checkpoint's final block
    # and final norm are dead in the OpenVLA tap path (modeling_prismatic.py:85-87)
    for i in range(cfg.tap_layer):
        p = f"blocks.{i}."
        push("ln1_scale", get(p + "norm1.weight"))
        push("ln1_bias", get(p + "norm1.bias"))
        push("qkv_w", _t(get(p + "attn.qkv.weight")))
        push("qkv_b", get(p + "attn.qkv.bias"))
        push("proj_w", _t(get(p + "attn.proj.weight")))
        push("proj_b", get(p + "attn.proj.bias"))
        push("ln2_scale", get(p + "norm2.weight"))
        push("ln2_bias", get(p + "norm2.bias"))
        push("fc1_w", _t(get(p + "mlp.fc1.weight")))
        push("fc1_b", get(p + "mlp.fc1.bias"))
        push("fc2_w", _t(get(p + "mlp.fc2.weight")))
        push("fc2_b", get(p + "mlp.fc2.bias"))
        if cfg.use_layerscale:
            ls1 = maybe(p + "ls1.scale_factor")
            ls2 = maybe(p + "ls2.scale_factor")
            push("ls1", ls1 if ls1 is not None else get(p + "ls1.gamma"))
            push("ls2", ls2 if ls2 is not None else get(p + "ls2.gamma"))

    patch_embed: Dict = {"kernel": kernel}
    bias = maybe("patch_embed.proj.bias")  # absent on pre-norm (CLIP) towers
    if bias is not None:
        patch_embed["bias"] = bias
    params: Dict = {
        "patch_embed": patch_embed,
        "pos_embed": pos,
        "blocks": {k: np.stack(v) for k, v in layers.items()},
    }
    if cfg.use_cls_token:
        assert cls_token is not None, f"{prefix}cls_token missing"
        cls = cls_token.reshape(1, -1)
        if cls_pos is not None:
            cls = cls + cls_pos[None]
        params["cls_token"] = cls
    if cfg.num_reg_tokens:
        params["reg_tokens"] = get("reg_token").reshape(cfg.num_reg_tokens, -1)
    if cfg.pre_norm:
        params["norm_pre"] = {"scale": get("norm_pre.weight"), "bias": get("norm_pre.bias")}
    return params


def convert_projector(state: Mapping[str, np.ndarray], prefix: str = "projector.") -> Dict:
    """Fused checkpoints carry the 3-layer fc1/fc2/fc3 MLP; single-tower ones
    the 2-layer fc1/fc2 (modeling_prismatic.py:127-156)."""
    def get(name):
        return np.asarray(state[prefix + name])

    out = {
        "fc1_w": _t(get("fc1.weight")), "fc1_b": get("fc1.bias"),
        "fc2_w": _t(get("fc2.weight")), "fc2_b": get("fc2.bias"),
    }
    if prefix + "fc3.weight" in state:
        out["fc3_w"] = _t(get("fc3.weight"))
        out["fc3_b"] = get("fc3.bias")
    return out


def convert_state_dict(state: Mapping[str, np.ndarray], cfg: VLAConfig) -> Dict:
    from .config import PhiConfig

    vision = {"dino": convert_vit(state, cfg.dino, "vision_backbone.featurizer.")}
    if cfg.siglip is not None:
        vision["siglip"] = convert_vit(state, cfg.siglip, "vision_backbone.fused_featurizer.")
    if isinstance(cfg.llm, PhiConfig):
        from .phi import convert_phi

        llm = convert_phi(state, cfg.llm)
    else:
        llm = convert_llama(state, cfg.llm)
    return {
        "vision": vision,
        "projector": convert_projector(state),
        "llm": llm,
    }


def checkpoint_shard_files(path: str) -> list:
    """Safetensors shard filenames of a local HF checkpoint dir, from the
    index when present (the released OpenVLA checkpoints ship
    model.safetensors.index.json) else by directory listing."""
    index_path = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index_path):
        with open(index_path) as f:
            return sorted(set(json.load(f)["weight_map"].values()))
    return sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))


def read_state_dict(path: str) -> Dict:
    """Read a local HF checkpoint dir's safetensors shards into a raw
    {hf_name: np.ndarray} state dict (no conversion).

    Loads through torch (framework="pt"): the released checkpoints are bf16,
    which numpy (and hence safetensors' "np" framework) cannot represent.
    bf16 tensors round-trip via ml_dtypes views, so no precision is lost."""
    import torch
    from safetensors import safe_open  # lazy: only needed on the real path

    def to_numpy(t: "torch.Tensor") -> np.ndarray:
        if t.dtype == torch.bfloat16:
            import ml_dtypes

            return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
        return t.numpy()

    state: Dict[str, np.ndarray] = {}
    for shard in checkpoint_shard_files(path):
        with safe_open(os.path.join(path, shard), framework="pt") as sf:
            for key in sf.keys():
                state[key] = to_numpy(sf.get_tensor(key))
    return state


def load_checkpoint_dir(path: str, cfg: VLAConfig) -> Dict:
    """Load a local HF OpenVLA checkpoint directory (safetensors shards)."""
    return convert_state_dict(read_state_dict(path), cfg)


def load_norm_stats(path: str) -> Dict:
    """Read `dataset_statistics.json` next to a checkpoint (the eval path's
    source of q01/q99 masks, experiments/robot/openvla_utils.py:60-70), or the
    `norm_stats` field of config.json."""
    stats_path = os.path.join(path, "dataset_statistics.json")
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            return json.load(f)
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)["norm_stats"]
