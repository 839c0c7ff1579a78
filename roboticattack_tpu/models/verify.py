"""Real-checkpoint acceptance machinery: golden manifest, activation parity,
attack smoke.

This is the one-command path that turns "the converter is tested against tiny
HF modules" into "THIS downloaded checkpoint is loadable and numerically
faithful" — the validation gap called out for the released
`openvla/openvla-7b` weights (reference entry points:
prismatic/models/load.py:52-90, extern/hf/modeling_prismatic.py:291-534,
experiments/robot/openvla_utils.py:31-72). Three independent legs, each
cheap(er) than the next so failures surface before long work:

1. `manifest_report` — validate tensor NAMES/SHAPES/DTYPES against a golden
   manifest derived from the VLAConfig, reading only the safetensors headers
   (no tensor data): a truncated download, a wrong repo, or a layout drift
   fails in seconds.
2. `parity_report` — per-module activation parity of our converted pytree
   against torch reference modules built DIRECTLY from the raw checkpoint
   names (transformers' Dinov2WithRegisters / SiglipVisionModel /
   LlamaForCausalLM — the same architectures the timm/HF checkpoint encodes;
   the mapping here never passes through our converter, so a converter bug
   cannot cancel out), plus an end-to-end multimodal logits comparison
   mirroring the reference forward (modeling_prismatic.py:362-415).
3. `tma_smoke` — a short TMA attack run on synthetic frames: the loss must
   decrease and a patch artifact must come out, proving the full
   differentiable path end-to-end on the real weights.

All legs are offline-testable on tiny synthetic checkpoints
(tests/test_verify_checkpoint.py); the CLI front-end is
cli/verify_checkpoint.py.
"""

from __future__ import annotations

import json
import os
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .config import LlamaConfig, VLAConfig, ViTConfig

# ------------------------------------------------------------------ manifest --

# safetensors dtype name -> byte width (for size accounting)
_DTYPE_BYTES = {
    "F64": 8, "F32": 4, "F16": 2, "BF16": 2, "I64": 8, "I32": 4, "I16": 2,
    "I8": 1, "U8": 1, "BOOL": 1,
}


def read_safetensors_headers(path: str) -> Dict[str, Tuple[str, Tuple[int, ...]]]:
    """{tensor_name: (dtype, shape)} across all shards of a checkpoint dir,
    parsed from the 8-byte-length-prefixed JSON headers — no tensor data is
    read, so this is instant even for the 15 GB 7B checkpoint."""
    from .convert import checkpoint_shard_files

    out: Dict[str, Tuple[str, Tuple[int, ...]]] = {}
    for shard in checkpoint_shard_files(path):
        with open(os.path.join(path, shard), "rb") as f:
            (n,) = struct.unpack("<Q", f.read(8))
            header = json.loads(f.read(n))
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            out[name] = (meta["dtype"], tuple(meta["shape"]))
    return out


@dataclass
class TensorRule:
    """One required checkpoint tensor: any of `names` must exist (alternates
    cover layout variants like ls1.scale_factor vs ls1.gamma), with one of
    the allowed `shapes` (multiple cover e.g. pos-embed with/without the cls
    row)."""
    names: Tuple[str, ...]
    shapes: Tuple[Tuple[int, ...], ...]
    optional: bool = False


def _vit_rules(prefix: str, cfg: ViTConfig) -> List[TensorRule]:
    d, h, p = cfg.embed_dim, cfg.mlp_hidden, cfg.patch_size
    g2 = cfg.num_patches
    rules = [
        TensorRule((prefix + "patch_embed.proj.weight",), ((d, 3, p, p),)),
        TensorRule((prefix + "pos_embed",), ((1, g2, d), (1, g2 + 1, d))),
    ]
    if not cfg.pre_norm:
        rules.append(TensorRule((prefix + "patch_embed.proj.bias",), ((d,),)))
    if cfg.use_cls_token:
        rules.append(TensorRule((prefix + "cls_token",), ((1, 1, d),)))
    if cfg.num_reg_tokens:
        rules.append(TensorRule((prefix + "reg_token",), ((1, cfg.num_reg_tokens, d),)))
    if cfg.pre_norm:
        rules.append(TensorRule((prefix + "norm_pre.weight",), ((d,),)))
        rules.append(TensorRule((prefix + "norm_pre.bias",), ((d,),)))
    # only blocks [0, tap_layer) execute; the final block + norm are dead in
    # the second-to-last-layer tap path (modeling_prismatic.py:85-101) and
    # land in the report's `unconsumed` note instead
    for i in range(cfg.tap_layer):
        b = f"{prefix}blocks.{i}."
        for nm, shape in (
            ("norm1.weight", (d,)), ("norm1.bias", (d,)),
            ("attn.qkv.weight", (3 * d, d)), ("attn.qkv.bias", (3 * d,)),
            ("attn.proj.weight", (d, d)), ("attn.proj.bias", (d,)),
            ("norm2.weight", (d,)), ("norm2.bias", (d,)),
            ("mlp.fc1.weight", (h, d)), ("mlp.fc1.bias", (h,)),
            ("mlp.fc2.weight", (d, h)), ("mlp.fc2.bias", (d,)),
        ):
            rules.append(TensorRule((b + nm,), (shape,)))
        if cfg.use_layerscale:
            rules.append(TensorRule((b + "ls1.scale_factor", b + "ls1.gamma"), ((d,),)))
            rules.append(TensorRule((b + "ls2.scale_factor", b + "ls2.gamma"), ((d,),)))
    return rules


def _llama_rules(cfg: LlamaConfig) -> List[TensorRule]:
    hid, inter = cfg.hidden_size, cfg.intermediate_size
    kv = cfg.num_kv_heads * cfg.head_dim
    rules = [
        TensorRule(("language_model.model.embed_tokens.weight",), ((cfg.vocab_size, hid),)),
        TensorRule(("language_model.model.norm.weight",), ((hid,),)),
        TensorRule(("language_model.lm_head.weight",), ((cfg.vocab_size, hid),)),
    ]
    for i in range(cfg.num_layers):
        b = f"language_model.model.layers.{i}."
        for nm, shape in (
            ("input_layernorm.weight", (hid,)),
            ("self_attn.q_proj.weight", (hid, hid)),
            ("self_attn.k_proj.weight", (kv, hid)),
            ("self_attn.v_proj.weight", (kv, hid)),
            ("self_attn.o_proj.weight", (hid, hid)),
            ("post_attention_layernorm.weight", (hid,)),
            ("mlp.gate_proj.weight", (inter, hid)),
            ("mlp.up_proj.weight", (inter, hid)),
            ("mlp.down_proj.weight", (hid, inter)),
        ):
            rules.append(TensorRule((b + nm,), (shape,)))
    return rules


def expected_checkpoint_rules(cfg: VLAConfig) -> List[TensorRule]:
    """The golden manifest: every tensor the converter will read from an HF
    OpenVLA-layout checkpoint (models/convert.py), with shapes derived purely
    from the config — so validation needs no reference download."""
    if not isinstance(cfg.llm, LlamaConfig):
        raise NotImplementedError(
            "manifest validation covers the OpenVLA (Llama-family) layout; "
            f"got {type(cfg.llm).__name__}"
        )
    rules = _vit_rules("vision_backbone.featurizer.", cfg.dino)
    v = cfg.vision_dim
    L = cfg.llm.hidden_size
    if cfg.siglip is not None:
        rules += _vit_rules("vision_backbone.fused_featurizer.", cfg.siglip)
        proj = (
            ("projector.fc1.weight", (4 * v, v)), ("projector.fc1.bias", (4 * v,)),
            ("projector.fc2.weight", (L, 4 * v)), ("projector.fc2.bias", (L,)),
            ("projector.fc3.weight", (L, L)), ("projector.fc3.bias", (L,)),
        )
    else:
        proj = (
            ("projector.fc1.weight", (L, v)), ("projector.fc1.bias", (L,)),
            ("projector.fc2.weight", (L, L)), ("projector.fc2.bias", (L,)),
        )
    rules += [TensorRule((nm,), (shape,)) for nm, shape in proj]
    rules += _llama_rules(cfg.llm)
    return rules


@dataclass
class ManifestReport:
    ok: bool
    n_tensors: int
    total_bytes: int
    dtypes: Dict[str, int]
    missing: List[str] = field(default_factory=list)
    shape_mismatches: List[str] = field(default_factory=list)
    unconsumed: List[str] = field(default_factory=list)

    def to_json(self) -> Dict:
        return {
            "ok": self.ok, "n_tensors": self.n_tensors,
            "total_bytes": self.total_bytes, "dtypes": self.dtypes,
            "missing": self.missing, "shape_mismatches": self.shape_mismatches,
            "n_unconsumed": len(self.unconsumed),
            "unconsumed_sample": self.unconsumed[:20],
        }


def manifest_report(ckpt_dir: str, cfg: VLAConfig) -> ManifestReport:
    """Validate a downloaded safetensors checkpoint against the golden
    manifest. Reads only headers; reports EVERY missing/mis-shaped tensor
    (not just the first), so one look at the output tells whether the
    download is truncated, the repo is wrong, or the layout drifted."""
    return validate_manifest(read_safetensors_headers(ckpt_dir), cfg)


# numpy dtype name -> safetensors dtype name, so in-memory manifests share
# _DTYPE_BYTES and histogram keys with the header-scan path ('int64' would
# otherwise yield an 'INT64' key that misses the byte table)
_NUMPY_TO_ST = {
    "float64": "F64", "float32": "F32", "float16": "F16", "bfloat16": "BF16",
    "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
    "uint8": "U8", "bool": "BOOL",
}


def manifest_report_from_state(state: Dict[str, np.ndarray], cfg: VLAConfig) -> ManifestReport:
    """Manifest validation over an in-memory (HF-named) state dict — the
    prismatic .pt path, which has no cheap header scan (torch.load reads
    everything anyway)."""
    headers = {}
    for k, v in state.items():
        name = str(np.asarray(v).dtype)
        headers[k] = (_NUMPY_TO_ST.get(name, name.upper()), tuple(v.shape))
    return validate_manifest(headers, cfg)


def validate_manifest(headers: Dict[str, Tuple[str, Tuple[int, ...]]],
                      cfg: VLAConfig) -> ManifestReport:
    missing: List[str] = []
    mismatched: List[str] = []
    consumed = set()
    for rule in expected_checkpoint_rules(cfg):
        present = [n for n in rule.names if n in headers]
        if not present:
            if not rule.optional:
                missing.append(" | ".join(rule.names))
            continue
        name = present[0]
        consumed.add(name)
        _, shape = headers[name]
        if shape not in rule.shapes:
            mismatched.append(
                f"{name}: got {list(shape)}, want one of "
                f"{[list(s) for s in rule.shapes]}"
            )
    dtypes: Dict[str, int] = {}
    total = 0
    for name, (dtype, shape) in headers.items():
        dtypes[dtype] = dtypes.get(dtype, 0) + 1
        total += int(np.prod(shape, dtype=np.int64)) * _DTYPE_BYTES.get(dtype, 4)
    return ManifestReport(
        ok=not missing and not mismatched,
        n_tensors=len(headers),
        total_bytes=total,
        dtypes=dtypes,
        missing=missing,
        shape_mismatches=mismatched,
        unconsumed=sorted(set(headers) - consumed),
    )


# ------------------------------------------------------------------- parity --

def _np32(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _torch32(x: np.ndarray):
    import torch

    return torch.from_numpy(_np32(x))


def _split_qkv(w: np.ndarray, b: np.ndarray, d: int):
    return (w[:d], w[d : 2 * d], w[2 * d :]), (b[:d], b[d : 2 * d], b[2 * d :])


def build_hf_dinov2(state: Dict[str, np.ndarray], cfg: ViTConfig,
                    prefix: str = "vision_backbone.featurizer."):
    """torch Dinov2WithRegistersModel loaded from the checkpoint's timm-layout
    names (the same architecture timm's vit_large_patch14_reg4_dinov2
    encodes). The qkv split / LayerScale / pos-embed handling here is an
    INDEPENDENT reading of the checkpoint — it never touches our converter."""
    import torch
    from transformers import Dinov2WithRegistersConfig, Dinov2WithRegistersModel

    hf_cfg = Dinov2WithRegistersConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_hidden / cfg.embed_dim,  # Dinov2 has no intermediate_size
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        num_register_tokens=cfg.num_reg_tokens, hidden_act="gelu",
        layer_norm_eps=cfg.ln_eps,
    )
    model = Dinov2WithRegistersModel(hf_cfg).eval()
    get = lambda n: _np32(state[prefix + n])
    d = cfg.embed_dim
    sd = {
        "embeddings.cls_token": get("cls_token"),
        "embeddings.register_tokens": get("reg_token"),
        "embeddings.patch_embeddings.projection.weight": get("patch_embed.proj.weight"),
        "embeddings.patch_embeddings.projection.bias": get("patch_embed.proj.bias"),
    }
    pos = get("pos_embed")  # [1, N or 1+N, D]
    if pos.shape[1] == cfg.num_patches:
        # timm no_embed_class layout: cls gets no position — equivalently a
        # zero cls-pos row in HF's [1, 1+N, D] layout
        pos = np.concatenate([np.zeros((1, 1, d), np.float32), pos], axis=1)
    sd["embeddings.position_embeddings"] = pos
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        hb = f"encoder.layer.{i}."
        if prefix + b + "norm1.weight" not in state:
            # converted-back checkpoints may omit the dead final block; keep
            # the HF module's random init there (never read at the tap)
            continue
        (qw, kw, vw), (qb, kb, vb) = _split_qkv(
            get(b + "attn.qkv.weight"), get(b + "attn.qkv.bias"), d
        )
        ls1 = state.get(prefix + b + "ls1.scale_factor", state.get(prefix + b + "ls1.gamma"))
        ls2 = state.get(prefix + b + "ls2.scale_factor", state.get(prefix + b + "ls2.gamma"))
        sd.update({
            hb + "norm1.weight": get(b + "norm1.weight"),
            hb + "norm1.bias": get(b + "norm1.bias"),
            hb + "attention.attention.query.weight": qw,
            hb + "attention.attention.query.bias": qb,
            hb + "attention.attention.key.weight": kw,
            hb + "attention.attention.key.bias": kb,
            hb + "attention.attention.value.weight": vw,
            hb + "attention.attention.value.bias": vb,
            hb + "attention.output.dense.weight": get(b + "attn.proj.weight"),
            hb + "attention.output.dense.bias": get(b + "attn.proj.bias"),
            hb + "layer_scale1.lambda1": _np32(ls1),
            hb + "layer_scale2.lambda1": _np32(ls2),
            hb + "norm2.weight": get(b + "norm2.weight"),
            hb + "norm2.bias": get(b + "norm2.bias"),
            hb + "mlp.fc1.weight": get(b + "mlp.fc1.weight"),
            hb + "mlp.fc1.bias": get(b + "mlp.fc1.bias"),
            hb + "mlp.fc2.weight": get(b + "mlp.fc2.weight"),
            hb + "mlp.fc2.bias": get(b + "mlp.fc2.bias"),
        })
    ret = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    # missing keys are expected (mask_token / dead final block on converted-
    # back fixtures); unexpected keys mean THIS mapping drifted from HF
    assert not ret.unexpected_keys, ret.unexpected_keys
    return model


def build_hf_clip(state: Dict[str, np.ndarray], cfg: ViTConfig,
                  prefix: str = "vision_backbone.featurizer."):
    """torch CLIPVisionModel from the checkpoint's timm CLIP-tower names
    (pre-norm `norm_pre`, bias-less patch embed, quick-GELU — the zoo's
    `vit_*_clip_*.openai` towers, clip_vit.py:16-27)."""
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_hidden,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_act="quick_gelu" if cfg.use_quick_gelu else "gelu",
        layer_norm_eps=cfg.ln_eps,
    )
    model = CLIPVisionModel(hf_cfg).eval()
    get = lambda n: _np32(state[prefix + n])
    d = cfg.embed_dim
    pos = get("pos_embed")  # [1, N or 1+N, D]
    if pos.shape[1] == cfg.num_patches:
        # runtime layout (cls pos already folded into cls_token): zero cls row
        pos = np.concatenate([np.zeros((1, 1, d), np.float32), pos], axis=1)
    sd = {
        "vision_model.embeddings.patch_embedding.weight": get("patch_embed.proj.weight"),
        "vision_model.embeddings.class_embedding": get("cls_token").reshape(d),
        "vision_model.embeddings.position_embedding.weight": pos[0],
        "vision_model.pre_layrnorm.weight": get("norm_pre.weight"),
        "vision_model.pre_layrnorm.bias": get("norm_pre.bias"),
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        hb = f"vision_model.encoder.layers.{i}."
        if prefix + b + "norm1.weight" not in state:
            continue
        (qw, kw, vw), (qb, kb, vb) = _split_qkv(
            get(b + "attn.qkv.weight"), get(b + "attn.qkv.bias"), d
        )
        sd.update({
            hb + "layer_norm1.weight": get(b + "norm1.weight"),
            hb + "layer_norm1.bias": get(b + "norm1.bias"),
            hb + "self_attn.q_proj.weight": qw, hb + "self_attn.q_proj.bias": qb,
            hb + "self_attn.k_proj.weight": kw, hb + "self_attn.k_proj.bias": kb,
            hb + "self_attn.v_proj.weight": vw, hb + "self_attn.v_proj.bias": vb,
            hb + "self_attn.out_proj.weight": get(b + "attn.proj.weight"),
            hb + "self_attn.out_proj.bias": get(b + "attn.proj.bias"),
            hb + "layer_norm2.weight": get(b + "norm2.weight"),
            hb + "layer_norm2.bias": get(b + "norm2.bias"),
            hb + "mlp.fc1.weight": get(b + "mlp.fc1.weight"),
            hb + "mlp.fc1.bias": get(b + "mlp.fc1.bias"),
            hb + "mlp.fc2.weight": get(b + "mlp.fc2.weight"),
            hb + "mlp.fc2.bias": get(b + "mlp.fc2.bias"),
        })
    ret = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not ret.unexpected_keys, ret.unexpected_keys
    return model


def tower_builder(cfg: ViTConfig):
    """The torch reference-module builder for a tower config, or a clear
    error for combinations the harness doesn't cover yet."""
    if cfg.pre_norm:
        return build_hf_clip
    if cfg.num_reg_tokens or cfg.use_layerscale:
        return build_hf_dinov2
    if cfg.use_cls_token:
        raise NotImplementedError(
            "plain cls-token tower (IN1K-style) has no torch reference "
            "builder in the parity harness yet"
        )
    return build_hf_siglip


def build_hf_siglip(state: Dict[str, np.ndarray], cfg: ViTConfig,
                    prefix: str = "vision_backbone.fused_featurizer."):
    import torch
    from transformers import SiglipVisionConfig, SiglipVisionModel

    hf_cfg = SiglipVisionConfig(
        hidden_size=cfg.embed_dim, num_hidden_layers=cfg.depth,
        num_attention_heads=cfg.num_heads, intermediate_size=cfg.mlp_hidden,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        hidden_act="gelu", layer_norm_eps=cfg.ln_eps,
    )
    model = SiglipVisionModel(hf_cfg).eval()
    get = lambda n: _np32(state[prefix + n])
    d = cfg.embed_dim
    sd = {
        "vision_model.embeddings.patch_embedding.weight": get("patch_embed.proj.weight"),
        "vision_model.embeddings.patch_embedding.bias": get("patch_embed.proj.bias"),
        "vision_model.embeddings.position_embedding.weight": get("pos_embed")[0],
    }
    for i in range(cfg.depth):
        b = f"blocks.{i}."
        hb = f"vision_model.encoder.layers.{i}."
        if prefix + b + "norm1.weight" not in state:
            continue
        (qw, kw, vw), (qb, kb, vb) = _split_qkv(
            get(b + "attn.qkv.weight"), get(b + "attn.qkv.bias"), d
        )
        sd.update({
            hb + "layer_norm1.weight": get(b + "norm1.weight"),
            hb + "layer_norm1.bias": get(b + "norm1.bias"),
            hb + "self_attn.q_proj.weight": qw, hb + "self_attn.q_proj.bias": qb,
            hb + "self_attn.k_proj.weight": kw, hb + "self_attn.k_proj.bias": kb,
            hb + "self_attn.v_proj.weight": vw, hb + "self_attn.v_proj.bias": vb,
            hb + "self_attn.out_proj.weight": get(b + "attn.proj.weight"),
            hb + "self_attn.out_proj.bias": get(b + "attn.proj.bias"),
            hb + "layer_norm2.weight": get(b + "norm2.weight"),
            hb + "layer_norm2.bias": get(b + "norm2.bias"),
            hb + "mlp.fc1.weight": get(b + "mlp.fc1.weight"),
            hb + "mlp.fc1.bias": get(b + "mlp.fc1.bias"),
            hb + "mlp.fc2.weight": get(b + "mlp.fc2.weight"),
            hb + "mlp.fc2.bias": get(b + "mlp.fc2.bias"),
        })
    ret = model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, strict=False
    )
    # missing keys are expected (mask_token / dead final block on converted-
    # back fixtures); unexpected keys mean THIS mapping drifted from HF
    assert not ret.unexpected_keys, ret.unexpected_keys
    return model


def build_hf_llama(state: Dict[str, np.ndarray], cfg: LlamaConfig):
    """torch LlamaForCausalLM straight from the checkpoint's
    language_model.* names (they ARE HF Llama names modulo the prefix)."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size, num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads, num_key_value_heads=cfg.num_kv_heads,
        max_position_embeddings=cfg.max_seq_len, rms_norm_eps=cfg.rms_eps,
        rope_theta=cfg.rope_theta, attn_implementation="eager",
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {
        k[len("language_model."):]: torch.from_numpy(_np32(v))
        for k, v in state.items()
        if k.startswith("language_model.")
    }
    model.load_state_dict(sd, strict=False)
    return model


def _torch_projector(state: Dict[str, np.ndarray], features):
    """The fused 3-layer (or single-tower 2-layer) projector in plain torch
    (modeling_prismatic.py:127-156), straight from checkpoint tensors."""
    import torch
    import torch.nn.functional as F

    x = F.linear(features, _torch32(state["projector.fc1.weight"]),
                 _torch32(state["projector.fc1.bias"]))
    x = F.gelu(x)
    x = F.linear(x, _torch32(state["projector.fc2.weight"]),
                 _torch32(state["projector.fc2.bias"]))
    if "projector.fc3.weight" not in state:
        return x
    x = F.gelu(x)
    return F.linear(x, _torch32(state["projector.fc3.weight"]),
                    _torch32(state["projector.fc3.bias"]))


def _diff(got: np.ndarray, want: np.ndarray) -> Dict[str, float]:
    got, want = _np32(got), _np32(want)
    abs_diff = np.abs(got - want)
    denom = np.maximum(np.abs(want), 1e-3)
    return {
        "max_abs": float(abs_diff.max()),
        "max_rel": float((abs_diff / denom).max()),
        "mean_abs": float(abs_diff.mean()),
        "ref_scale": float(np.abs(want).mean()),
    }


def parity_report(
    state: Dict[str, np.ndarray],
    cfg: VLAConfig,
    params: Optional[Dict] = None,
    modules: Sequence[str] = ("dino", "siglip", "projector", "llm", "full"),
    batch: int = 2,
    seq: int = 24,
    seed: int = 0,
    rel_tol: float = 2e-2,
) -> Dict[str, Dict]:
    """Per-module activation parity of our converted pytree vs torch modules
    built independently from the raw checkpoint. Both sides run fp32 on CPU
    (TPU fp32 matmuls silently run bf16 — CLAUDE.md gotcha), so residual
    diffs reflect conversion errors, not hardware precision.

    Returns {module: {max_abs, max_rel, mean_abs, ref_scale, ok}}. `rel_tol`
    gates max_rel (relative to a 1e-3-floored reference magnitude): fp32
    re-execution of a bf16 checkpoint agrees to ~1e-6; anything near 1 means
    a wrong tensor, transpose, or tap point.
    """
    import jax
    import jax.numpy as jnp
    import torch

    from .convert import convert_state_dict
    from .llama import embed_tokens, llama_apply
    from .vit import vit_features
    from .vlm import projector_apply, vla_forward

    if params is None:
        params = convert_state_dict(state, cfg)
    params32 = jax.tree.map(lambda x: jnp.asarray(_np32(x)), params)
    rng = np.random.default_rng(seed)
    out: Dict[str, Dict] = {}

    def record(name: str, got, want):
        d = _diff(np.asarray(got), want)
        d["ok"] = d["max_rel"] <= rel_tol
        out[name] = d

    pixels = rng.standard_normal(
        (batch, 2, cfg.dino.image_size, cfg.dino.image_size, 3)
    ).astype(np.float32)

    hf_dino = hf_sig = None
    if "dino" in modules or "full" in modules:
        hf_dino = tower_builder(cfg.dino)(state, cfg.dino)
    if cfg.siglip is not None and ("siglip" in modules or "full" in modules):
        hf_sig = build_hf_siglip(state, cfg.siglip)

    def torch_tower_features(model, images_nhwc, depth, n_prefix):
        with torch.no_grad():
            hf = model(
                torch.from_numpy(images_nhwc.transpose(0, 3, 1, 2)),
                output_hidden_states=True,
            )
        # hidden_states[k] = after block k-1 -> second-to-last tap = [depth-1]
        return hf.hidden_states[depth - 1].numpy()[:, n_prefix:]

    if "dino" in modules:
        want = torch_tower_features(
            hf_dino, pixels[:, 0], cfg.dino.depth, cfg.dino.num_prefix_tokens
        )
        record("dino", vit_features(params32["vision"]["dino"], cfg.dino,
                                    jnp.asarray(pixels[:, 0])), want)
    if cfg.siglip is not None and "siglip" in modules:
        want = torch_tower_features(hf_sig, pixels[:, 1], cfg.siglip.depth, 0)
        record("siglip", vit_features(params32["vision"]["siglip"], cfg.siglip,
                                      jnp.asarray(pixels[:, 1])), want)
    if "projector" in modules:
        feats = rng.standard_normal((batch, 7, cfg.vision_dim)).astype(np.float32)
        with torch.no_grad():
            want = _torch_projector(state, torch.from_numpy(feats)).numpy()
        record("projector", projector_apply(params32["projector"], jnp.asarray(feats)), want)

    hf_llama = None
    if "llm" in modules or "full" in modules:
        hf_llama = build_hf_llama(state, cfg.llm)
    ids = rng.integers(5, 31000, size=(batch, seq))
    mask = np.ones((batch, seq), np.int32)
    mask[-1, seq - 5 :] = 0
    if "llm" in modules:
        with torch.no_grad():
            want = hf_llama(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            ).logits.numpy()
        emb = embed_tokens(params32["llm"], jnp.asarray(ids))
        got = llama_apply(params32["llm"], cfg.llm, emb,
                          attention_mask=jnp.asarray(mask))
        # compare only valid (unmasked) positions: padded rows are arbitrary
        valid = mask.astype(bool)
        record("llm", np.asarray(got)[valid], want[valid])

    if "full" in modules:
        # end-to-end multimodal forward vs the reference composition
        # (modeling_prismatic.py:362-415): towers -> channel-concat ->
        # projector -> insert after BOS -> decoder logits on the text tail
        with torch.no_grad():
            dino_f = torch_tower_features(
                hf_dino, pixels[:, 0], cfg.dino.depth, cfg.dino.num_prefix_tokens
            )
            feats = dino_f
            if cfg.siglip is not None:
                sig_f = torch_tower_features(hf_sig, pixels[:, 1], cfg.siglip.depth, 0)
                feats = np.concatenate([dino_f, sig_f], axis=-1)
            proj = _torch_projector(state, torch.from_numpy(feats))
            t_ids = torch.from_numpy(ids)
            emb = hf_llama.get_input_embeddings()(t_ids)
            mm_emb = torch.cat([emb[:, :1], proj, emb[:, 1:]], dim=1)
            n_patch = proj.shape[1]
            mm_mask = torch.cat(
                [torch.from_numpy(mask[:, :1]),
                 torch.ones((batch, n_patch), dtype=torch.int32),
                 torch.from_numpy(mask[:, 1:])], dim=1)
            want_full = hf_llama(
                inputs_embeds=mm_emb, attention_mask=mm_mask
            ).logits.numpy()[:, n_patch:]
        got_full = vla_forward(
            params32, cfg, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(pixels)
        ).logits
        valid = mask.astype(bool)
        record("full", np.asarray(got_full)[valid], want_full[valid])
    return out


# -------------------------------------------------------------------- smoke --

def tma_smoke(
    params,
    cfg: VLAConfig,
    iters: int = 20,
    batch_size: int = 2,
    patch_hw: Tuple[int, int] = (50, 50),
    lr: float = 5e-2,
    pad_to: int = 32,
    seed: int = 0,
) -> Dict:
    """Short TMA run on synthetic frames against the loaded weights: the
    target-CE loss must descend and a patch must materialize — the end-to-end
    differentiability check (reference behavior: TMA.py:82-199's loss curve).
    Returns {losses, decreased, patch [H,W,3] float32 in [0,1]} — the HWC
    storage layout attacks/artifacts.save_checkpoint consumes (it writes the
    reference-compatible [3,H,W] patch.pt itself)."""
    import jax
    import jax.numpy as jnp

    from ..attacks import AttackSpec, init_attack_state, make_attack_step
    from ..data import batch_iterator, dummy_frame_iterator
    from ..utils import WordStubTokenizer, build_tma_target_tokens

    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = build_tma_target_tokens(np.zeros(7), maskidx)
    step = make_attack_step(
        AttackSpec(objective="tma", geometry=True, inner_loop=1), cfg, target, maskidx
    )
    state = init_attack_state(jax.random.key(seed), patch_hw)
    frames = dummy_frame_iterator(
        WordStubTokenizer(), image_size=cfg.dino.image_size, seed=seed
    )
    batches = batch_iterator(frames, batch_size, pad_to=pad_to)
    batch = jax.tree.map(jnp.asarray, next(batches))
    losses: List[float] = []
    for i in range(iters):
        state, metrics = step(
            params, state, batch, jnp.float32(lr), jnp.bool_(True),
            jax.random.key(seed * 7919 + i),
        )
        losses.append(float(np.asarray(metrics["loss"])[-1]))
    k = max(min(5, iters // 2), 1)
    decreased = float(np.mean(losses[-k:])) < float(np.mean(losses[:k]))
    patch = np.asarray(jax.device_get(state.patch), np.float32)
    return {"losses": losses, "decreased": decreased, "patch": patch}


# shared int4 group-size policy now lives with the quantizer; re-exported
# here for its established importers (bench_decode, tests)
from .quant import int4_group_size_for  # noqa: E402,F401


def parse_quant_mode(
    mode: str,
) -> Tuple[Optional[str], Optional[str], Optional[int], bool]:
    """'<int8|w8a8|int4|none>[+kv8|kv4][+vt<k>][+qk]' (or a bare 'kv8'/
    'kv4'/'vt<k>' for a single-lever config) -> (weights_mode | None,
    kv_cache | None, visual_tokens | None, int4_kernel: bool). 'w8a8' =
    int8 weights + dynamic int8 prefill activations (models/decode.py
    act_quant); '+qk' routes the decode tail through the fused Pallas int4
    dequant-matmul kernel (ops/q4_matmul.py — int4 weights only), so its
    agreement leg validates the kernel's numerics on the weights production
    will serve. Raises ValueError on anything else — callers validate the
    full mode list BEFORE running expensive legs."""
    from ..utils.quant_args import parse_suffixes

    parts = mode.split("+")
    weights, suffixes = parts[0], parts[1:]
    if weights in ("kv8", "kv4") or (
        weights.startswith("vt") and weights[2:].isdigit()
    ):  # bare single-lever config
        suffixes = [weights] + suffixes
        weights = "none"
    if weights not in ("int8", "w8a8", "int4", "none"):
        raise ValueError(
            f"quant mode {mode!r}: weights must be int8, w8a8, int4, or "
            f"none (for a kv/vt-only config), got {weights!r}"
        )
    kv_cache, visual_tokens, _, _, qk = parse_suffixes(
        suffixes, context=f"quant mode {mode!r}: ", kernel=True
    )
    if qk and weights != "int4":
        raise ValueError(
            f"quant mode {mode!r}: +qk requires int4 weights (the kernel "
            f"contracts the packed-s4 layout)"
        )
    return (None if weights == "none" else weights), kv_cache, visual_tokens, qk


def quant_decode_report(
    params,
    cfg: VLAConfig,
    modes: Sequence[str] = ("int8", "w8a8", "int4", "int8+kv8", "int4+kv4"),
    batch_size: int = 2,
    n_batches: int = 2,
    prompt_pad: int = 32,
    seed: int = 0,
    min_agreement: float = 0.9,
    gate_modes: Sequence[str] = ("int8",),
    tp: int = 1,
) -> Dict:
    """Quantized-serving acceptance: greedy-decode token agreement of each
    quantized configuration against the full-precision decode on the SAME
    synthetic frames/prompts (NEXT.md: "int8 accuracy on REAL released
    weights should be validated with the acceptance gate before production
    use"). Mode strings: 'int8' | 'w8a8' (int8 weights + dynamic int8
    prefill activations — its agreement number IS the w8a8 accuracy A/B) |
    'int4' (group size auto via
    int4_group_size_for) | either + '+kv8' (int8 KV cache) or '+kv4'
    (packed-s4 cache) | '+vt<k>' (visual-token pruning — the LOSSY lever
    whose real-weights A/B this leg IS; e.g. 'int8+vt128') | bare
    'kv8'/'kv4'/'vt<k>' for a single-lever configuration. vt modes are not
    in the defaults because k must not exceed the model's patch count.

    `params` is the STORAGE-layout pytree (convert_state_dict output, host
    numpy preferred). Reference and quantized programs run SEQUENTIALLY and
    device arrays are dropped between runs, so peak accelerator memory is one
    configuration's weights — the 7B fits this leg on one 15.75 GB chip.

    Gate: `ok` per mode = all-token agreement >= min_agreement, applied only
    to `gate_modes` (int8 weight-only is near-lossless on real LLM weights;
    int4/kv8 entries are reported for the user's own A/B call). Random
    tiny-model weights produce near-uniform logits where rounding flips
    argmaxes — offline tests pin structure and gate logic, not agreement.

    `tp`: the DEPLOYMENT tensor-parallel degree (cli --quant-tp). int4's
    auto group size is tp-dependent (int4_group_size_for: 7B tp=4 serves
    gs=64, not the tp=1 gs=128) — the gate must agreement-test the
    quantization production will actually serve, so pass the tp you will
    deploy with. The decode itself still runs single-device here (TP is
    bit-identical to single-device by construction, pinned in
    tests/test_decode_quant.py — only the GROUP SIZE changes the numbers).
    """
    import gc

    import jax
    import jax.numpy as jnp

    from ..data import batch_iterator, dummy_frame_iterator
    from ..utils import WordStubTokenizer
    from ..utils.normalization import dual_normalize
    from .decode import decode_layout_params, greedy_decode_actions
    from .quant import quantize_decode_params

    host = jax.device_get(params)
    cooked = decode_layout_params(host, xp=np)

    frames = dummy_frame_iterator(
        WordStubTokenizer(), image_size=cfg.dino.image_size, seed=seed
    )
    inputs = []
    for b in batch_iterator(frames, batch_size, pad_to=prompt_pad):
        px = dual_normalize(jnp.asarray(b.images, jnp.float32))
        inputs.append((
            jnp.asarray(b.input_ids), jnp.asarray(b.attention_mask),
            px.astype(jnp.dtype(cfg.dtype)),
        ))
        if len(inputs) == n_batches:
            break

    def run(pytree, kv_cache, visual_tokens=None, act_quant=None,
            int4_kernel=False):
        dev = jax.tree.map(lambda x: jnp.asarray(x), pytree)
        fn = jax.jit(
            lambda p, i, m, x: greedy_decode_actions(
                p, cfg, i, m, x, cooked_weights=True, kv_cache=kv_cache,
                visual_tokens=visual_tokens, act_quant=act_quant,
                int4_kernel=int4_kernel,
            )
        )
        toks, acts = [], []
        for ids, mask, px in inputs:
            r = fn(dev, ids, mask, px)
            toks.append(np.asarray(jax.device_get(r.tokens)))
            acts.append(np.asarray(jax.device_get(r.actions)))
        del dev, fn
        gc.collect()
        return np.concatenate(toks), np.concatenate(acts)

    parsed = [(m, parse_quant_mode(m)) for m in modes]  # validate ALL first
    ref_tokens, ref_actions = run(cooked, None)
    report: Dict = {}
    for mode, (wq, kv_cache, visual_tokens, qk) in parsed:
        from ..utils.quant_args import resolve_quantize

        wq, act, _ = resolve_quantize(wq)
        gs = int4_group_size_for(cfg, tp=tp)
        qp = (quantize_decode_params(cooked, xp=np, mode=wq, group_size=gs)
              if wq is not None else cooked)
        tokens, actions = run(qp, kv_cache, visual_tokens, act, qk)
        del qp
        gc.collect()
        agree = float(np.mean(tokens == ref_tokens))
        entry = {
            "token_agreement": round(agree, 4),
            "first_token_agreement": round(
                float(np.mean(tokens[:, 0] == ref_tokens[:, 0])), 4
            ),
            "max_abs_action_delta": round(
                float(np.max(np.abs(actions - ref_actions))), 6
            ),
            "n_tokens": int(ref_tokens.size),
        }
        if mode in gate_modes:
            entry["ok"] = agree >= min_agreement
        report[mode] = entry
    return report
