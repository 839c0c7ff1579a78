"""Model configuration dataclasses + named registry.

Mirrors the *shape* information of the reference configs
(/root/reference/prismatic/extern/hf/configuration_prismatic.py:15-140) while
being framework-native: frozen (hashable) dataclasses usable as jit static
arguments.

The flagship `openvla-7b` config is the dinosiglip-224px + Llama-2-7B stack:
  - DINOv2 ViT-L/14 reg4 (timm `vit_large_patch14_reg4_dinov2.lvd142m`)
  - SigLIP ViT-so400m/14 (timm `vit_so400m_patch14_siglip_224`)
  - Llama-2-7B w/ 32064-row padded embedding (vocab 32000 + pad to mult. 64)
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int
    depth: int
    num_heads: int
    mlp_hidden: int
    patch_size: int = 14
    image_size: int = 224
    num_reg_tokens: int = 0
    use_cls_token: bool = False
    use_layerscale: bool = False
    # DINOv2-reg models add pos-embed to patch tokens only, then prepend
    # cls/reg tokens (timm `no_embed_class=True`); SigLIP has no prefix tokens.
    # Models with embed_class layouts (CLIP, IN1K) fold the cls-position row
    # into the cls token at conversion time, so runtime is layout-free.
    ln_eps: float = 1e-6
    # CLIP towers (timm pre_norm=True): LayerNorm after pos-embed/prefix
    # insertion, and NO patch-embed bias (timm `bias=not pre_norm`).
    pre_norm: bool = False
    # OpenAI CLIP checkpoints were trained with the quick-GELU approximation
    # x*sigmoid(1.702x) (clip_vit.py:16-21 `override_act_layer="quick_gelu"`).
    use_quick_gelu: bool = False

    @property
    def num_patches(self) -> int:
        # floor semantics: a stride-P conv on a non-multiple image (e.g.
        # 384 @ patch 14 -> 27x27) drops the trailing H%P rows/cols, exactly
        # like timm's PatchEmbed at img_size overrides (base_vision.py:111)
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.use_cls_token else 0) + self.num_reg_tokens

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def tap_layer(self) -> int:
        """Blocks applied before the feature tap: the reference taps the
        *second-to-last* block's output (modeling_prismatic.py:85-87), i.e.
        runs blocks [0, depth-2)... inclusive of index depth-2."""
        return self.depth - 1  # number of blocks run = depth-1 (skip last)


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 32064
    hidden_size: int = 4096
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    intermediate_size: int = 11008
    rope_theta: float = 10000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 2048
    # attention implementation: 'flash' = Pallas head-resident kernel,
    # 'chunked' = XLA query-chunked (memory-capped), 'xla' = single-shot XLA
    attn_impl: str = "chunked"
    # query-chunk size for attn_impl='chunked'
    attn_chunk: int | None = 64
    # two-level remat: scan groups of this many blocks, checkpointing the
    # group AND each block — cuts saved carries from num_layers to
    # num_layers/group at ~one extra fwd of recompute. 1 = plain per-block.
    # MEASURED SLOWER on the 7B (see BASELINE.md negative-result note).
    remat_group: int = 1
    # lax.scan unroll factor for the block loop: >1 lets XLA software-pipeline
    # the next layer's weight loads against the current layer's compute
    # without regrouping the stacked weights. MEASURED on the 7B attack step:
    # unroll=2 -> 1.166 inner/s vs 1.244 at unroll=1 (XLA already overlaps
    # the scan's weight prefetch; unrolling only grows the program). Keep 1.
    scan_unroll: int = 1

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


@dataclass(frozen=True)
class PhiConfig:
    """Phi-2 decoder dims (microsoft/phi-2; reference backbone
    prismatic/models/backbones/llm/phi.py). Structurally distinct from Llama:
    LayerNorm with bias, parallel attn+MLP residual, partial rotary (40% of
    head_dim), biased projections, gelu_new MLP, biased lm_head."""
    vocab_size: int = 51200
    hidden_size: int = 2560
    num_layers: int = 32
    num_heads: int = 32
    intermediate_size: int = 10240
    partial_rotary_factor: float = 0.4
    rope_theta: float = 10000.0
    ln_eps: float = 1e-5
    max_seq_len: int = 2048
    attn_impl: str = "chunked"
    attn_chunk: Optional[int] = 64

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def rotary_dim(self) -> int:
        return int(self.head_dim * self.partial_rotary_factor)

    @property
    def num_kv_heads(self) -> int:
        return self.num_heads  # Phi-2 has no GQA


@dataclass(frozen=True)
class VLAConfig:
    name: str
    dino: ViTConfig
    siglip: Optional[ViTConfig]
    llm: "LlamaConfig | PhiConfig"
    pad_token_id: int = 32000
    pad_to_multiple_of: int = 64
    n_action_bins: int = 256
    dtype: str = "bfloat16"
    # activation rematerialization over LLM blocks (HBM vs FLOPs tradeoff)
    remat: bool = True

    @property
    def use_fused_vision_backbone(self) -> bool:
        return self.siglip is not None

    @property
    def vision_dim(self) -> int:
        return self.dino.embed_dim + (self.siglip.embed_dim if self.siglip else 0)

    @property
    def num_patches(self) -> int:
        return self.dino.num_patches

    @property
    def action_vocab_size(self) -> int:
        """De-tokenization vocab: padded vocab minus the pad-to-multiple rows
        (modeling_prismatic.py:504)."""
        return self.llm.vocab_size - self.pad_to_multiple_of


DINOV2_VIT_L = ViTConfig(
    embed_dim=1024, depth=24, num_heads=16, mlp_hidden=4096,
    num_reg_tokens=4, use_cls_token=True, use_layerscale=True,
)
SIGLIP_SO400M = ViTConfig(
    embed_dim=1152, depth=27, num_heads=16, mlp_hidden=4304,
)
# Prismatic-zoo towers beyond the OpenVLA pair (conf/models.py ablations;
# vision registry at models/materialize.py:29-51). Non-224 resolutions get
# their position embeddings resampled at conversion time (models/convert.py).
CLIP_VIT_L = ViTConfig(  # timm vit_large_patch14_clip_224.openai
    embed_dim=1024, depth=24, num_heads=16, mlp_hidden=4096,
    use_cls_token=True, pre_norm=True, use_quick_gelu=True, ln_eps=1e-5,
)
CLIP_VIT_L_336 = dataclasses.replace(CLIP_VIT_L, image_size=336)
SIGLIP_SO400M_384 = dataclasses.replace(SIGLIP_SO400M, image_size=384)  # 27x27 grid
IN1K_VIT_L = ViTConfig(  # timm vit_large_patch16_224.augreg_in21k_ft_in1k
    embed_dim=1024, depth=24, num_heads=16, mlp_hidden=4096,
    patch_size=16, use_cls_token=True,
)
DINOV2_VIT_L_336 = dataclasses.replace(DINOV2_VIT_L, image_size=336)
DINOV2_VIT_L_384 = dataclasses.replace(DINOV2_VIT_L, image_size=384)  # 27x27, crops to 378
# flash = Pallas head-resident attention (ops/flash_attention.py): measured
# ~4% faster end-to-end than the chunked-XLA path on the 7B attack step.
# Partitions under data x model meshes via custom_partitioning on
# (batch, head) — no collectives, kernel runs on local blocks.
LLAMA2_7B = LlamaConfig(attn_impl="flash")
# Llama-2-13B dims (prismatic 13B zoo variants; conf/models.py llama2+13b etc.)
LLAMA2_13B = LlamaConfig(
    hidden_size=5120, num_layers=40, num_heads=40, num_kv_heads=40,
    intermediate_size=13824, attn_impl="flash",
)
# Mistral-v0.1-7B dims (GQA 8 kv heads; sliding window 4096 never binds at the
# ~300-token OpenVLA sequence length, so plain causal attention is exact here)
MISTRAL_7B = LlamaConfig(
    vocab_size=32064, intermediate_size=14336, num_kv_heads=8, attn_impl="chunked",
)
PHI_2 = PhiConfig()

OPENVLA_7B = VLAConfig(name="openvla-7b", dino=DINOV2_VIT_L, siglip=SIGLIP_SO400M, llm=LLAMA2_7B)

# Tiny config for tests: same structural quirks (fused backbone, reg tokens,
# layerscale, padded vocab) at toy scale. fp32 so parity vs torch is exact-ish.
TINY_DINO = ViTConfig(
    embed_dim=32, depth=3, num_heads=2, mlp_hidden=64, patch_size=14,
    image_size=56, num_reg_tokens=4, use_cls_token=True, use_layerscale=True,
)
TINY_SIGLIP = ViTConfig(
    embed_dim=48, depth=4, num_heads=2, mlp_hidden=96, patch_size=14, image_size=56,
)
TINY_LLAMA = LlamaConfig(
    vocab_size=32064, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=4,
    intermediate_size=128, max_seq_len=512,
)
VLA_TINY = VLAConfig(
    name="vla-tiny", dino=TINY_DINO, siglip=TINY_SIGLIP, llm=TINY_LLAMA,
    dtype="float32", remat=False,
)

# LIBERO finetunes share the 7B architecture; they differ only in weights +
# norm_stats (TMA_wrapper.py:30-41 maps dataset -> checkpoint id).
REGISTRY = {
    "openvla-7b": OPENVLA_7B,
    "openvla-7b-finetuned-libero-spatial": OPENVLA_7B,
    "openvla-7b-finetuned-libero-object": OPENVLA_7B,
    "openvla-7b-finetuned-libero-goal": OPENVLA_7B,
    "openvla-7b-finetuned-libero-10": OPENVLA_7B,
    "vla-tiny": VLA_TINY,
}


def get_config(name: str) -> VLAConfig:
    if name not in REGISTRY:
        raise KeyError(f"unknown model config '{name}'; available: {sorted(REGISTRY)}")
    return REGISTRY[name]
