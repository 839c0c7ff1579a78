"""Prismatic/OpenVLA multimodal forward: fused dual-ViT -> MLP projector ->
Llama with patch embeddings inserted after BOS.

Behavioral contract (vs /root/reference/prismatic/extern/hf/modeling_prismatic.py):
  - fused backbone: channel-split -> per-backbone features -> feature concat
    on the embedding dim (:114-123); here the split is the leading stack axis
    of our [B, 2, H, W, 3] pixel layout instead of 6 NCHW channels;
  - projector: fc1 -> GELU -> fc2 -> GELU -> fc3 (fused variant, :138-156);
  - embeddings: cat([emb[:, :1], patches, emb[:, 1:]]) (:383-385), patch
    labels IGNORE (:395-401), attention over patches always on (:371-377);
  - loss: HF-internal shifted CE over the extended label row.

Everything is a pure function of (params, config, arrays): jit/grad/shard-ready.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .config import PhiConfig, VLAConfig
from .llama import cross_entropy_loss, embed_tokens, init_llama_params, llama_apply
from .vit import init_vit_params, vit_features


def decoder_apply_fn(cfg: VLAConfig):
    """The decoder forward for this config: Llama-family by default, Phi-2
    for the one zoo entry that isn't Llama-shaped (phi-2+3b)."""
    if isinstance(cfg.llm, PhiConfig):
        from .phi import phi_apply

        return phi_apply
    return llama_apply


class VLAOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    # TEXT-REGION logits [B, S, V] fp32: position j holds the logits of
    # extended position num_patches + j (predicting text token j + 1). The 256
    # image-patch positions' logits are never read by any consumer (labels
    # there are IGNORE; the attacks slice logits[:, P:-1], TMA.py:151), so we
    # don't compute them — ~5x less lm_head work than the reference.
    logits: jnp.ndarray


def projector_apply(params: Dict, features: jnp.ndarray) -> jnp.ndarray:
    """Fused (3-layer fc1/fc2/fc3) or single-tower (2-layer fc1/fc2) MLP —
    the two PrismaticProjector arities (modeling_prismatic.py:127-156). The
    arity is read off the params pytree, which is static under jit."""
    x = features @ params["fc1_w"] + params["fc1_b"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(features.dtype)
    x = x @ params["fc2_w"] + params["fc2_b"]
    if "fc3_w" not in params:
        return x
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(features.dtype)
    return x @ params["fc3_w"] + params["fc3_b"]


def vision_features(params: Dict, cfg: VLAConfig, pixel_values: jnp.ndarray) -> jnp.ndarray:
    """pixel_values: [B, 2, H, W, 3] (DINO-normed, SigLIP-normed) ->
    [B, num_patches, dino_dim + siglip_dim]."""
    dino = vit_features(params["dino"], cfg.dino, pixel_values[:, 0], remat=cfg.remat)
    if cfg.siglip is None:
        return dino
    sig = vit_features(params["siglip"], cfg.siglip, pixel_values[:, 1], remat=cfg.remat)
    return jnp.concatenate([dino, sig], axis=-1)


def vla_forward(
    params: Dict,
    cfg: VLAConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray],
    labels: Optional[jnp.ndarray] = None,
) -> VLAOutput:
    """The multimodal training/attack forward (modeling_prismatic.py:362-415).

    `pixel_values=None` selects the unimodal (language-only) branch
    (modeling_prismatic.py:344-359): plain decoder forward over input_ids,
    full-row logits, same shifted CE."""
    apply_fn = decoder_apply_fn(cfg)
    if pixel_values is None:
        emb = embed_tokens(params["llm"], input_ids)
        logits = apply_fn(
            params["llm"], cfg.llm, emb, attention_mask=attention_mask, remat=cfg.remat
        )
        loss = cross_entropy_loss(logits, labels) if labels is not None else None
        return VLAOutput(loss=loss, logits=logits)

    def encode(vision_params, projector_params, pixels):
        patches = vision_features(vision_params, cfg, pixels)
        return projector_apply(projector_params, patches)

    if cfg.remat:
        # Outer checkpoint over the whole vision tower: saves only the pixel
        # stack (~5 MB bf16 at bs8) + projected patches instead of ~220 MB of
        # per-block ViT carries that would otherwise stay live through the
        # entire LLM backward. Costs one extra ViT forward (~1% of step
        # FLOPs); the per-block remat inside vit_features still bounds the
        # ViT backward's own peak.
        encode = jax.checkpoint(encode)
    projected = encode(params["vision"], params["projector"], pixel_values)  # [B, P, D]

    emb = embed_tokens(params["llm"], input_ids)
    mm_emb = jnp.concatenate([emb[:, :1], projected.astype(emb.dtype), emb[:, 1:]], axis=1)

    ones = jnp.ones(projected.shape[:2], dtype=attention_mask.dtype)
    mm_mask = jnp.concatenate([attention_mask[:, :1], ones, attention_mask[:, 1:]], axis=1)

    text_len = input_ids.shape[1]
    logits = apply_fn(
        params["llm"], cfg.llm, mm_emb, attention_mask=mm_mask, remat=cfg.remat,
        logits_tail=text_len,
    )

    loss = None
    if labels is not None:
        # Shifted CE over the extended row reduces to (text logits[:-1],
        # labels[1:]): every valid label lives in the text region and labels[0]
        # (BOS) is IGNORE, so the patch-region pairs contribute nothing.
        loss = cross_entropy_loss(logits, labels)
    return VLAOutput(loss=loss, logits=logits)


def action_logit_slice(logits: jnp.ndarray, cfg: VLAConfig, text_len: int) -> jnp.ndarray:
    """Positions predicting text tokens 1..S-1, aligned with labels[:, 1:]
    (the reference's `logits[:, num_patches:-1]`, TMA.py:151). With our
    text-region logits this is simply `[:, :-1]`. Returns [B, S-1, V]."""
    del cfg, text_len
    return logits[:, :-1, :]


def init_vla_params(rng: jax.Array, cfg: VLAConfig) -> Dict:
    dtype = jnp.dtype(cfg.dtype)
    k_dino, k_sig, k_proj, k_llm = jax.random.split(rng, 4)
    vision: Dict = {"dino": init_vit_params(k_dino, cfg.dino, dtype)}
    if cfg.siglip is not None:
        vision["siglip"] = init_vit_params(k_sig, cfg.siglip, dtype)

    vdim, ldim = cfg.vision_dim, cfg.llm.hidden_size
    kp = jax.random.split(k_proj, 3)

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    if cfg.use_fused_vision_backbone:
        hidden = 4 * vdim
        projector = {
            "fc1_w": normal(kp[0], (vdim, hidden)), "fc1_b": jnp.zeros((hidden,), dtype),
            "fc2_w": normal(kp[1], (hidden, ldim)), "fc2_b": jnp.zeros((ldim,), dtype),
            "fc3_w": normal(kp[2], (ldim, ldim)), "fc3_b": jnp.zeros((ldim,), dtype),
        }
    else:  # single-tower gelu-mlp: vision -> llm -> llm
        projector = {
            "fc1_w": normal(kp[0], (vdim, ldim)), "fc1_b": jnp.zeros((ldim,), dtype),
            "fc2_w": normal(kp[1], (ldim, ldim)), "fc2_b": jnp.zeros((ldim,), dtype),
        }
    if isinstance(cfg.llm, PhiConfig):
        from .phi import init_phi_params

        llm = init_phi_params(k_llm, cfg.llm, dtype)
    else:
        llm = init_llama_params(k_llm, cfg.llm, dtype)
    return {"vision": vision, "projector": projector, "llm": llm}


def param_count(params: Dict) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
