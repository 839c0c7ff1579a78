"""Vision Transformer (DINOv2-reg / SigLIP variants), pure-JAX, TPU-first.

Behavioral contract (vs /root/reference/prismatic/extern/hf/modeling_prismatic.py:63-123):
  - features are the *second-to-last* block's output, patch tokens only,
    WITHOUT the final norm (timm `get_intermediate_layers(n={depth-2})`,
    norm=False, prefix tokens stripped);
  - DINOv2-reg: pos-embed on patch tokens only, then prepend [cls, reg x4]
    (timm `no_embed_class=True`); LayerScale after attn and mlp;
  - SigLIP: no prefix tokens, pos-embed on all patches, no LayerScale.

TPU-first choices:
  - the 14x14/stride-14 patch embed is a reshape + one [B*256, 588]x[588, D]
    matmul (non-overlapping conv == block reshape), which lands directly on
    the MXU with no conv lowering;
  - all blocks are stacked into leading-axis arrays and iterated with
    `lax.scan` -> one compiled block body regardless of depth;
  - LayerNorm/softmax in fp32, matmuls in param dtype (bf16 on TPU).

Params pytree (per backbone):
  patch_embed: {kernel [P*P*3, D], bias [D] (absent on pre-norm towers)}
  pos_embed:   [num_patches, D] (embed_class checkpoints fold the cls row
               into cls_token at conversion)
  cls_token / reg_tokens / norm_pre {scale, bias} (optional)
  blocks: dict of stacked arrays, leading dim = depth:
    ln1_scale, ln1_bias, qkv_w [L, D, 3D], qkv_b, proj_w, proj_b,
    ls1 (opt), ln2_scale, ln2_bias, fc1_w, fc1_b, fc2_w, fc2_b, ls2 (opt)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.attention import mha
from .config import ViTConfig


def layer_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B, (H//P)*(W//P), P*P*C] in (ph, pw, c) order — matches a
    torch Conv2d weight [D, C, kh, kw] permuted to [kh, kw, C, D] and flattened.
    Non-multiple H/W are floor-cropped, matching a stride-P conv (384 @ 14
    reads pixels 0..377 only)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    if (gh * patch, gw * patch) != (h, w):
        images = images[:, : gh * patch, : gw * patch, :]
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, c]
    return x.reshape(b, gh * gw, patch * patch * c)


def _block(cfg: ViTConfig, x: jnp.ndarray, p: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """One pre-norm transformer block (timm Block semantics)."""
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim

    y = layer_norm(x, p["ln1_scale"], p["ln1_bias"], cfg.ln_eps)
    qkv = y @ p["qkv_w"] + p["qkv_b"]
    qkv = qkv.reshape(b, s, 3, h, hd).transpose(2, 0, 3, 1, 4)  # [3, B, H, S, hd]
    attn = mha(qkv[0], qkv[1], qkv[2])
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    attn = attn @ p["proj_w"] + p["proj_b"]
    if cfg.use_layerscale:
        attn = attn * p["ls1"]
    x = x + attn

    y = layer_norm(x, p["ln2_scale"], p["ln2_bias"], cfg.ln_eps)
    y = y @ p["fc1_w"] + p["fc1_b"]
    yf = y.astype(jnp.float32)
    if cfg.use_quick_gelu:
        # OpenAI CLIP's quick-GELU x*sigmoid(1.702x) (clip_vit.py:16-27)
        yf = yf * jax.nn.sigmoid(1.702 * yf)
    else:
        yf = jax.nn.gelu(yf, approximate=False)
    y = yf.astype(x.dtype)
    y = y @ p["fc2_w"] + p["fc2_b"]
    if cfg.use_layerscale:
        y = y * p["ls2"]
    return x + y


def vit_features(
    params: Dict, cfg: ViTConfig, images: jnp.ndarray, remat: bool = False
) -> jnp.ndarray:
    """images: [B, H, W, 3] (already normalized) -> [B, num_patches, D] patch
    features from the second-to-last block (no final norm, prefix stripped).

    `remat=True` checkpoints each block inside the scan so the backward pass
    recomputes activations instead of saving a [depth, ...] stack of fp32
    residuals — mandatory for the 7B stack to fit 16 GB HBM."""
    dtype = params["patch_embed"]["kernel"].dtype
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ params["patch_embed"]["kernel"]
    if "bias" in params["patch_embed"]:  # absent on pre-norm (CLIP) towers
        x = x + params["patch_embed"]["bias"]

    # position embedding on patch tokens (no_embed_class semantics)
    x = x + params["pos_embed"].astype(dtype)

    # prepend prefix tokens (cls + registers), without position embedding
    prefix = []
    if cfg.use_cls_token:
        prefix.append(jnp.broadcast_to(params["cls_token"].astype(dtype), (x.shape[0], 1, cfg.embed_dim)))
    if cfg.num_reg_tokens:
        prefix.append(
            jnp.broadcast_to(
                params["reg_tokens"].astype(dtype), (x.shape[0], cfg.num_reg_tokens, cfg.embed_dim)
            )
        )
    if prefix:
        x = jnp.concatenate(prefix + [x], axis=1)

    if cfg.pre_norm:
        # CLIP's ln_pre (timm norm_pre), applied after prefix/pos insertion
        x = layer_norm(x, params["norm_pre"]["scale"], params["norm_pre"]["bias"], cfg.ln_eps)

    # Blocks 0..depth-2 run (the tap point); the final block and final norm of
    # the timm checkpoint are dead in every OpenVLA path, so params['blocks']
    # stacks only `tap_layer` blocks — no dead weights in HBM, and no sliced
    # weight copies inside the compiled step.
    block = _block
    if remat:
        block = jax.checkpoint(block, static_argnums=(0,))

    def body(carry, layer_params):
        return block(cfg, carry, layer_params), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    # strip prefix tokens -> patch features only
    return x[:, cfg.num_prefix_tokens :, :]


def init_vit_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Dict:
    """Random init (attack framework never trains the ViT; init is for tests
    and for shaping the converter target)."""
    k = jax.random.split(rng, 8)
    d, depth, mlp = cfg.embed_dim, cfg.tap_layer, cfg.mlp_hidden
    pdim = cfg.patch_size * cfg.patch_size * 3

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    patch_embed = {"kernel": normal(k[0], (pdim, d))}
    if not cfg.pre_norm:  # timm PatchEmbed bias = not pre_norm
        patch_embed["bias"] = jnp.zeros((d,), dtype)
    params = {
        "patch_embed": patch_embed,
        "pos_embed": normal(k[1], (cfg.num_patches, d)),
        "blocks": {
            "ln1_scale": jnp.ones((depth, d), dtype),
            "ln1_bias": jnp.zeros((depth, d), dtype),
            "qkv_w": normal(k[2], (depth, d, 3 * d)),
            "qkv_b": jnp.zeros((depth, 3 * d), dtype),
            "proj_w": normal(k[3], (depth, d, d)),
            "proj_b": jnp.zeros((depth, d), dtype),
            "ln2_scale": jnp.ones((depth, d), dtype),
            "ln2_bias": jnp.zeros((depth, d), dtype),
            "fc1_w": normal(k[4], (depth, d, mlp)),
            "fc1_b": jnp.zeros((depth, mlp), dtype),
            "fc2_w": normal(k[5], (depth, mlp, d)),
            "fc2_b": jnp.zeros((depth, d), dtype),
        },
    }
    if cfg.use_layerscale:
        params["blocks"]["ls1"] = jnp.full((depth, d), 1e-5, dtype)
        params["blocks"]["ls2"] = jnp.full((depth, d), 1e-5, dtype)
    if cfg.use_cls_token:
        params["cls_token"] = normal(k[6], (1, d))
    if cfg.num_reg_tokens:
        params["reg_tokens"] = normal(k[7], (cfg.num_reg_tokens, d))
    if cfg.pre_norm:
        params["norm_pre"] = {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}
    return params
