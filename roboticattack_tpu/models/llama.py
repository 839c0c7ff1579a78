"""Llama-2 decoder, pure-JAX, numerically matching HF `LlamaForCausalLM`.

Used as the frozen 7B action head of OpenVLA (the reference drives it through
`AutoModelForCausalLM`, modeling_prismatic.py:248,404-415). Weight-parity with
the HF checkpoint is the acceptance test (see tests/test_llama_parity.py).

TPU-first structure:
  - layers stacked on a leading axis + `lax.scan` -> single compiled block;
  - optional `jax.checkpoint` (remat) per block to fit 7B fwd+bwd in HBM;
  - RMSNorm / softmax / rotary phases in fp32, matmuls in bf16;
  - logits cast to fp32 (HF does `lm_head(h).float()`), CE in fp32.

Params pytree:
  embed:   [V, D]
  layers:  stacked {attn_norm, q_w, k_w, v_w, o_w, mlp_norm, gate_w, up_w, down_w}
           (all weights stored input-major: [D_in, D_out])
  norm:    [D]
  lm_head: [D, V]
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.attention import causal_bias, mha, mha_chunked, padding_bias
from ..utils.constants import IGNORE_INDEX
from .config import LlamaConfig


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return weight * normed


def rope_cos_sin(positions: jnp.ndarray, head_dim: int, theta: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """positions: [S] (or [B, S]) -> cos/sin of shape [..., S, head_dim], fp32.
    HF convention: freqs duplicated as cat(freqs, freqs) (non-interleaved)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., S, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray):
    """q/k: [B, H, S, hd]; cos/sin: [S, hd] or [B, S, hd] -> broadcast over heads."""
    if cos.ndim == 2:
        cos, sin = cos[None, None], sin[None, None]
    else:
        cos, sin = cos[:, None], sin[:, None]
    cos, sin = cos.astype(q.dtype), sin.astype(q.dtype)
    q_out = q * cos + rotate_half(q) * sin
    k_out = k * cos + rotate_half(k) * sin
    return q_out, k_out


def _decoder_block(
    cfg: LlamaConfig,
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    bias: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    b, s, d = x.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    y = rms_norm(x, p["attn_norm"], cfg.rms_eps)
    q = (y @ p["q_w"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (y @ p["k_w"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = (y @ p["v_w"]).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos, sin)
    if cfg.attn_impl == "flash":
        from .. import ops  # avoid circular import at module load

        attn = ops.flash_attention.mha_flash(q, k, v, bias=bias)
    elif cfg.attn_impl == "chunked" and cfg.attn_chunk is not None:
        attn = mha_chunked(q, k, v, bias=bias, chunk=cfg.attn_chunk)
    else:
        attn = mha(q, k, v, bias=bias)
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    x = x + attn @ p["o_w"]

    y = rms_norm(x, p["mlp_norm"], cfg.rms_eps)
    # silu in the model dtype, matching HF LlamaMLP (act_fn applied to the
    # bf16 gate_proj output); an fp32 upcast here would also materialize a
    # [B, S, inter] fp32 temp (~100 MB at bs8/7B) in the remat backward.
    gate = jax.nn.silu(y @ p["gate_w"])
    x = x + (gate * (y @ p["up_w"])) @ p["down_w"]
    return x


def llama_apply(
    params: Dict,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits_tail: Optional[int] = None,
) -> jnp.ndarray:
    """inputs_embeds: [B, S, D] -> logits fp32.

    `logits_tail=k` computes the vocab projection only for the LAST k
    positions (returns [B, k, V]); with 256 image-patch positions whose
    logits nothing reads, this cuts lm_head FLOPs and logit HBM ~5x on the
    OpenVLA workload. None -> all positions (HF-equivalent)."""
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    bias = causal_bias(s, s)
    if attention_mask is not None:
        bias = bias + padding_bias(attention_mask)

    block = _decoder_block
    if remat:
        block = jax.checkpoint(block, static_argnums=(0,))

    def body(carry, layer_params):
        return block(cfg, carry, layer_params, bias, cos, sin), None

    layers = params["layers"]
    if remat and cfg.remat_group > 1 and cfg.num_layers % cfg.remat_group == 0:
        g = cfg.remat_group
        grouped = jax.tree.map(lambda a: a.reshape(a.shape[0] // g, g, *a.shape[1:]), layers)

        def group_body(carry, group_params):
            out, _ = jax.lax.scan(body, carry, group_params)
            return out, None

        group_body = jax.checkpoint(group_body)
        x, _ = jax.lax.scan(group_body, inputs_embeds, grouped)
    else:
        x, _ = jax.lax.scan(body, inputs_embeds, layers, unroll=cfg.scan_unroll)
    x = rms_norm(x, params["norm"], cfg.rms_eps)
    if logits_tail is not None:
        x = x[:, s - logits_tail :, :]
    logits = (x @ params["lm_head"]).astype(jnp.float32)
    return logits


def embed_tokens(params: Dict, input_ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed"][input_ids]


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """HF-internal shifted CE: logits[:, :-1] predict labels[:, 1:]; IGNORE
    positions excluded; mean over valid tokens. fp32 throughout."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logprobs = jax.nn.log_softmax(shift_logits, axis=-1)
    token_ll = jnp.take_along_axis(logprobs, safe_labels[..., None], axis=-1)[..., 0]
    loss_sum = -jnp.sum(jnp.where(valid, token_ll, 0.0))
    return loss_sum / jnp.maximum(jnp.sum(valid), 1)


def init_llama_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Dict:
    k = jax.random.split(rng, 10)
    d, l, inter, v = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size, cfg.vocab_size
    hd, h, hkv = cfg.head_dim, cfg.num_heads, cfg.num_kv_heads

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    return {
        "embed": normal(k[0], (v, d)),
        "layers": {
            "attn_norm": jnp.ones((l, d), dtype),
            "q_w": normal(k[1], (l, d, h * hd)),
            "k_w": normal(k[2], (l, d, hkv * hd)),
            "v_w": normal(k[3], (l, d, hkv * hd)),
            "o_w": normal(k[4], (l, h * hd, d)),
            "mlp_norm": jnp.ones((l, d), dtype),
            "gate_w": normal(k[5], (l, d, inter)),
            "up_w": normal(k[6], (l, d, inter)),
            "down_w": normal(k[7], (l, inter, d)),
        },
        "norm": jnp.ones((d,), dtype),
        "lm_head": normal(k[8], (d, v)),
    }
