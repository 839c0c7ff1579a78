"""Phi-2 decoder, pure-JAX, numerically matching HF `PhiForCausalLM`.

The one prismatic-zoo LLM backbone that is not Llama-shaped
(/root/reference/prismatic/models/backbones/llm/phi.py wraps
`microsoft/phi-2` via HF; conf/models.py registers `phi-2+3b`). Structural
differences from Llama handled here:
  - LayerNorm (scale + bias) instead of RMSNorm, eps 1e-5;
  - PARALLEL residual: attn and MLP both read the same input_layernorm
    output and are summed with the residual in one step;
  - partial rotary: RoPE on the first `rotary_dim` (= 0.4 * head_dim)
    channels of q/k only, the rest pass through;
  - biased q/k/v/dense/fc1/fc2 projections and a biased lm_head;
  - MLP = fc1 -> gelu_new (tanh approximation) -> fc2, no gating.

Same TPU-first structure as models/llama.py: stacked layers + `lax.scan`,
optional per-block remat, fp32 norms/softmax, bf16 matmuls. One documented
numeric divergence: HF's eager PhiAttention upcasts the q@k matmul itself to
fp32 (an overflow guard); we keep the matmul in the model dtype and do the
softmax in fp32 like the rest of this framework — parity-tested in fp32.

Params pytree:
  embed:   [V, D]
  layers:  stacked {ln_scale, ln_bias, q_w, q_b, k_w, k_b, v_w, v_b,
           o_w, o_b, fc1_w, fc1_b, fc2_w, fc2_b}   (weights input-major)
  norm:    {scale [D], bias [D]}
  lm_head: {w [D, V], b [V]}
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import causal_bias, mha, mha_chunked, padding_bias
from .config import PhiConfig
from .llama import rope_cos_sin, rotate_half
from .vit import layer_norm


def _apply_partial_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                        rotary_dim: int) -> jnp.ndarray:
    """x: [B, H, S, hd]; rotate the first rotary_dim channels, pass the rest
    (HF PhiAttention's query_rot/query_pass split)."""
    if cos.ndim == 2:
        cos, sin = cos[None, None], sin[None, None]
    else:
        cos, sin = cos[:, None], sin[:, None]
    cos, sin = cos.astype(x.dtype), sin.astype(x.dtype)
    rot, passthrough = x[..., :rotary_dim], x[..., rotary_dim:]
    rot = rot * cos + rotate_half(rot) * sin
    return jnp.concatenate([rot, passthrough], axis=-1)


def _phi_block(
    cfg: PhiConfig,
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],
    bias: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> jnp.ndarray:
    b, s, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim

    y = layer_norm(x, p["ln_scale"], p["ln_bias"], cfg.ln_eps)
    q = (y @ p["q_w"] + p["q_b"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = (y @ p["k_w"] + p["k_b"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    v = (y @ p["v_w"] + p["v_b"]).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    q = _apply_partial_rope(q, cos, sin, cfg.rotary_dim)
    k = _apply_partial_rope(k, cos, sin, cfg.rotary_dim)
    if cfg.attn_impl == "chunked" and cfg.attn_chunk is not None:
        attn = mha_chunked(q, k, v, bias=bias, chunk=cfg.attn_chunk)
    elif cfg.attn_impl in ("xla", "chunked"):
        attn = mha(q, k, v, bias=bias)
    else:
        # no silent fallback: 'flash' (the Llama kernel, head_dim 128 tiles)
        # is not wired for Phi's head_dim 80 — full S x S attention would be
        # a silently different memory/perf profile than the flag promises
        raise ValueError(
            f"PhiConfig.attn_impl='{cfg.attn_impl}' is not supported "
            "(use 'chunked' or 'xla')"
        )
    attn = attn.transpose(0, 2, 1, 3).reshape(b, s, d)
    attn = attn @ p["o_w"] + p["o_b"]

    # parallel residual: mlp reads the SAME normed input as attention
    mlp = jax.nn.gelu((y @ p["fc1_w"] + p["fc1_b"]).astype(jnp.float32),
                      approximate=True).astype(x.dtype)
    mlp = mlp @ p["fc2_w"] + p["fc2_b"]
    return x + attn + mlp


def phi_apply(
    params: Dict,
    cfg: PhiConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
    positions: Optional[jnp.ndarray] = None,
    remat: bool = False,
    logits_tail: Optional[int] = None,
) -> jnp.ndarray:
    """inputs_embeds: [B, S, D] -> logits fp32 (same contract as llama_apply)."""
    b, s, _ = inputs_embeds.shape
    if positions is None:
        positions = jnp.arange(s)
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)

    bias = causal_bias(s, s)
    if attention_mask is not None:
        bias = bias + padding_bias(attention_mask)

    block = _phi_block
    if remat:
        block = jax.checkpoint(block, static_argnums=(0,))

    def body(carry, layer_params):
        return block(cfg, carry, layer_params, bias, cos, sin), None

    x, _ = jax.lax.scan(body, inputs_embeds, params["layers"])
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], cfg.ln_eps)
    if logits_tail is not None:
        x = x[:, s - logits_tail :, :]
    logits = (x @ params["lm_head"]["w"] + params["lm_head"]["b"]).astype(jnp.float32)
    return logits


def init_phi_params(rng: jax.Array, cfg: PhiConfig, dtype=jnp.float32) -> Dict:
    k = jax.random.split(rng, 9)
    d, l, inter, v = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size, cfg.vocab_size

    def normal(key, shape, std=0.02):
        return (jax.random.normal(key, shape) * std).astype(dtype)

    return {
        "embed": normal(k[0], (v, d)),
        "layers": {
            "ln_scale": jnp.ones((l, d), dtype),
            "ln_bias": jnp.zeros((l, d), dtype),
            "q_w": normal(k[1], (l, d, d)), "q_b": jnp.zeros((l, d), dtype),
            "k_w": normal(k[2], (l, d, d)), "k_b": jnp.zeros((l, d), dtype),
            "v_w": normal(k[3], (l, d, d)), "v_b": jnp.zeros((l, d), dtype),
            "o_w": normal(k[4], (l, d, d)), "o_b": jnp.zeros((l, d), dtype),
            "fc1_w": normal(k[5], (l, d, inter)), "fc1_b": jnp.zeros((l, inter), dtype),
            "fc2_w": normal(k[6], (l, inter, d)), "fc2_b": jnp.zeros((l, d), dtype),
        },
        "norm": {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)},
        "lm_head": {"w": normal(k[7], (d, v)), "b": jnp.zeros((v,), dtype)},
    }


def convert_phi(state: Mapping[str, np.ndarray], cfg: PhiConfig,
                prefix: str = "language_model.") -> Dict:
    """HF `PhiForCausalLM` state dict -> our stacked pytree."""
    from .convert import _t

    def get(name):
        return np.asarray(state[prefix + name])

    layers: Dict[str, list] = {}

    def push(key, val):
        layers.setdefault(key, []).append(val)

    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        push("ln_scale", get(p + "input_layernorm.weight"))
        push("ln_bias", get(p + "input_layernorm.bias"))
        push("q_w", _t(get(p + "self_attn.q_proj.weight")))
        push("q_b", get(p + "self_attn.q_proj.bias"))
        push("k_w", _t(get(p + "self_attn.k_proj.weight")))
        push("k_b", get(p + "self_attn.k_proj.bias"))
        push("v_w", _t(get(p + "self_attn.v_proj.weight")))
        push("v_b", get(p + "self_attn.v_proj.bias"))
        push("o_w", _t(get(p + "self_attn.dense.weight")))
        push("o_b", get(p + "self_attn.dense.bias"))
        push("fc1_w", _t(get(p + "mlp.fc1.weight")))
        push("fc1_b", get(p + "mlp.fc1.bias"))
        push("fc2_w", _t(get(p + "mlp.fc2.weight")))
        push("fc2_b", get(p + "mlp.fc2.bias"))
    return {
        "embed": get("model.embed_tokens.weight"),
        "layers": {k: np.stack(v) for k, v in layers.items()},
        "norm": {
            "scale": get("model.final_layernorm.weight"),
            "bias": get("model.final_layernorm.bias"),
        },
        "lm_head": {"w": _t(get("lm_head.weight")), "b": get("lm_head.bias")},
    }
