"""Attention primitives.

`mha` is the XLA-native multi-head attention used by both ViTs and the Llama
decoder: einsum QK^T -> fp32 softmax -> einsum PV. At this workload's sequence
length (~290 multimodal tokens) XLA's fusion already keeps the score matrix in
VMEM-resident tiles; a Pallas flash kernel is layered on top for longer
sequences / perf experiments (see ops/flash_attention.py).

Replaces the reference's reliance on external flash-attn 2.5.5 CUDA kernels
(/root/reference/experiments/robot/openvla_utils.py:45) and HF SDPA.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -2.0**30  # large finite negative; avoids NaN from all-masked rows


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """q: [B, Hq, Sq, D], k/v: [B, Hkv, Skv, D]; bias broadcastable to
    [B, H, Sq, Skv] (additive, fp32). Returns [B, Hq, Sq, D] in q.dtype.

    Supports grouped-query attention when Hq % Hkv == 0 (Llama-2-7B is MHA so
    Hq == Hkv, but the repeat costs nothing thanks to XLA broadcasting).
    """
    b, hq, sq, d = q.shape
    hkv = k.shape[1]
    if scale is None:
        scale = d ** -0.5
    if hq != hkv:
        group = hq // hkv
        k = jnp.repeat(k, group, axis=1)
        v = jnp.repeat(v, group, axis=1)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    probs = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)
    return out


def mha_chunked(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    chunk: int = 64,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Memory-bounded attention: queries processed in `chunk`-sized blocks via
    `lax.map`, each block rematerialized in the backward pass. Caps the fp32
    score/prob transient at [B, H, chunk, Skv] instead of [B, H, Sq, Skv] —
    the difference between fitting and OOMing the 7B fwd+bwd on a 16 GB chip.
    Numerically identical to `mha` (same fp32 softmax)."""
    import jax

    b, h, sq, d = q.shape
    skv = k.shape[1:3][1] if False else k.shape[2]
    if sq % chunk != 0 or sq <= chunk:
        return mha(q, k, v, bias=bias, scale=scale)
    n = sq // chunk
    q_c = q.reshape(b, h, n, chunk, d).transpose(2, 0, 1, 3, 4)  # [n, B, H, c, d]
    if bias is not None:
        bias_full = jnp.broadcast_to(bias, (b, bias.shape[1], sq, skv))
        bias_c = bias_full.reshape(b, bias.shape[1], n, chunk, skv).transpose(2, 0, 1, 3, 4)
    else:
        bias_c = None

    @jax.checkpoint
    def one(args):
        qc, bc = args
        return mha(qc, k, v, bias=bc, scale=scale)

    out = jax.lax.map(one, (q_c, bias_c))  # [n, B, H, c, d]
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, sq, d)


def causal_bias(sq: int, skv: int) -> jnp.ndarray:
    """[1, 1, sq, skv] additive causal mask (query i attends keys <= i + offset
    where offset aligns the ends, for decode steps)."""
    offset = skv - sq
    qi = jnp.arange(sq)[:, None]
    ki = jnp.arange(skv)[None, :]
    allowed = ki <= qi + offset
    return jnp.where(allowed, 0.0, NEG_INF)[None, None]


def padding_bias(attention_mask: jnp.ndarray) -> jnp.ndarray:
    """attention_mask: [B, Skv] with 1 = attend. Returns [B, 1, 1, Skv]."""
    return jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, NEG_INF)
