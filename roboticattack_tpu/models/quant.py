"""Weight-only int8 quantization for the serving decode.

The 7B decode is weight-streaming-bound: every generated token re-reads the
full LLM stack from HBM, and the 13.5 GB of bf16 weights are both the memory
ceiling (one 15.75 GB v5e fits bs<=4, BASELINE.md) and the bandwidth bill.
Symmetric per-output-channel int8 halves both: ~7.0 GB of weight arguments,
so bs=8..16 batched serving fits on a SINGLE chip (previously "needs TP over
>=2 chips"), and each decode step streams half the bytes.

Scheme (w8a16 / "LLM.int8-style" weight-only, the TPU-friendly flavor):
  - per-OUTPUT-channel symmetric scales over the contraction dim, so
    dequantization is a single f32 multiply AFTER the matmul:
        y @ W  ==  (y @ W8) * s        (exactly, since s is constant per
                                        output column — linearity)
    XLA fuses the int8->bf16 operand convert into the matmul read, so the
    MXU still sees a dense bf16 contraction but HBM streams int8 bytes.
  - activations, KV cache, norms, vision tower, projector stay in the model
    dtype: the vision tower runs once per request (compute-bound prefill) and
    carries most of the fidelity burden; the per-step hot loop is the LLM
    stack + lm_head, which is exactly what gets quantized.
  - embed rows are quantized per-ROW (per-token): a lookup dequantizes with
    one [.,1] multiply and is exact per row.

Quantization is HOST-side on the COOKED layout (models/decode.py
decode_layout_params: stacks are [L, out, in]) — same reasoning as cooking:
an on-accelerator pass would transiently need weight bytes twice.

No reference counterpart: the reference serves `predict_action` through HF
bs=1 fp16 `generate` (modeling_prismatic.py:506-534) and scales only by
big-GPU HBM. Accuracy of int8-weight-only on real released weights is
environment-gated (no egress) — the math-path correctness is pinned by
bit-parity tests on int8-grid weights (tests/test_decode_quant.py) instead.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# the cooked [L, out, in] projection stacks (models/decode.py _COOKED_KEYS)
QUANT_LAYER_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
INT8_MAX = 127.0


def _quantize_last_dim(w, xp):
    """Symmetric int8 over the LAST axis (the contraction dim in the cooked
    layout): returns (int8 array, f32 scale with the last axis reduced)."""
    wf = xp.asarray(w, dtype=xp.float32)
    absmax = xp.max(xp.abs(wf), axis=-1)
    scale = xp.maximum(absmax / INT8_MAX, xp.float32(1e-12))
    q = xp.clip(xp.round(wf / scale[..., None]), -INT8_MAX, INT8_MAX)
    return q.astype(xp.int8), scale.astype(xp.float32)


def is_quantized(params: Dict) -> bool:
    """True if the LLM projection stacks are int8 (quantize_decode_params
    output)."""
    return np.dtype(params["llm"]["layers"]["q_w"].dtype) == np.int8


def quantize_decode_params(params: Dict, xp=np) -> Dict:
    """Int8-quantize a COOKED decode pytree (decode_layout_params output).

    Replaces each projection stack `k` [L, out, in] with an int8 array of the
    same shape plus `k + "_scale"` f32 [L, out]; `lm_head` [D, V] gets a
    per-output-column scale [V]; `embed` [V, D] a per-row scale [V]. Vision,
    projector, and norms are untouched. Pass xp=np for host pytrees (the
    load path), xp=jnp only for small models already on a device.

    greedy_decode_actions consumes the result directly (cooked_weights=True);
    parallel.sharding.decode_param_specs knows the scale keys for TP serving.
    """
    llm = params["llm"]
    layers = llm["layers"]
    if "gate_w" not in layers:
        raise ValueError(
            "int8 decode quantization supports Llama-family layer stacks "
            "(gate/up/down SwiGLU); this pytree has none — Phi-family decode "
            "itself is routed away in models/decode.py"
        )
    gw = layers["gate_w"]
    if np.dtype(gw.dtype) == np.int8:
        return params  # idempotent
    # cooked-layout check, same trick as greedy_decode_actions: gate_w is
    # never square, cooked is [L, inter, hidden] with inter > hidden for
    # every Llama-family config
    if gw.shape[-2] <= gw.shape[-1]:
        raise ValueError(
            f"quantize_decode_params expects the COOKED layout "
            f"(decode_layout_params output); gate_w has shape {gw.shape} "
            f"which is the [L, hidden, intermediate] storage layout"
        )
    new_layers = dict(layers)
    for k in QUANT_LAYER_KEYS:
        if k in layers:
            q, s = _quantize_last_dim(layers[k], xp)
            new_layers[k] = q
            new_layers[k + "_scale"] = s
    new_llm = dict(llm)
    new_llm["layers"] = new_layers
    # lm_head [D, V]: per-output-COLUMN scale -> quantize over dim 0
    lm_q, lm_s = _quantize_last_dim(xp.swapaxes(llm["lm_head"], 0, 1), xp)
    new_llm["lm_head"] = xp.swapaxes(lm_q, 0, 1)
    new_llm["lm_head_scale"] = lm_s
    # embed [V, D]: per-row scale, lookups dequantize exactly per token
    new_llm["embed"], new_llm["embed_scale"] = _quantize_last_dim(
        llm["embed"], xp
    )
    out = dict(params)
    out["llm"] = new_llm
    return out


def quantize_decode_shapes(shapes: Dict) -> Dict:
    """The shape/dtype transform of quantize_decode_params on a
    jax.ShapeDtypeStruct pytree — for abstract-params compiles
    (parallel/evidence.py) where no weight bytes exist to quantize."""
    import jax
    import jax.numpy as jnp

    def i8(s, shape=None):
        return jax.ShapeDtypeStruct(shape or s.shape, jnp.int8)

    def f32(shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    llm = shapes["llm"]
    layers = dict(llm["layers"])
    for k in QUANT_LAYER_KEYS:
        if k in layers:
            s = layers[k]
            layers[k] = i8(s)
            layers[k + "_scale"] = f32(s.shape[:-1])
    new_llm = dict(llm, layers=layers)
    lm = llm["lm_head"]
    new_llm["lm_head"] = i8(lm)
    new_llm["lm_head_scale"] = f32(lm.shape[-1:])
    emb = llm["embed"]
    new_llm["embed"] = i8(emb)
    new_llm["embed_scale"] = f32(emb.shape[:-1])
    return dict(shapes, llm=new_llm)
