"""Weight-only int8 / int4 quantization for the serving decode.

The 7B decode is weight-streaming-bound: every generated token re-reads the
full LLM stack from HBM, and the 13.5 GB of bf16 weights are both the memory
ceiling (one 15.75 GB v5e fits bs<=4, BASELINE.md) and the bandwidth bill.
Symmetric per-output-channel int8 halves both: ~7.0 GB of weight arguments,
so bs=8..16 batched serving fits on a SINGLE chip (previously "needs TP over
>=2 chips"), and each decode step streams half the bytes. Grouped int4
(mode="int4") halves the stack bytes AGAIN (~5.0 GB total pytree on the 7B):
the TPU stores s4 packed two-per-byte, so HBM streams 4-bit weights.

int8 scheme (w8a16 / "LLM.int8-style" weight-only, the TPU-friendly flavor):
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

int4 scheme (w4a16, GPTQ/AWQ-style GROUPED scales — per-channel alone is too
coarse at 4 bits):
  - each output channel's contraction dim is tiled into groups of
    `group_size` (default 128, the AWQ/GPTQ convention) with one symmetric
    scale per (channel, group): stacks [L, out, in] carry f32 scales
    [L, out, in/gs]. Dequantization is NOT a single post-matmul multiply
    anymore — the decode hot loop contracts per group and applies the scale
    to the [.., out, G] partial sums before reducing over groups (exact;
    models/decode.py _proj), while the FLOP-bound prefill dequantizes each
    layer's weights in-register and runs one dense matmul.
  - the embedding table stays per-row int8 (a 4-bit row scale is 15 levels
    for a lookup that costs nothing at int8 — wrong fidelity trade), and the
    lm_head gets grouped scales over its contraction (hidden) dim.
  - storage is int8 with TWO s4 values packed per byte along the contraction
    axis (low nibble = channel 2j, high nibble = 2j+1, pairs never straddle
    a group): stacks [L, out, in/2], lm_head [D/2, V]. The decode kernels
    unpack with two arithmetic shifts that XLA fuses into the matmul operand
    read, so HBM streams 4-bit weights exactly as jnp.int4 storage would.
    Manual packing instead of jnp.int4 because sub-byte jit ARGUMENTS ride a
    fragile path (measured on the axon relay, round 5: any jit taking an
    int4 array argument dies with "Recursively calling jit" — int4 INSIDE a
    jit, e.g. the kv_cache='int4' cache, is fine); packed int8 is the
    battle-tested GPTQ/AWQ representation and works on every runtime.

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

from typing import Dict, Optional

import numpy as np

# the cooked [L, out, in] projection stacks (models/decode.py _COOKED_KEYS)
QUANT_LAYER_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")
INT8_MAX = 127.0
INT4_MAX = 7.0
DEFAULT_GROUP_SIZE = 128  # the GPTQ/AWQ convention; divides 4096 and 11008


def _pack_nibbles(q, xp):
    """Pack an even-last-dim int array of s4 values ([-8, 7]) two-per-byte:
    [..., n] -> int8 [..., n/2], low nibble = channel 2j, high = 2j+1."""
    lo = q[..., 0::2].astype(xp.int32) & 0xF
    hi = q[..., 1::2].astype(xp.int32) & 0xF
    packed = lo | (hi << 4)  # 0..255 in int32
    if xp is np:
        return packed.astype(np.uint8).view(np.int8)
    import jax

    return jax.lax.bitcast_convert_type(
        packed.astype(xp.uint8), xp.int8
    )


def _quantize_last_dim(w, xp):
    """Symmetric int8 over the LAST axis (the contraction dim in the cooked
    layout): returns (int8 array, f32 scale with the last axis reduced)."""
    wf = xp.asarray(w, dtype=xp.float32)
    absmax = xp.max(xp.abs(wf), axis=-1)
    scale = xp.maximum(absmax / INT8_MAX, xp.float32(1e-12))
    q = xp.clip(xp.round(wf / scale[..., None]), -INT8_MAX, INT8_MAX)
    return q.astype(xp.int8), scale.astype(xp.float32)


def _quantize_grouped(w, xp, group_size: int, what: str):
    """Symmetric int4 over GROUPS of the last axis: returns (PACKED int8
    array [..., in/2] — two s4 per byte, _pack_nibbles — and f32 scale
    [..., in/group_size])."""
    wf = xp.asarray(w, dtype=xp.float32)
    contraction = wf.shape[-1]
    if contraction % group_size:
        raise ValueError(
            f"int4 group_size={group_size} must divide {what}'s contraction "
            f"dim ({contraction}); pass a divisor (e.g. 64)"
        )
    if group_size % 2:
        raise ValueError(
            f"int4 group_size={group_size} must be EVEN: values pack two per "
            f"byte within a group (models/decode.py unpacks per group)"
        )
    g = contraction // group_size
    wg = wf.reshape(wf.shape[:-1] + (g, group_size))
    absmax = xp.max(xp.abs(wg), axis=-1)                       # [..., G]
    scale = xp.maximum(absmax / INT4_MAX, xp.float32(1e-12))
    q = xp.clip(xp.round(wg / scale[..., None]), -INT4_MAX, INT4_MAX)
    return (
        _pack_nibbles(q.reshape(wf.shape).astype(xp.int8), xp),
        scale.astype(xp.float32),
    )


def int4_group_size_for(cfg, tp: int = 1) -> int:
    """Largest standard group size dividing every decode contraction dim of
    a VLAConfig (stack contractions: hidden, num_heads*head_dim,
    intermediate; lm_head: hidden). 7B -> 128 (the GPTQ/AWQ convention);
    vla-tiny -> 64. The ONE group-size policy shared by VLAPolicy, the
    acceptance gate (models/verify.py), and bench_decode — a hardcoded 128
    is a dead end on any model 128 doesn't divide.

    `tp` > 1: additionally require gs to divide the PER-CHIP contraction of
    the row-parallel stacks (o_w: num_heads*head_dim/tp, down_w:
    intermediate/tp) — a quantization group straddling a shard boundary
    makes GSPMD gather the whole stack (the loud guard in
    models/decode.py); resolving with the mesh in hand means bare
    quantize='int4' composes with TP out of the box (7B tp=2 -> 128 still;
    tp=4 -> 64, since 11008/4 is not a multiple of 128; vla-tiny tp=2 ->
    32)."""
    lcfg = cfg.llm
    row_parallel = (lcfg.num_heads * lcfg.head_dim, lcfg.intermediate_size)
    if tp > 1 and any(d % tp for d in row_parallel):
        # floor-dividing would compute a group size for per-chip dims that
        # don't exist and can degrade to gs=1 (per-element f32 scales — a
        # pytree LARGER than bf16) with no error; the decode guard only
        # checks num_kv_heads % tp, so fail here with the real reason
        raise ValueError(
            f"int4 decode TP: tp={tp} does not divide the row-parallel "
            f"contractions {row_parallel} of {cfg.name!r}; pick a tp that "
            f"divides both"
        )
    dims = (
        lcfg.hidden_size,
        lcfg.num_heads * lcfg.head_dim,
        lcfg.intermediate_size,
        (lcfg.num_heads * lcfg.head_dim) // tp,
        lcfg.intermediate_size // tp,
    )
    for gs in (128, 64, 32, 16, 8, 4, 2):
        # 2 is the floor: values pack two per byte WITHIN a group
        # (_pack_nibbles), so an odd group size cannot exist
        if all(d % gs == 0 for d in dims):
            return gs
    raise ValueError(
        f"int4 quantization needs an even group size dividing every decode "
        f"contraction dim of {cfg.name!r} ({dims}); an odd contraction dim "
        f"cannot pack two s4 values per byte"
    )


def quant_mode(params: Dict) -> Optional[str]:
    """'int8' / 'int4' if the LLM projection stacks are quantized
    (quantize_decode_params output), else None. Both modes store int8 bytes
    (int4 packs two s4 per byte), so the discriminator is the scale RANK:
    grouped int4 scales tile the contraction ([L, out, G] — same rank as the
    stack), int8 per-channel scales drop it ([L, out])."""
    layers = params["llm"]["layers"]
    qw = layers["q_w"]
    if np.dtype(qw.dtype) != np.int8:
        return None
    sc = layers.get("q_w_scale")
    if sc is not None and getattr(sc, "ndim", None) == getattr(qw, "ndim", 3):
        return "int4"
    return "int8"


def is_quantized(params: Dict) -> bool:
    """True if the LLM projection stacks are int8/int4
    (quantize_decode_params output)."""
    return quant_mode(params) is not None


def quantize_decode_params(
    params: Dict,
    xp=np,
    mode: str = "int8",
    group_size: int = DEFAULT_GROUP_SIZE,
) -> Dict:
    """Quantize a COOKED decode pytree (decode_layout_params output).

    mode="int8": replaces each projection stack `k` [L, out, in] with an int8
    array of the same shape plus `k + "_scale"` f32 [L, out]; `lm_head`
    [D, V] gets a per-output-column scale [V].

    mode="int4": PACKED int8 stacks [L, out, in/2] (two s4 per byte along
    the contraction, _pack_nibbles) with GROUPED f32 scales
    [L, out, in/group_size]; `lm_head` [D, V] becomes [D/2, V] with scales
    [V, D/group_size] over its hidden contraction. models/decode.py
    dispatches the grouped math on the scale's rank
    (scale.ndim == stack.ndim) and unpacks nibbles in-kernel.

    Both modes: `embed` [V, D] becomes int8 with a per-row scale [V] (exact
    per lookup; 4-bit rows are the wrong fidelity trade for 65 MB). Vision,
    projector, and norms are untouched. Pass xp=np for host pytrees (the
    load path), xp=jnp only for small models already on a device.

    greedy_decode_actions consumes the result directly (cooked_weights=True);
    parallel.sharding.decode_param_specs knows the scale keys for TP serving.
    """
    if mode not in ("int8", "int4"):
        raise ValueError(f"mode={mode!r}; supported: 'int8', 'int4'")
    llm = params["llm"]
    layers = llm["layers"]
    if "gate_w" not in layers:
        raise ValueError(
            "int8/int4 decode quantization supports Llama-family layer "
            "stacks (gate/up/down SwiGLU); this pytree has none — Phi-family "
            "decode itself is routed away in models/decode.py"
        )
    gw = layers["gate_w"]
    have = quant_mode(params)
    if have is not None:
        if have == mode:
            return params  # idempotent
        raise ValueError(
            f"params are already {have}-quantized; re-quantizing to {mode} "
            "would compound rounding — quantize from the bf16 cooked pytree"
        )
    # cooked-layout check, same trick as greedy_decode_actions: gate_w is
    # never square, cooked is [L, inter, hidden] with inter > hidden for
    # every Llama-family config
    if gw.shape[-2] <= gw.shape[-1]:
        raise ValueError(
            f"quantize_decode_params expects the COOKED layout "
            f"(decode_layout_params output); gate_w has shape {gw.shape} "
            f"which is the [L, hidden, intermediate] storage layout"
        )

    def q_stack(w, what):
        if mode == "int8":
            return _quantize_last_dim(w, xp)
        return _quantize_grouped(w, xp, group_size, what)

    new_layers = dict(layers)
    for k in QUANT_LAYER_KEYS:
        if k in layers:
            q, s = q_stack(layers[k], k)
            new_layers[k] = q
            new_layers[k + "_scale"] = s
    new_llm = dict(llm)
    new_llm["layers"] = new_layers
    # lm_head [D, V]: contraction is dim 0 -> quantize the [V, D] transpose
    # (int8: per-output-column scale [V]; int4: grouped [V, D/gs])
    lm_q, lm_s = q_stack(xp.swapaxes(llm["lm_head"], 0, 1), "lm_head")
    new_llm["lm_head"] = xp.swapaxes(lm_q, 0, 1)
    new_llm["lm_head_scale"] = lm_s
    # embed [V, D]: per-row int8 scale, lookups dequantize exactly per token
    new_llm["embed"], new_llm["embed_scale"] = _quantize_last_dim(
        llm["embed"], xp
    )
    out = dict(params)
    out["llm"] = new_llm
    return out


def quantize_decode_shapes(
    shapes: Dict, mode: str = "int8", group_size: int = DEFAULT_GROUP_SIZE
) -> Dict:
    """The shape/dtype transform of quantize_decode_params on a
    jax.ShapeDtypeStruct pytree — for abstract-params compiles
    (parallel/evidence.py) where no weight bytes exist to quantize."""
    import jax
    import jax.numpy as jnp

    if mode not in ("int8", "int4"):
        raise ValueError(f"mode={mode!r}; supported: 'int8', 'int4'")

    def qs(shape):
        # int4 packs two s4 per byte along the contraction (last) axis
        if mode == "int4":
            shape = shape[:-1] + (shape[-1] // 2,)
        return jax.ShapeDtypeStruct(shape, jnp.int8)

    def f32(shape):
        return jax.ShapeDtypeStruct(shape, jnp.float32)

    def scale_shape(s):
        if mode == "int8":
            return s.shape[:-1]
        if s.shape[-1] % group_size:
            raise ValueError(
                f"int4 group_size={group_size} must divide the contraction "
                f"dim ({s.shape[-1]})"
            )
        return s.shape[:-1] + (s.shape[-1] // group_size,)

    llm = shapes["llm"]
    layers = dict(llm["layers"])
    for k in QUANT_LAYER_KEYS:
        if k in layers:
            s = layers[k]
            layers[k] = qs(s.shape)
            layers[k + "_scale"] = f32(scale_shape(s))
    new_llm = dict(llm, layers=layers)
    lm = llm["lm_head"]  # [D, V]; contraction is dim 0
    if mode == "int4":
        new_llm["lm_head"] = jax.ShapeDtypeStruct(
            (lm.shape[0] // 2, lm.shape[1]), jnp.int8
        )
    else:
        new_llm["lm_head"] = jax.ShapeDtypeStruct(lm.shape, jnp.int8)
    new_llm["lm_head_scale"] = f32(
        scale_shape(jax.ShapeDtypeStruct((lm.shape[1], lm.shape[0]), lm.dtype))
    )
    emb = llm["embed"]  # per-row int8 in both modes
    new_llm["embed"] = jax.ShapeDtypeStruct(emb.shape, jnp.int8)
    new_llm["embed_scale"] = f32(emb.shape[:-1])
    return dict(shapes, llm=new_llm)
