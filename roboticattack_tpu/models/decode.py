"""Greedy action decoding with KV cache — the `predict_action` primitive.

Mirrors OpenVLAForActionPrediction.predict_action
(/root/reference/prismatic/extern/hf/modeling_prismatic.py:506-536):
  generate(max_new_tokens=7, greedy) = one multimodal prefill + 6 cached
  decode steps, then de-tokenize `vocab - id`, clip, bin-center lookup, and
  q01/q99 unnormalization.

TPU-first: the whole prefill + `lax.scan` over decode steps compiles into one
XLA program with a static-shape KV cache; right-padded prompts are handled by
per-row true lengths so one compilation serves every instruction length (the
HF reference is bs=1, exact-length, and re-runs Python per step).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.action_tokenizer import BIN_CENTERS
from ..utils.constants import ACTION_DIM, EMPTY_TOKEN_ID
from .config import VLAConfig
from .llama import apply_rope, rms_norm, rope_cos_sin
from .vlm import projector_apply, vision_features
from ..ops.attention import NEG_INF


# weight keys that decode_layout_params() pre-transposes ([in,out]->[out,in])
_COOKED_KEYS = ("q_w", "k_w", "v_w", "o_w", "gate_w", "up_w", "down_w")


def _quantize_act(y, qmax: float = 127.0):
    """Dynamic per-token symmetric int8 activation quantization: [b, s, in]
    -> (int8 same shape, f32 scale [b, s, 1]). The absmax runs over the
    token's feature row, so under tensor parallelism (contraction dim
    sharded) GSPMD reduces it with one tiny [b, s, 1] max-collective."""
    absmax = jnp.max(jnp.abs(y.astype(jnp.float32)), axis=-1, keepdims=True)
    sy = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.clip(jnp.round(y.astype(jnp.float32) / sy), -qmax, qmax)
    return q.astype(jnp.int8), sy


def _unpack_nibbles(p):
    """Packed s4 int8 [..., n/2] -> (lo, hi) int8 arrays [..., n/2]: lo is
    channel 2j, hi is 2j+1 (models/quant.py _pack_nibbles). Two arithmetic
    shifts (sign-extending) that XLA fuses into the consuming matmul's
    operand read — HBM streams the packed bytes only. The consumers keep
    lo/hi as separate operands and split the ACTIVATION channels even/odd
    instead of re-interleaving the weights: the group contraction is
    order-invariant, and an interleave (stack+reshape) could materialize the
    unpacked tensor."""
    lo = jnp.left_shift(p, 4) >> 4
    hi = p >> 4
    return lo, hi


def _proj(y, w, cooked: bool, scale=None, act8: bool = False,
          q4k: bool = False):
    """y @ W for storage layout [in, out] (cooked=False) or the pre-transposed
    decode layout [out, in] (cooked=True). `scale` is present iff `w` is a
    quantize_decode_params stack:

    int8 — scale f32 [out] dequantizes AFTER the contraction (exact: the
    per-output-channel scale is constant over the contraction dim); XLA fuses
    the int8->activation-dtype convert into the matmul operand read so HBM
    streams int8 bytes (models/quant.py).

    int8 + act8=True (the w8a8 prefill regime) — additionally quantize the
    ACTIVATIONS per token (dynamic symmetric int8, _quantize_act) and
    contract int8 x int8 -> int32, the MXU's double-rate integer path (v5e:
    394 int8 TOPS vs 197 bf16); dequantization is two rank-broadcast
    multiplies on the int32 accumulator (per-token [b,s,1] x per-channel
    [out]) — int32 accumulation is exact, so TP partial-sum psums stay
    bit-identical to the single-chip contraction. Unlike every weight-only
    mode the activation ROUNDING is lossy; greedy_decode_actions applies it
    to the FLOP-bound prefill only (decode steps are weight-streaming-bound:
    int8 activations there would add error and save nothing).

    int4 — PACKED s4 (two per int8 byte, models/quant.py _pack_nibbles) with
    f32 scales [out, G] GROUPED over the contraction dim (rank dispatch:
    scale.ndim == w.ndim). One formulation for every s: unpack the nibble
    halves with two arithmetic shifts, dequantize in-register, and contract
    (group, channel) jointly — the shifts/convert/scale-multiply fuse into
    the matmul operand read, so HBM streams the packed bytes. The activation
    channels split even/odd to match the nibble layout (group contractions
    are order-invariant). Fidelity: bf16 rounding of the dequantized weights
    (exact on pow2-scale grids; negligible next to the int4 grid), applied
    identically in the prefill, sequential tail, and Jacobi verification
    pass. See the in-branch comment for why the earlier exact-group-partial
    tail was replaced (measured 7x slower than the int8 tail).
    """
    if scale is not None and scale.ndim == w.ndim:  # grouped int4 (packed s4)
        if q4k and y.shape[1] <= 8:
            # fused Pallas dequant-matmul (ops/q4_matmul.py): the whole
            # unpack/dequant/contract chain inside one kernel, HBM reads =
            # packed bytes. Single-device decode tails only (greedy_decode_
            # actions validates); engaged via int4_kernel=True.
            from ..ops.q4_matmul import q4_matmul

            return q4_matmul(y, w, scale)
        # ONE formulation for every s: dequantize the nibble halves
        # in-register (unpack shifts + the group-scale multiply fuse into
        # the matmul operand read — HBM streams packed bytes) and contract
        # (group, channel) JOINTLY. The round-4 decode tail scaled exact f32
        # GROUP PARTIALS instead ("bsgi,ogi->bsog" then reduce) — measured
        # 7x slower than the int8 tail on the v5e (the grouped-batch einsum
        # forces a transposed weight layout + a [b,s,out,G] partial
        # round-trip), which inverted int4's whole bandwidth story. The
        # joint contraction flattens to a single [b*s, in] x [in, out]
        # matmul per half; the only fidelity change is bf16 rounding of the
        # dequantized weights (exact on pow2-scale grids — the bit-parity
        # tests — and negligible next to the int4 grid itself), applied
        # identically in the sequential and Jacobi tails so the fixed-point
        # consistency is unchanged.
        in_half = w.shape[-1]            # packed bytes = contraction / 2
        in_dim = in_half * 2
        g = scale.shape[-1]
        lo, hi = _unpack_nibbles(w)      # each [.., out, in/2]
        if y.shape[1] <= 8:
            # decode tail (s=1 steps, s=7 Jacobi pass): halves stay separate
            # and the ACTIVATION channels split even/odd — measured faster
            # than interleaving at matvec shapes, and the tiny strided
            # slices are free at s<=8
            log = lo.reshape(w.shape[:-1] + (g, in_half // g))
            hig = hi.reshape(w.shape[:-1] + (g, in_half // g))
            yg = y.reshape(y.shape[0], y.shape[1], g, in_dim // g)
            ye = yg[..., 0::2]           # activation channels 2j  [b,s,g,gs/2]
            yo = yg[..., 1::2]           # activation channels 2j+1
            ld = (log.astype(jnp.float32) * scale[..., None]).astype(y.dtype)
            hd = (hig.astype(jnp.float32) * scale[..., None]).astype(y.dtype)
            return (
                jnp.einsum("bsgi,ogi->bso", ye, ld)
                + jnp.einsum("bsgi,ogi->bso", yo, hd)
            )
        # prefill (s > 8, FLOP-bound): interleave the halves back to the
        # dense [out, in] layout in-register and run ONE full-width matmul —
        # two half-contraction matmuls over strided activation slices
        # measured ~20% slower at bs>=16 (the slices copy [B,S,in]-sized
        # activations and halve the MXU contraction)
        w8 = jnp.stack([lo, hi], axis=-1).reshape(w.shape[:-1] + (in_dim,))
        wg = w8.reshape(w.shape[:-1] + (g, in_dim // g))
        wd = (wg.astype(jnp.float32) * scale[..., None]).astype(y.dtype)
        return jnp.einsum(
            "bsi,oi->bso", y, wd.reshape(w.shape[:-1] + (in_dim,))
        )
    if scale is not None:  # per-output-channel int8
        if act8:
            yq, sy = _quantize_act(y)
            out = jnp.einsum(
                "bsi,oi->bso", yq, w, preferred_element_type=jnp.int32
            )
            return (out.astype(jnp.float32) * sy * scale).astype(y.dtype)
        out = jnp.einsum(
            "bsi,oi->bso", y, w.astype(y.dtype),
            preferred_element_type=jnp.float32,
        )
        return (out * scale).astype(y.dtype)
    if cooked:
        return jnp.einsum("bsi,oi->bso", y, w)
    return y @ w


def _pj(p, key, y, cooked: bool, act8: bool = False, q4k: bool = False):
    """Layer-dict projection: dispatches on the presence of the quantization
    scale leaf (scan slices both the int8 stack and its [L, out] scale)."""
    return _proj(y, p[key], cooked, p.get(key + "_scale"), act8, q4k)


def _embed_rows(p_llm, ids, dtype):
    """Token-embedding lookup; per-row int8 dequantization is exact."""
    e = p_llm["embed"][ids]
    sc = p_llm.get("embed_scale")
    if sc is not None:
        return (e.astype(jnp.float32) * sc[ids][..., None]).astype(dtype)
    return e


def _lm_logits_all(p_llm, h):
    """[B, S, D] hidden -> [B, S, V] f32 logits via the (possibly int8/int4)
    lm_head [D, V]. int8 scale: [V] post-matmul (exact — constant per output
    column). int4: packed s4 [D/2, V] with scales [V, D/gs] grouped over the
    hidden contraction — in-register dequantized nibble halves, one joint
    (group, channel) contraction per half at every S (same formulation and
    fidelity as _proj's int4 branch; the sequential and Jacobi tails share
    it, so the fixed point is consistent)."""
    w = p_llm["lm_head"]
    sc = p_llm.get("lm_head_scale")
    if sc is None:
        return (h @ w).astype(jnp.float32)
    if sc.ndim == 2:  # grouped int4 (packed s4: w is [D/2, V] int8)
        # same joint-contraction formulation as _proj (see its comment):
        # dequantized nibble halves, (group, channel) contracted in one
        # matmul per half, f32 logits via preferred_element_type
        d_half, v = w.shape
        d = d_half * 2
        g = sc.shape[-1]
        lo, hi = _unpack_nibbles(w)           # each [D/2, V]
        log = lo.reshape(g, d_half // g, v)   # hidden channels 2i per group
        hig = hi.reshape(g, d_half // g, v)   # hidden channels 2i+1
        hg4 = h.reshape(h.shape[0], h.shape[1], g, d // g)
        he = hg4[..., 0::2]                   # [B, S, G, gs/2]
        ho = hg4[..., 1::2]
        ld = (log.astype(jnp.float32) * sc.T[:, None, :]).astype(h.dtype)
        hd = (hig.astype(jnp.float32) * sc.T[:, None, :]).astype(h.dtype)
        return jnp.einsum(
            "bsgi,giv->bsv", he, ld, preferred_element_type=jnp.float32
        ) + jnp.einsum(
            "bsgi,giv->bsv", ho, hd, preferred_element_type=jnp.float32
        )
    out = jnp.einsum(
        "bsd,dv->bsv", h, w.astype(h.dtype), preferred_element_type=jnp.float32
    )
    return out * sc


def _lm_logits(p_llm, h):
    """[B, 1, D] hidden -> [B, V] f32 logits (single-position wrapper)."""
    return _lm_logits_all(p_llm, h)[:, 0]


def decode_layout_params(params, xp=np):
    """Pre-transpose the stacked LLM projection weights into the layout the
    decode-time matvecs want, HOST-side (pass xp=np on numpy pytrees).

    Measured on the 7B (one v5e, 15.75 GB HBM): compiling the decode with
    storage-layout [L, in, out] stacks makes XLA materialize ~3.6 GB of
    bf16[32,4096,4096]{1,2,0} transposed weight COPIES as HLO temps (minor
    dim must be the contraction for the s=1 matvecs), which together with the
    13.97 GB of arguments exceeds HBM at compile time. Feeding [L, out, in]
    stacks (cooked=True) gives the program the layout it wants with zero
    temps. Do this on HOST numpy — an on-device transpose would need 2x the
    weights in HBM."""
    from .quant import quant_mode

    llm = dict(params["llm"])
    layers = dict(llm["layers"])
    if quant_mode(params) is not None:
        raise ValueError(
            "params are already int8/int4-quantized (quantize_decode_params "
            "output, which implies the cooked layout); cooking again would "
            "transpose the quantized stacks away from their scales"
        )
    for k in _COOKED_KEYS:
        if k in layers:  # Phi-family layers lack gate/up/down; cook what exists
            layers[k] = xp.swapaxes(layers[k], 1, 2)
    llm["layers"] = layers
    out = dict(params)
    out["llm"] = llm
    return out


def decode_layout_shapes(shapes):
    """`decode_layout_params` on a `jax.ShapeDtypeStruct` pytree — the
    shape-level cooking used wherever abstract params are compiled without
    materializing weight bytes (parallel/evidence.py, scripts/bench_decode.py)."""

    class _ShapeSwap:
        @staticmethod
        def swapaxes(s, a, b):
            shape = list(s.shape)
            shape[a], shape[b] = shape[b], shape[a]
            return jax.ShapeDtypeStruct(tuple(shape), s.dtype)

    return decode_layout_params(shapes, xp=_ShapeSwap)


def _qkv(cfg, p, y, cooked=False, act8=False, q4k=False):
    b, s, _ = y.shape
    h, hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    q = _pj(p, "q_w", y, cooked, act8, q4k).reshape(b, s, h, hd).transpose(0, 2, 1, 3)
    k = _pj(p, "k_w", y, cooked, act8, q4k).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    v = _pj(p, "v_w", y, cooked, act8, q4k).reshape(b, s, hkv, hd).transpose(0, 2, 1, 3)
    return q, k, v


def _attend(q, k, v, bias):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * (q.shape[-1] ** -0.5) + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _quantize_kv(x, qmax: float = 127.0, dtype=jnp.int8):
    """Per-(batch, head, position) symmetric quantization over the head dim:
    [B, H, T, hd] -> (int array same shape, f32 scale [B, H, T]). qmax=127
    int8 (the KV default); qmax=7 int4 (the V side of kv_cache='int4' —
    per-position V scales stay EXACT at any bit width because they fold into
    the probs, _attend_kv8/_attend_kv4)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    return jnp.clip(q, -qmax, qmax).astype(dtype), scale


def _kv4_group_size(hd: int) -> int:
    """Group size for the K side of the int4 KV cache: 32 channels per scale
    on the 7B (hd=128 -> 4 groups, the KIVI-style grouping that keeps key
    outlier channels from poisoning a whole row's scale), clamped to hd//2 on
    small heads so the grouped math stays exercised."""
    gs = max(1, min(32, hd // 2))
    return gs if hd % gs == 0 else hd


def _quantize_k4(x, gs: int):
    """K side of kv_cache='int4': symmetric int4 with GROUPED scales along
    the head dim — [B, H, T, hd] -> (int4 same shape, f32 scale
    [B, H, T, hd/gs]). Per-position scales are exact for V but NOT for K
    (the score contraction runs over hd, so K's scale must be constant per
    contraction GROUP to dequantize exactly — _attend_kv4 contracts per
    group); grouping also bounds the fidelity cost of 4-bit keys."""
    b, h, t, hd = x.shape
    g = hd // gs
    xg = x.astype(jnp.float32).reshape(b, h, t, g, gs)
    absmax = jnp.max(jnp.abs(xg), axis=-1)                    # [B,H,T,G]
    scale = jnp.maximum(absmax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(xg / scale[..., None]), -7.0, 7.0)
    return q.reshape(b, h, t, hd).astype(jnp.int4), scale


def _attend_kv8(q, k8, sk, v8, sv, bias):
    """Attention over an int8 KV cache with per-position scales — exact
    dequantization with ZERO extra matmuls, both scales being constant over
    their contraction dims:
      scores = (q @ k^T) = (q @ k8^T) * sk   (sk per key position/head)
      out    = probs @ v = (probs * sv) @ v8 (sv folds into the probs)
    The MXU sees int8->bf16 operand reads (HBM streams half the cache bytes);
    the scales are [B, H, T] f32 — noise next to the [B, H, T, hd] cache."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k8.astype(q.dtype),
        preferred_element_type=jnp.float32,
    )
    scores = scores * sk[:, :, None, :] * (q.shape[-1] ** -0.5) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    probs = (probs * sv[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v8.astype(q.dtype))


def _attend_kv4(q, k4, sk, v4, sv, bias):
    """Attention over an int4 KV cache, split by side:
      K (grouped scales [B,H,T,G] along hd): dequantize IN-REGISTER — a
        static minor-dim split, the scale broadcast-multiply, and the merge
        back are elementwise, so XLA fuses them into the score matmul's
        operand read and HBM streams the packed s4 cache bytes. (The
        round-4 form contracted q@k4^T per group and scaled [B,H,Q,T,G]
        partials — exact, but the grouped-batch einsum forces transposed
        layouts, the same pathology measured 7x on the int4 weight path;
        the fidelity delta here is only the activation-dtype rounding of
        dequantized K values, zero on pow2-scale grids.)
      V (per-position scales [B,H,T]): fold sv into the probs — exact at any
        bit width since the output contraction runs over T."""
    hd = q.shape[-1]
    g = sk.shape[-1]
    kd = (
        k4.astype(jnp.float32).reshape(k4.shape[:-1] + (g, hd // g))
        * sk[..., None]
    ).reshape(k4.shape).astype(q.dtype)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, kd, preferred_element_type=jnp.float32
    )
    scores = scores * (hd ** -0.5) + bias
    probs = jax.nn.softmax(scores, axis=-1)
    probs = (probs * sv[:, :, None, :]).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v4.astype(q.dtype))


def _mlp(cfg, p, x, cooked=False, act8=False, q4k=False):
    y = rms_norm(x, p["mlp_norm"], cfg.rms_eps)
    gate = jax.nn.silu(
        _pj(p, "gate_w", y, cooked, act8, q4k).astype(jnp.float32)
    ).astype(x.dtype)
    return x + _pj(
        p, "down_w", gate * _pj(p, "up_w", y, cooked, act8, q4k),
        cooked, act8, q4k,
    )


class DecodeResult(NamedTuple):
    tokens: jnp.ndarray   # [B, ACTION_DIM] generated token ids
    actions: jnp.ndarray  # [B, ACTION_DIM] normalized continuous actions
    # number of Jacobi verification passes the decode tail ran (scalar int32;
    # None on the sequential path). 1 = the draft was accepted whole — the
    # serving observability signal for draft quality (prior-action drafts
    # degrade when the scene changes fast)
    verify_passes: Optional[jnp.ndarray] = None


def greedy_decode_actions(
    params: Dict,
    cfg: VLAConfig,
    input_ids: jnp.ndarray,        # [B, S] right-padded prompt (ends with 29871 at true_len)
    attention_mask: jnp.ndarray,   # [B, S]
    pixel_values: jnp.ndarray,     # [B, 2, H, W, 3] normalized
    num_steps: int = ACTION_DIM,
    cooked_weights: bool = False,  # params went through decode_layout_params
    mesh=None,                     # jax.sharding.Mesh with a 'model' axis for TP serving
    kv_cache: Optional[str] = None,  # None (model dtype), 'int8', or 'int4'
    draft_tokens: Optional[jnp.ndarray] = None,  # [B, num_steps] Jacobi draft
    visual_tokens: Optional[int] = None,  # keep top-k patch tokens (prefill pruning)
    act_quant: Optional[str] = None,  # 'int8': w8a8 prefill (needs int8 weights)
    int4_kernel: bool = False,  # fused Pallas dequant-matmul decode tail
) -> DecodeResult:
    """Greedy multimodal generation of `num_steps` action tokens.

    `mesh`: tensor-parallel serving over the mesh's 'model' axis. Params must
    be placed with parallel.sharding.decode_param_specs (Megatron column/row
    splits on the cooked stacks); the KV cache is pinned head-sharded here so
    the whole prefill+decode runs without ever gathering a weight or cache —
    per decode step the only collectives are two [B,1,D] psums (o_proj /
    down_proj row-parallel) and the [B,1,V] logit gather for the argmax. This
    is the capability the reference scales only by big-GPU HBM
    (modeling_prismatic.py:506-534): one 15.75 GB v5e fits bs<=4; tp=2 halves
    the 13 GB weight arguments per chip and bs=8 fits (tests/test_decode_tp).

    `kv_cache='int8'`: store the cache int8 with per-(batch, head, position)
    f32 scales — halves the next memory/bandwidth bill after weight
    quantization (the 7B cache is ~2.7 GB at bs=16, ~5.5 at bs=32).
    Dequantization is exact around both attention matmuls (_attend_kv8); the
    fidelity cost is only the int8 rounding of each K/V row. Prefill
    attention runs on the full-precision K/V (they are live in registers);
    the first generated token is therefore bit-identical to the unquantized
    program, and only the 6 cached decode steps see quantized keys.

    `kv_cache='int4'`: packed-s4 cache, quartering the bf16 cache bytes —
    K with GROUPED scales along the head dim (32 channels/scale on the 7B,
    the KIVI-style split that keeps key outliers from poisoning a row;
    dequantized exactly by per-group contraction, _attend_kv4) and V with
    per-position scales (exact fold into the probs at any bit width). Same
    prefill-full-precision property: the first token is bit-identical.

    `draft_tokens` [B, num_steps]: run the decode tail as JACOBI fixed-point
    verification passes instead of num_steps-1 sequential steps
    (self-speculative decoding — no draft model). Each pass pushes all
    num_steps draft positions through the stack at once (one s=7 pass costs
    ~one s=1 step in the weight-streaming-bound regime), reads the greedy
    token at every position, and feeds the outputs back as the next draft;
    position i is provably exact after i passes, so the loop converges in
    <= num_steps-1 passes — never slower than the sequential tail — and a
    fully-correct draft verifies in ONE pass (~6x fewer weight streams on
    the 7-token action decode). Robot control loops have exactly such
    drafts: consecutive control steps mostly repeat the previous action's
    tokens (pass the prior DecodeResult.tokens; eval/policy.py threads
    this). Result tokens are the fixed point of the verification pass's own
    greedy operator — bit-identical to the sequential path up to s=1-vs-s=7
    matmul accumulation order (tests/test_decode_jacobi.py pins equality on
    the tiny model). Position 0 ignores the draft (the prefill argmax is
    already exact). The reference has no speculative path at all — its
    `generate` is 7 sequential HF steps (modeling_prismatic.py:506-534).

    `visual_tokens=k`: keep only the k most salient patch tokens (projected
    feature norm, training-free) BEFORE the LLM — the multimodal prefill is
    the FLOP bill at batched serving (256 of ~290 prefill tokens are
    patches), so k=128 roughly halves LLM prefill compute AND the KV cache
    length. Pruning pre-LLM keeps the stacked layer scan intact (slicing
    scan weight stacks materializes multi-GB copies — CLAUDE.md) and
    compacts positions, so everything downstream (quantized caches, TP,
    Jacobi drafts) composes unchanged. UNLIKE every other serving lever
    here this one is LOSSY: the dropped tokens change the computation.
    k == num_patches is bit-identical to no pruning (pinned in tests);
    accuracy at k < num_patches is weight-dependent — validate on real
    checkpoints with the acceptance gate / a LIBERO A/B before production
    (same stance as quantization accuracy, egress-gated here).

    `act_quant='int8'` (the policy-level `quantize='w8a8'`): dynamically
    quantize the PREFILL projections' activations per token and contract
    int8 x int8 -> int32 on the MXU's double-rate integer path — the
    multimodal prefill is the FLOP bill at batched serving (v5e: 394 int8
    TOPS vs 197 bf16, so w8a8 roughly halves it where weight-only int8 only
    halves the bytes). Requires per-channel int8 weights
    (quantize_decode_params mode='int8'); the bandwidth-bound decode tail
    (cached steps AND Jacobi verification passes) stays weight-only, so
    everything after the first generated token is the weight-only int8
    computation. LOSSY like visual_tokens (activation rounding) — validate
    on real checkpoints via the acceptance gate's w8a8 mode. Composes with
    TP: as long as XLA all-reduces the INTEGER partials, int32 addition is
    exact and w8a8 TP == w8a8 single-chip bit-identically — the virtual-mesh
    lowering does (s32 psums pinned in tests/test_multichip_7b_shapes.py;
    an f32 lowering would round partials > 2^24) and the topology-AOT
    evidence leg records the real-TPU psum dtype. Also composes with
    kv_cache, drafts, and vt pruning. The reference has no quantized path at
    all (modeling_prismatic.py:506-534 runs bf16 HF generate).

    `int4_kernel=True` (packed-int4 weights only): route the decode tail's
    projections (sequential s=1 steps and Jacobi s=7 passes) through the
    fused Pallas dequant-matmul kernel (ops/q4_matmul.py) instead of the
    XLA formulation — the unpack/dequant/contract chain runs inside one
    kernel with HBM reads pinned to the packed bytes. Single-device
    programs only (the kernel has no GSPMD partitioning rules; a model>1
    mesh raises). Prefill and the lm_head keep the XLA path (FLOP-bound /
    different packed layout). Topology-AOT evidence legs cannot emit Pallas
    (parallel/evidence.py precedent: flash attention substitutes chunked)
    and keep int4_kernel=False — their memory facts cover the XLA
    formulation; measured kernel throughput lives in
    SERVING_EVIDENCE.json."""
    from .config import PhiConfig

    if isinstance(cfg.llm, PhiConfig):
        raise NotImplementedError(
            "predict_action targets the OpenVLA (Llama-family) stack; the "
            "Phi-2 zoo VLM is a forward/CE model, not an action policy"
        )
    lcfg = cfg.llm
    dtype = jnp.dtype(cfg.dtype)
    b, s = input_ids.shape
    p_llm = params["llm"]

    # Guard against a mislabeled cooked flag: for square projections (7B
    # q_w/o_w are 4096x4096) the wrong flag silently computes y@W^T with no
    # shape error and returns garbage actions. gate_w is never square in any
    # Llama-family config (intermediate_size != hidden_size), so its layout
    # identifies the pytree: storage [L, hidden, inter] vs cooked
    # [L, inter, hidden]. Shapes are static, so this costs nothing under jit.
    if jnp.dtype(p_llm["layers"]["q_w"].dtype) == jnp.int8 and not cooked_weights:
        # int8 and packed-int4 stacks are both int8 bytes (models/quant.py)
        raise ValueError(
            "int8/int4-quantized params (quantize_decode_params output) are "
            "always in the cooked layout; pass cooked_weights=True"
        )
    # packed grouped int4 halves the contraction (last) axis of every stack
    # (two s4 per byte) — detected by scale rank == stack rank
    _qsc = p_llm["layers"].get("q_w_scale")
    packed4 = _qsc is not None and _qsc.ndim == p_llm["layers"]["q_w"].ndim
    if act_quant not in (None, "int8"):
        raise ValueError(f"act_quant={act_quant!r}; supported: None, 'int8'")
    act8 = act_quant == "int8"
    # fused Pallas dequant-matmul tail (ops/q4_matmul.py): single-device
    # int4 programs only — the kernel has no GSPMD partitioning rules, so a
    # tp>1 mesh would silently gather the stacks it was built to stream
    q4k = bool(int4_kernel) and packed4
    if q4k and mesh is not None and mesh.shape.get("model", 1) > 1:
        raise ValueError(
            "int4_kernel=True is single-device only (no custom_partitioning "
            "rules); drop the kernel or the 'model' mesh axis"
        )
    if act8:
        qsc = p_llm["layers"].get("q_w_scale")
        if jnp.dtype(p_llm["layers"]["q_w"].dtype) != jnp.int8 or (
            qsc is not None and qsc.ndim != 2
        ):
            raise ValueError(
                "act_quant='int8' (w8a8) needs per-channel int8 weights — "
                "run quantize_decode_params(mode='int8') first (int4's "
                "grouped scales have no int8 x int8 contraction form)"
            )
    gw = p_llm["layers"]["gate_w"].shape
    want = (
        (lcfg.intermediate_size, lcfg.hidden_size // (2 if packed4 else 1))
        if cooked_weights
        else (lcfg.hidden_size, lcfg.intermediate_size)
    )
    if tuple(gw[-2:]) != want:
        raise ValueError(
            f"cooked_weights={cooked_weights} but gate_w has layout "
            f"{tuple(gw[-2:])}, expected {want} — the params pytree "
            f"{'was not' if cooked_weights else 'was already'} run through "
            "decode_layout_params (or was cooked twice)"
        )

    patches = vision_features(params["vision"], cfg, pixel_values)
    projected = projector_apply(params["projector"], patches).astype(dtype)
    if visual_tokens is not None:
        nv = projected.shape[1]
        if not 1 <= visual_tokens <= nv:
            raise ValueError(
                f"visual_tokens={visual_tokens} must be in [1, {nv}] "
                f"(the model produces {nv} patch tokens)"
            )
        if visual_tokens < nv:
            # saliency = projected-embedding norm per patch (training-free;
            # high-norm tokens carry the signal the LLM attends to). top_k
            # has a STATIC k, so one compiled program serves any image;
            # sorting the kept indices preserves raster order, which keeps
            # visual_tokens == num_patches an identity (bit-parity pinned)
            sal = jnp.linalg.norm(projected.astype(jnp.float32), axis=-1)
            idx = jnp.sort(jax.lax.top_k(sal, visual_tokens)[1], axis=-1)
            projected = jnp.take_along_axis(projected, idx[..., None], axis=1)
    emb = _embed_rows(p_llm, input_ids, dtype)
    mm_emb = jnp.concatenate([emb[:, :1], projected, emb[:, 1:]], axis=1)  # [B, T0, D]
    t0 = mm_emb.shape[1]
    num_patches = projected.shape[1]
    true_len = jnp.sum(attention_mask, axis=1)          # text tokens per row
    last_idx = num_patches + true_len - 1               # last real prefix slot

    ones = jnp.ones((b, num_patches), dtype=attention_mask.dtype)
    mm_mask = jnp.concatenate(
        [attention_mask[:, :1], ones, attention_mask[:, 1:]], axis=1
    )  # [B, T0]

    total = t0 + num_steps
    cos_all, sin_all = rope_cos_sin(jnp.arange(total), lcfg.head_dim, lcfg.rope_theta)

    # --- prefill: run all blocks, collecting K/V ---------------------------------
    causal = jnp.tril(jnp.ones((t0, t0), bool))
    prefix_bias = jnp.where(
        causal[None, None] & mm_mask[:, None, None, :].astype(bool), 0.0, NEG_INF
    )

    # cache: [L, B, Hkv, total, hd], allocated ONCE at full size and written
    # in place inside the prefill scan. Stacking per-layer (k, v) ys and
    # concatenating zero pads afterwards made XLA hold the cache in 2-3
    # layouts simultaneously (~590 MB each at bs=6) — the allocation that
    # capped single-chip decode at bs<=4.
    if kv_cache not in (None, "int8", "int4"):
        raise ValueError(
            f"kv_cache={kv_cache!r}; supported: None, 'int8', 'int4'"
        )
    kv8 = kv_cache == "int8"
    kv4 = kv_cache == "int4"
    kvq = kv8 or kv4
    gs4 = _kv4_group_size(lcfg.head_dim) if kv4 else None
    nl = lcfg.num_layers
    cache_k = jnp.zeros(
        (nl, b, lcfg.num_kv_heads, total, lcfg.head_dim),
        dtype=jnp.int8 if kv8 else (jnp.int4 if kv4 else mm_emb.dtype),
    )
    cache_v = jnp.zeros_like(cache_k)
    # dequantization scales — per (batch, head, position), plus a trailing
    # head-dim GROUP axis on the int4 K side (_quantize_k4); zero on
    # never-written slots is safe: those positions are NEG_INF-masked in
    # every bias
    sv_shape = (nl, b, lcfg.num_kv_heads, total)
    sk_shape = sv_shape + ((lcfg.head_dim // gs4,) if kv4 else ())
    scale_k = jnp.zeros(sk_shape, jnp.float32) if kvq else None
    scale_v = jnp.zeros(sv_shape, jnp.float32) if kvq else None

    def _q_kv(k, v):
        """Quantize one layer's fresh K/V rows per the cache mode."""
        if kv8:
            (k, sk), (v, sv) = _quantize_kv(k), _quantize_kv(v)
        else:
            k, sk = _quantize_k4(k, gs4)
            v, sv = _quantize_kv(v, 7.0, jnp.int4)
        return k, sk, v, sv

    def _attend_c(q, ck, sk, cv, sv, bias):
        """Attention over the (possibly quantized) cache."""
        if kv8:
            return _attend_kv8(q, ck, sk, cv, sv, bias)
        if kv4:
            return _attend_kv4(q, ck, sk, cv, sv, bias)
        return _attend(q, ck, cv, bias)
    if mesh is not None and "model" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        tp = mesh.shape["model"]
        dp = mesh.shape.get("data", 1)
        if tp == 1 and dp > 1:
            # pure data-parallel serving: no weight splits, but the cache's
            # BATCH axis must still be pinned to the data axis — an unpinned
            # zeros-initialized cache can propagate to replicated and
            # silently hold (and all-gather) the full batch on every chip
            kv_sharding = NamedSharding(mesh, P(None, "data", None, None, None))
            cache_k = jax.lax.with_sharding_constraint(cache_k, kv_sharding)
            cache_v = jax.lax.with_sharding_constraint(cache_v, kv_sharding)
            if kvq:
                sv_sh = NamedSharding(mesh, P(None, "data", None, None))
                sk_sh = (
                    NamedSharding(mesh, P(None, "data", None, None, None))
                    if kv4 else sv_sh
                )
                scale_k = jax.lax.with_sharding_constraint(scale_k, sk_sh)
                scale_v = jax.lax.with_sharding_constraint(scale_v, sv_sh)
        if tp > 1:
            if lcfg.num_kv_heads % tp:
                raise ValueError(
                    f"decode TP needs num_kv_heads ({lcfg.num_kv_heads}) "
                    f"divisible by the 'model' axis size ({tp})"
                )
            # int4 grouped scales on the ROW-parallel stacks shard their
            # GROUPS over the contraction split; a shard boundary inside a
            # group would make GSPMD fall back to gathering the stack —
            # silent and tensor-sized, so reject it loudly
            for k in ("o_w", "down_w"):
                sc = p_llm["layers"].get(k + "_scale")
                if sc is not None and sc.ndim == 3:
                    # packed s4: the stored last axis is contraction/2
                    in_dim = 2 * p_llm["layers"][k].shape[-1]
                    gs = in_dim // sc.shape[-1]
                    if (in_dim // tp) % gs:
                        raise ValueError(
                            f"int4 decode TP: {k}'s contraction per chip "
                            f"({in_dim}/{tp}) is not a multiple of the "
                            f"quantization group size ({gs}); re-quantize "
                            f"with a group_size dividing {in_dim // tp} "
                            f"(e.g. 64)"
                        )
            # pin the cache head-sharded (and batch-sharded when the mesh has
            # a data axis — else dp>1 serving would hold the FULL-batch cache
            # on every chip and gather the data-sharded k/v into it):
            # GSPMD would usually propagate this from the column-split k/v
            # projections, but the scan carry's fixed-point pass is
            # shape-dependent (flash_attention.py:29-33 precedent) — an
            # unpinned cache falling back to replicated would silently
            # all-gather [L,B,Hkv,total,hd] every step
            batch_axis = "data" if "data" in mesh.axis_names else None
            kv_sharding = NamedSharding(mesh, P(None, batch_axis, "model", None, None))
            cache_k = jax.lax.with_sharding_constraint(cache_k, kv_sharding)
            cache_v = jax.lax.with_sharding_constraint(cache_v, kv_sharding)
            if kvq:  # scales follow their cache slices (head-sharded)
                sv_sh = NamedSharding(mesh, P(None, batch_axis, "model", None))
                sk_sh = (
                    NamedSharding(mesh, P(None, batch_axis, "model", None, None))
                    if kv4 else sv_sh
                )
                scale_k = jax.lax.with_sharding_constraint(scale_k, sk_sh)
                scale_v = jax.lax.with_sharding_constraint(scale_v, sv_sh)

    def prefill_block(carry, inp):
        x, ck, cv, sk, sv = carry
        p, li = inp
        y = rms_norm(x, p["attn_norm"], lcfg.rms_eps)
        # act8: the prefill is the one FLOP-bound phase — its 7 projections
        # run the MXU's double-rate int8 path under w8a8
        q, k, v = _qkv(lcfg, p, y, cooked_weights, act8)
        q, k = apply_rope(q, k, cos_all[:t0], sin_all[:t0])
        # prefill attends over the live full-precision K/V; quantization (if
        # any) applies only to what the cached decode steps will re-read
        attn = _attend(q, k, v, prefix_bias)
        x = x + _pj(p, "o_w", attn.transpose(0, 2, 1, 3).reshape(x.shape),
                    cooked_weights, act8)
        x = _mlp(lcfg, p, x, cooked_weights, act8)
        if kvq:
            k, sk_l, v, sv_l = _q_kv(k, v)
            sk = jax.lax.dynamic_update_slice(
                sk, sk_l[None], (li,) + (0,) * (sk.ndim - 1)
            )
            sv = jax.lax.dynamic_update_slice(sv, sv_l[None], (li, 0, 0, 0))
        ck = jax.lax.dynamic_update_slice(ck, k[None].astype(ck.dtype), (li, 0, 0, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v[None].astype(cv.dtype), (li, 0, 0, 0, 0))
        return (x, ck, cv, sk, sv), None

    (hidden, cache_k, cache_v, scale_k, scale_v), _ = jax.lax.scan(
        prefill_block, (mm_emb, cache_k, cache_v, scale_k, scale_v),
        (p_llm["layers"], jnp.arange(nl)),
    )
    hidden = rms_norm(hidden, p_llm["norm"], lcfg.rms_eps)
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)  # [B,1,D]
    logits = _lm_logits(p_llm, last_hidden)
    first_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B]

    slot_ids = jnp.arange(total)
    prefix_valid = jnp.concatenate(
        [mm_mask.astype(bool), jnp.zeros((b, num_steps), bool)], axis=1
    )  # [B, total] — real prefix slots (draft/decode slots handled per step)

    # --- Jacobi verification tail (draft_tokens given) ----------------------------
    if draft_tokens is not None:
        if tuple(draft_tokens.shape) != (b, num_steps):
            raise ValueError(
                f"draft_tokens shape {tuple(draft_tokens.shape)}; expected "
                f"{(b, num_steps)} (one draft token per decode position)"
            )
        n = num_steps
        d0 = jnp.concatenate(
            [first_token[:, None], draft_tokens.astype(jnp.int32)[:, 1:]], axis=1
        )
        pos = num_patches + true_len[:, None] + jnp.arange(n)[None, :]  # [B, n]
        cos_j = jnp.take(cos_all, pos, axis=0)  # [B, n, hd]
        sin_j = jnp.take(sin_all, pos, axis=0)
        # query i sees the prefix + draft slots t0..t0+i (causal inside the
        # draft block; later slots hold this pass's k/v too but are masked)
        draft_visible = (slot_ids[None, :] >= t0) & (
            slot_ids[None, :] <= t0 + jnp.arange(n)[:, None]
        )  # [n, total]
        j_bias = jnp.where(
            prefix_valid[:, None, :] | draft_visible[None], 0.0, NEG_INF
        )[:, None]  # [B, 1, n, total]

        def verify_block(inner, inp):
            # The FULL cache rides the layer-scan CARRY and is updated in
            # place at (layer, t0) — passing per-layer cache slices as scan
            # xs and re-stacking them as ys (the round-4 form) made XLA hold
            # the whole [L,B,Hkv,total,hd] cache in ~3 simultaneous buffers
            # (input stack + output stack + loop double-buffer): the measured
            # ~2.9x-cache-size temp bill that capped single-chip decode
            # (MULTICHIP_EVIDENCE tpu_decode_int4_kv8_1chip_bs32 temps
            # 11.7 GB vs 2.5 GB of cache). A carry DUS aliases in place;
            # the per-layer read is a [B,Hkv,total,hd] dynamic slice that
            # fuses into the attention operand reads.
            xc, ck, cv, sk, sv = inner
            p, li = inp
            y = rms_norm(xc, p["attn_norm"], lcfg.rms_eps)
            q, k, v = _qkv(lcfg, p, y, cooked_weights, q4k=q4k)
            q, k = apply_rope(q, k, cos_j, sin_j)
            if kvq:
                k, sk_new, v, sv_new = _q_kv(k, v)
                sk = jax.lax.dynamic_update_slice(
                    sk, sk_new[None], (li, 0, 0, t0) + (0,) * (sk.ndim - 4)
                )
                sv = jax.lax.dynamic_update_slice(sv, sv_new[None], (li, 0, 0, t0))
            ck = jax.lax.dynamic_update_slice(
                ck, k[None].astype(ck.dtype), (li, 0, 0, t0, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (li, 0, 0, t0, 0)
            )
            ck_l = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            cv_l = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            sk_l = jax.lax.dynamic_index_in_dim(sk, li, 0, keepdims=False) if kvq else None
            sv_l = jax.lax.dynamic_index_in_dim(sv, li, 0, keepdims=False) if kvq else None
            attn = _attend_c(q, ck_l, sk_l, cv_l, sv_l, j_bias)
            xc = xc + _pj(p, "o_w", attn.transpose(0, 2, 1, 3).reshape(xc.shape),
                          cooked_weights, q4k=q4k)
            xc = _mlp(lcfg, p, xc, cooked_weights, q4k=q4k)
            return (xc, ck, cv, sk, sv), None

        def jacobi_body(carry):
            d, _, it, ck, cv, sk, sv = carry
            x = _embed_rows(p_llm, d, dtype)  # [B, n, D]
            (x, ck, cv, sk, sv), _ = jax.lax.scan(
                verify_block, (x, ck, cv, sk, sv),
                (p_llm["layers"], jnp.arange(nl)),
            )
            h = rms_norm(x, p_llm["norm"], lcfg.rms_eps)
            out = jnp.argmax(_lm_logits_all(p_llm, h), axis=-1).astype(jnp.int32)
            # out[:, i] = greedy token AFTER consuming d[:, :i+1]; position 0
            # stays the prefill argmax (exact by construction)
            new_d = jnp.concatenate([d[:, :1], out[:, :-1]], axis=1)
            return new_d, jnp.any(new_d != d), it + jnp.int32(1), ck, cv, sk, sv

        def jacobi_cond(carry):
            _, changed, it, *_ = carry
            # position i is exact after i passes -> all n positions are
            # provably exact after n-1 passes even if `changed` is still True
            # (the last pass fixed position n-1); never run a pass the
            # sequential tail wouldn't have
            return changed & (it < n - 1)

        init = (d0, jnp.bool_(True), jnp.int32(0),
                cache_k, cache_v, scale_k, scale_v)
        if n > 1:
            d_fix, _, passes, *_ = jax.lax.while_loop(
                jacobi_cond, jacobi_body, init
            )
        else:
            d_fix, passes = d0, jnp.int32(0)
        return _detokenize(cfg, d_fix, verify_passes=passes)

    # --- cached decode steps -------------------------------------------------------
    def step(carry, i):
        token, ck, cv, sk, sv = carry
        pos = num_patches + true_len + i              # [B] rope position of this token
        x = _embed_rows(p_llm, token, dtype)[:, None, :]  # [B, 1, D]
        cos = jnp.take(cos_all, pos, axis=0)[:, None, :]  # [B,1,hd]
        sin = jnp.take(sin_all, pos, axis=0)[:, None, :]

        # keys valid: real prefix slots OR decode slots <= current
        decode_valid = (slot_ids[None, :] >= t0) & (slot_ids[None, :] <= t0 + i)
        bias = jnp.where(prefix_valid | decode_valid, 0.0, NEG_INF)[:, None, None, :]

        def block(inner, inp):
            # full cache in the CARRY, in-place (layer, position) DUS — see
            # verify_block for why (the ys-restack form tripled cache temps)
            xc, ck, cv, sk, sv = inner
            p, li = inp
            y = rms_norm(xc, p["attn_norm"], lcfg.rms_eps)
            q, k, v = _qkv(lcfg, p, y, cooked_weights, q4k=q4k)
            q, k = apply_rope(q, k, cos, sin)
            if kvq:
                k, sk_new, v, sv_new = _q_kv(k, v)
                sk = jax.lax.dynamic_update_slice(
                    sk, sk_new[None], (li, 0, 0, t0 + i) + (0,) * (sk.ndim - 4)
                )
                sv = jax.lax.dynamic_update_slice(
                    sv, sv_new[None], (li, 0, 0, t0 + i)
                )
            ck = jax.lax.dynamic_update_slice(
                ck, k[None].astype(ck.dtype), (li, 0, 0, t0 + i, 0)
            )
            cv = jax.lax.dynamic_update_slice(
                cv, v[None].astype(cv.dtype), (li, 0, 0, t0 + i, 0)
            )
            ck_l = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
            cv_l = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
            sk_l = jax.lax.dynamic_index_in_dim(sk, li, 0, keepdims=False) if kvq else None
            sv_l = jax.lax.dynamic_index_in_dim(sv, li, 0, keepdims=False) if kvq else None
            attn = _attend_c(q, ck_l, sk_l, cv_l, sv_l, bias)
            xc = xc + _pj(p, "o_w", attn.transpose(0, 2, 1, 3).reshape(xc.shape),
                          cooked_weights, q4k=q4k)
            xc = _mlp(lcfg, p, xc, cooked_weights, q4k=q4k)
            return (xc, ck, cv, sk, sv), None

        (x, ck, cv, sk, sv), _ = jax.lax.scan(
            block, (x, ck, cv, sk, sv), (p_llm["layers"], jnp.arange(nl))
        )
        h = rms_norm(x, p_llm["norm"], lcfg.rms_eps)
        logits = _lm_logits(p_llm, h)
        next_token = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (next_token, ck, cv, sk, sv), token

    (final_token, _, _, _, _), emitted = jax.lax.scan(
        step, (first_token, cache_k, cache_v, scale_k, scale_v),
        jnp.arange(num_steps - 1),
    )
    # emitted = tokens fed at steps 0..num_steps-2 = generated tokens 0..num_steps-2
    tokens = jnp.concatenate([emitted.T, final_token[:, None]], axis=1)  # [B, num_steps]
    return _detokenize(cfg, tokens)


def _detokenize(cfg, tokens, verify_passes=None):
    """Tokens -> normalized actions (modeling_prismatic.py:521-524): action
    vocab excludes pad rows; clip + bin-center lookup."""
    action_vocab = cfg.action_vocab_size
    discretized = jnp.clip(action_vocab - tokens - 1, 0, BIN_CENTERS.shape[0] - 1)
    centers = jnp.asarray(BIN_CENTERS, jnp.float32)
    actions = centers[discretized]
    return DecodeResult(tokens=tokens, actions=actions, verify_passes=verify_passes)


def ensure_trailing_empty_token(
    input_ids: np.ndarray, attention_mask: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side: append 29871 after 'Out:' if missing
    (modeling_prismatic.py:512-515), per row, preserving right padding."""
    ids = np.array(input_ids)
    mask = np.array(attention_mask)
    out_ids, out_mask = [], []
    for row_ids, row_mask in zip(ids, mask):
        n = int(row_mask.sum())
        if n == 0 or row_ids[n - 1] != EMPTY_TOKEN_ID:
            row_ids = np.concatenate([row_ids[:n], [EMPTY_TOKEN_ID], row_ids[n:]])[: len(row_ids) + 1]
            row_mask = np.concatenate([row_mask[:n], [1], row_mask[n:]])[: len(row_mask) + 1]
        out_ids.append(row_ids)
        out_mask.append(row_mask)
    width = max(len(r) for r in out_ids)
    out_ids = [np.pad(r, (0, width - len(r)), constant_values=32000) for r in out_ids]
    out_mask = [np.pad(r, (0, width - len(r))) for r in out_mask]
    return np.stack(out_ids).astype(np.int32), np.stack(out_mask).astype(np.int32)


def unnormalize_actions(actions: np.ndarray, norm_stats: Dict, unnorm_key: Optional[str] = None) -> np.ndarray:
    """q01/q99 unnormalization with mask (modeling_prismatic.py:527-534)."""
    if unnorm_key is None:
        assert len(norm_stats) == 1, f"pass unnorm_key; options: {list(norm_stats)}"
        unnorm_key = next(iter(norm_stats))
    st = norm_stats[unnorm_key]["action"]
    q01 = np.asarray(st["q01"], np.float64)
    q99 = np.asarray(st["q99"], np.float64)
    mask = np.asarray(st.get("mask", np.ones_like(q01, bool)))
    return np.where(mask, 0.5 * (actions + 1.0) * (q99 - q01) + q01, actions)
