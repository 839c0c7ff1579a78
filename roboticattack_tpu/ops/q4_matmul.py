"""Fused int4 dequant-matmul Pallas kernel for the decode tail.

The serving primitive this accelerates is the weight-streaming-bound decode
step of `predict_action` (reference: the 7 greedy HF `generate` steps,
/root/reference/prismatic/extern/hf/modeling_prismatic.py:506-536). With
grouped-int4 weights the XLA formulation (models/decode.py _proj) streams
packed s4 bytes but spends its time in the dequant chain XLA schedules
around the matmul; this kernel pins the whole chain —

    HBM --(packed s4 bytes only)--> VMEM --unpack/deq in-register--> MXU

— so per decode step each weight is read as HALF a byte and every
intermediate (nibble halves, dequantized tiles, group partials) lives and
dies in VMEM. Layout contract matches models/quant.py exactly: weights
[out, in/2] int8 with channel 2j in the low nibble and 2j+1 in the high
(contraction-axis packing, pairs never straddle a quantization group),
scales f32 [out, G] grouped over the contraction dim.

Numerics: the kernel contracts the RAW s4 integers in bf16 (integers up to
magnitude 8 are exact in bf16) against the even/odd activation splits and
applies the group scale to the f32 PARTIAL sums — the "exact grouped"
scheme. This is mathematically the scale-then-contract order with f32
group accumulation, i.e. at least as faithful as the XLA path's
bf16-rounded dequantized weights; tests pin both against the f32
reference dequant.

Scope: single-device programs only (the TP serving path keeps the XLA
formulation — a custom_partitioning wrapper would be needed to teach GSPMD
this kernel's sharding, and int4's value on this pod is the single-chip fit
envelope). Engaged via greedy_decode_actions(int4_kernel=True), resolved by
callers as "TPU && no mesh && int4 weights".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _unpack_nibbles_f32(w):
    """Packed s4 byte -> (low, high) signed nibble values as exact f32.

    Mosaic (the Pallas TPU compiler) cannot legalize `arith.shli` on int8
    vectors (measured on-chip round 5: "failed to legalize operation
    'arith.shli'"), so the bit-twiddling unpack models/quant.py uses under
    XLA is re-expressed as float arithmetic: every intermediate is an
    integer of magnitude <= 128, exact in f32, so this is bit-identical to
    the shift formulation. high = floor(w / 16) IS the arithmetic right
    shift (floor division matches sign extension); the remainder is the
    unsigned low nibble, re-signed by subtracting 16 from values >= 8."""
    wf = w.astype(jnp.float32)
    hi = jnp.floor(wf * 0.0625)              # == w >> 4 (arithmetic)
    m = wf - 16.0 * hi                       # unsigned low nibble, 0..15
    lo = m - jnp.where(m >= 8.0, 16.0, 0.0)  # sign-extend
    return lo, hi


def _kernel_grouped(ye_ref, yo_ref, w_ref, sct_ref, out_ref, *, n_groups,
                    gsz2, op_dtype):
    """Per-group partial scaling: for each quantization group g, contract the
    64-packed-lane slice of both nibble halves and scale the [M, TILE_O]
    f32 partial by the group's scale row. All slices are static (Mosaic
    handles sub-lane-tile static offsets); the unrolled loop keeps every
    partial in registers/VMEM."""
    lo, hi = _unpack_nibbles_f32(w_ref[:])   # channels 2j / 2j+1
    lo = lo.astype(op_dtype)
    hi = hi.astype(op_dtype)
    ye = ye_ref[:].astype(op_dtype)
    yo = yo_ref[:].astype(op_dtype)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    dn = (((1,), (1,)), ((), ()))  # contract dim 1 of both operands
    for g in range(n_groups):
        s = slice(g * gsz2, (g + 1) * gsz2)
        pe = jax.lax.dot_general(
            ye[:, s], lo[:, s], dn, preferred_element_type=jnp.float32
        )
        po = jax.lax.dot_general(
            yo[:, s], hi[:, s], dn, preferred_element_type=jnp.float32
        )
        acc = acc + (pe + po) * sct_ref[g : g + 1, :]  # [1, TILE_O] bcast
    out_ref[:] = acc.astype(out_ref.dtype)


def _kernel_dense(ye_ref, yo_ref, w_ref, sct_ref, out_ref, *, n_groups,
                  gsz2, op_dtype):
    """Dense in-register dequant: lane-repeat the scale rows across their
    group and run ONE full-width contraction per nibble half. More VPU work
    per weight (the f32 multiply runs on the full tile) but the best MXU
    shape; which of the two kernels wins is an empirical, batch-dependent
    question — scripts/micro_q4.py measures both."""
    sc = sct_ref[:]                                        # [G, TILE_O] f32
    # [G, TILE_O] -> [G*gsz2, TILE_O]: group g's row repeated for its lanes
    sce = jnp.repeat(sc, gsz2, axis=0)
    lo, hi = _unpack_nibbles_f32(w_ref[:])
    lo = (lo * sce.T).astype(op_dtype)
    hi = (hi * sce.T).astype(op_dtype)
    dn = (((1,), (1,)), ((), ()))
    acc = jax.lax.dot_general(
        ye_ref[:].astype(op_dtype), lo, dn,
        preferred_element_type=jnp.float32,
    ) + jax.lax.dot_general(
        yo_ref[:].astype(op_dtype), hi, dn,
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("tile_o", "mode", "interpret"),
)
def q4_matmul(y, w, scale, *, tile_o: int = 512, mode: str = "grouped",
              interpret=None):
    """[B, S, in] @ dequant(w[out, in/2], scale[out, G]) -> [B, S, out].

    `w` is contraction-axis packed s4 (models/quant.py _pack_nibbles);
    `scale` the grouped f32 scales. S is expected small (decode steps s=1,
    Jacobi passes s<=8) — rows are padded to the bf16 sublane tile and the
    whole activation block stays resident in VMEM while weight tiles
    stream. `interpret=None` resolves to "not on a TPU backend" so the
    same call sites run compiled on the chip and interpreted in the CPU
    test mesh (flash_attention.py precedent)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, in_dim = y.shape
    out_dim, in_half = w.shape
    g = scale.shape[-1]
    if in_half * 2 != in_dim:
        raise ValueError(f"packed width {in_half} vs activation {in_dim}")
    if in_half % g:
        raise ValueError(f"groups {g} do not divide packed width {in_half}")
    gsz2 = in_half // g

    m = b * s
    mp = _round_up(max(m, 16), 16)  # bf16 sublane tile
    y2 = y.reshape(m, in_dim)
    if mp != m:
        y2 = jnp.pad(y2, ((0, mp - m), (0, 0)))
    ye = y2[:, 0::2]  # channels 2j  [MP, in/2]
    yo = y2[:, 1::2]  # channels 2j+1
    sct = scale.T  # [G, out] — lets the kernel read [1, TILE_O] scale rows

    n_tiles = _cdiv(out_dim, tile_o)
    kern = _kernel_grouped if mode == "grouped" else _kernel_dense
    # the CPU interpreter cannot execute bf16 x bf16 -> f32 dots; the
    # compiled TPU path contracts bf16 (exact for the s4 integer operands)
    op_dtype = jnp.float32 if interpret else jnp.bfloat16
    out = pl.pallas_call(
        functools.partial(kern, n_groups=g, gsz2=gsz2, op_dtype=op_dtype),
        out_shape=jax.ShapeDtypeStruct((mp, out_dim), y.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((mp, in_half), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, in_half), lambda o: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_o, in_half), lambda o: (o, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, tile_o), lambda o: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, tile_o), lambda o: (0, o),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ye, yo, w, sct)
    return out[:m].reshape(b, s, out_dim)


def q4_reference(y, w, scale):
    """f32 reference dequant-matmul for the packed layout (tests)."""
    lo = (jnp.left_shift(w, 4) >> 4).astype(jnp.float32)
    hi = (w >> 4).astype(jnp.float32)
    out_dim, in_half = w.shape
    g = scale.shape[-1]
    gsz2 = in_half // g
    ld = (lo.reshape(out_dim, g, gsz2) * scale[..., None]).reshape(
        out_dim, in_half
    )
    hd = (hi.reshape(out_dim, g, gsz2) * scale[..., None]).reshape(
        out_dim, in_half
    )
    ye = y[..., 0::2].astype(jnp.float32)
    yo = y[..., 1::2].astype(jnp.float32)
    return jnp.einsum("bsi,oi->bso", ye, ld) + jnp.einsum(
        "bsi,oi->bso", yo, hd
    )
