"""Pallas TPU attention kernel: head-resident fused attention with custom VJP.

Replaces the reference's external flash-attn 2.5.5 CUDA kernels
(/root/reference/experiments/robot/openvla_utils.py:45) with a TPU-native
design matched to the OpenVLA workload: multimodal sequences are short
(~288-320 tokens), so an ENTIRE head's score matrix (S x S fp32 ~= 400 KB)
fits in VMEM. The kernel therefore runs one grid cell per (batch x head),
computing softmax(QK^T * scale + bias) V with zero HBM traffic for scores —
no online-softmax machinery needed at this length (that's the long-sequence
regime; see mha_chunked for the XLA fallback).

Backward is a second Pallas kernel over the same grid that recomputes P in
VMEM and emits dQ, dK, dV in one pass:
    dV = P^T dO;  dP = dO V^T;  dS = P * (dP - rowsum(dP * P));
    dQ = dS K * scale;  dK = dS^T Q * scale.

Used for the Llama decoder (head_dim 128, MXU-aligned). fp32 softmax matches
ops.attention.mha bit-for-bit in expectation; parity is tested in interpret
mode on CPU (tests/test_flash_attention.py).

Sharding: the partitioner cannot split a bare pallas_call, so both the fwd
and bwd kernels are wrapped in `custom_partitioning` sharded on (batch, head)
— heads are fully independent, so under a data x model mesh each device runs
the kernel on its local (B/dp, H/tp) block with ZERO collectives (the TP
equivalent of flash-attn 2.5.5 running per-GPU under Megatron-style head
splits). Sequence/head_dim factors are declared replicated; the bias follows
the batch sharding. Single-device jit lowers to the plain kernel.

Caveat: because the head axis is declared shardable, GSPMD propagation (e.g.
under a ZeRO-3/FSDP layout) may shard heads over the 'data' axis; that is a
valid layout whenever num_heads divides the axis (true for the 7B's 32 heads
on 2^k-device meshes) but fails to partition on toy configs with fewer heads
than devices — use attn_impl='chunked' there (__graft_entry__'s FSDP leg).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    q = q_ref[0]          # [S, D]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]    # [S, S] fp32
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(p.astype(q.dtype), v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    bias = bias_ref[0]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)          # [S, S] fp32

    do_f = do.astype(jnp.float32)
    v_f = v.astype(jnp.float32)
    dp = jax.lax.dot_general(
        do_f, v_f, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                    # [S, S]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

    q_f = q.astype(jnp.float32)
    k_f = k.astype(jnp.float32)
    dq_ref[0] = (jnp.dot(ds, k_f, preferred_element_type=jnp.float32) * scale).astype(q.dtype)
    dk_ref[0] = (
        jax.lax.dot_general(ds, q_f, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    ).astype(q.dtype)
    dv_ref[0] = jax.lax.dot_general(
        p, do_f, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(q.dtype)


def _specs(bh: int, s: int, d: int, heads: int):
    qspec = pl.BlockSpec((1, s, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, s, s), lambda i: (i // heads, 0, 0), memory_space=pltpu.VMEM)
    return qspec, bspec


def _fwd_pallas(q, k, v, bias, interpret):
    b, h, s, d = q.shape
    scale = d ** -0.5
    qf = q.reshape(b * h, s, d)
    qspec, bspec = _specs(b * h, s, d, h)
    out = pl.pallas_call(
        partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b * h, s, d), q.dtype),
        grid=(b * h,),
        in_specs=[qspec, qspec, qspec, bspec],
        out_specs=qspec,
        interpret=interpret,
    )(qf, k.reshape(b * h, s, d), v.reshape(b * h, s, d), bias)
    return out.reshape(b, h, s, d)


def _bwd_pallas(q, k, v, bias, g, interpret):
    b, h, s, d = q.shape
    scale = d ** -0.5
    qspec, bspec = _specs(b * h, s, d, h)
    shape = jax.ShapeDtypeStruct((b * h, s, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        partial(_bwd_kernel, scale=scale),
        out_shape=(shape, shape, shape),
        grid=(b * h,),
        in_specs=[qspec, qspec, qspec, bspec, qspec],
        out_specs=(qspec, qspec, qspec),
        interpret=interpret,
    )(
        q.reshape(b * h, s, d),
        k.reshape(b * h, s, d),
        v.reshape(b * h, s, d),
        bias,
        g.reshape(b * h, s, d),
    )
    rs = lambda x: x.reshape(b, h, s, d)
    return rs(dq), rs(dk), rs(dv)


def _bh_partition(n_out: int):
    """partition callback: shard every [B,H,S,D] operand/result like q's
    (batch, head) sharding, the [B,S,S] bias like q's batch; S/D replicated.
    Per-shard lowering is the plain kernel on local blocks — no collectives."""

    def partition(lower_fn, mesh, arg_shapes, result_shape):
        spec = arg_shapes[0].sharding.spec
        qb = spec[0] if len(spec) > 0 else None
        qh = spec[1] if len(spec) > 1 else None
        qsharding = NamedSharding(mesh, P(qb, qh, None, None))
        bsharding = NamedSharding(mesh, P(qb, None, None))
        shardings = tuple(
            bsharding if len(a.shape) == 3 else qsharding for a in arg_shapes
        )
        out = qsharding if n_out == 1 else (qsharding,) * n_out
        return mesh, lower_fn, out, shardings

    return partition


@lru_cache(maxsize=None)
def _sharded_fwd(interpret: bool):
    fn = custom_partitioning(lambda q, k, v, bias: _fwd_pallas(q, k, v, bias, interpret))
    fn.def_partition(
        partition=partial(_bh_partition(1), lambda q, k, v, bias: _fwd_pallas(q, k, v, bias, interpret)),
        sharding_rule="b h s e, b h s e, b h s e, b t u -> b h s e",
        need_replication_factors=("s", "e", "t", "u"),
    )
    return fn


@lru_cache(maxsize=None)
def _sharded_bwd(interpret: bool):
    fn = custom_partitioning(lambda q, k, v, bias, g: _bwd_pallas(q, k, v, bias, g, interpret))
    fn.def_partition(
        partition=partial(_bh_partition(3), lambda q, k, v, bias, g: _bwd_pallas(q, k, v, bias, g, interpret)),
        sharding_rule="b h s e, b h s e, b h s e, b t u, b h s e -> b h s e, b h s e, b h s e",
        need_replication_factors=("s", "e", "t", "u"),
    )
    return fn


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def flash_attention(q, k, v, bias, interpret: bool = False):
    """q/k/v: [B, H, S, D] (same dtype, e.g. bf16); bias: [B, S, S] fp32
    additive (causal+padding). Returns [B, H, S, D]."""
    return _forward(q, k, v, bias, interpret)


def _forward(q, k, v, bias, interpret):
    return _sharded_fwd(bool(interpret))(q, k, v, bias)


def _fwd_rule(q, k, v, bias, interpret):
    out = _forward(q, k, v, bias, interpret)
    return out, (q, k, v, bias)


def _bwd_rule(interpret, residuals, g):
    q, k, v, bias = residuals
    dq, dk, dv = _sharded_bwd(bool(interpret))(q, k, v, bias, g)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd_rule, _bwd_rule)


def mha_flash(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in for ops.attention.mha when Hq == Hkv and the [B,1,S,S] bias can
    be squeezed to [B, S, S]."""
    b, hq, s, d = q.shape
    if jax.default_backend() == "cpu":
        interpret = True  # compiled Pallas requires TPU; CPU tests interpret
    if bias is None:
        bias_b = jnp.zeros((b, s, s), jnp.float32)
    else:
        bias_b = jnp.broadcast_to(bias.astype(jnp.float32), (b, bias.shape[1], s, s))
        assert bias.shape[1] == 1, "per-head bias not supported; squeeze to [B,1,S,S]"
        bias_b = bias_b[:, 0]
    return flash_attention(q, k, v, bias_b, interpret)
