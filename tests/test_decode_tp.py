"""Tensor-parallel serving decode: bit-parity vs single-device, and compiled
7B-shape evidence that bs=8 batched `predict_action` fits two v5e chips at
tp=2 (one 15.75 GB chip caps at bs<=4 — BASELINE.md; the reference scales
this path only by big-GPU HBM, modeling_prismatic.py:506-534)."""

import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from roboticattack_tpu.models import VLA_TINY, get_config, init_vla_params
from roboticattack_tpu.models.decode import decode_layout_params, greedy_decode_actions
from roboticattack_tpu.parallel import make_mesh
from roboticattack_tpu.parallel.sharding import decode_param_specs, shard_decode_params

from test_decode import _prompt

_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "s32": 4,
          "u32": 4, "s8": 1, "u8": 1, "pred": 1}


def _collectives(hlo: str):
    """[(op, dtype, dims, bytes)] for every collective op definition."""
    out = []
    for line in hlo.splitlines():
        m = re.search(
            r"= (\w+)\[([\d,]*)\]\S* "
            r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)\(",
            line,
        )
        if not m:
            continue
        dtype, dims_s, op = m.groups()
        dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
        nbytes = int(np.prod(dims, dtype=np.int64)) * _BYTES.get(dtype, 4)
        out.append((op, dtype, dims, nbytes))
    return out


def test_tp_decode_matches_single_device():
    """dp=2 x tp=2 decode must emit bit-identical tokens (and thus actions —
    they're table lookups from tokens) vs the unsharded cooked decode."""
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    cooked = jax.tree.map(jnp.asarray, decode_layout_params(params))
    ids_np, mask_np, px = _prompt(batch=2, seed=1)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(cooked, VLA_TINY, ids, mask, px, cooked_weights=True)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_tp = shard_decode_params(cooked, mesh)
    bsh = NamedSharding(mesh, P("data"))
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh
        )
    )(p_tp, *(jax.device_put(x, bsh) for x in (ids, mask, px)))

    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.actions), np.asarray(got.actions))


def test_tp_decode_rejects_indivisible_heads():
    """vla-tiny has 4 kv heads; tp=8 must fail loudly, not silently replicate."""
    params = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    cooked = jax.tree.map(jnp.asarray, decode_layout_params(params))
    ids_np, mask_np, px = _prompt(batch=2, seed=1)
    mesh = make_mesh(data=1, model=8)
    with pytest.raises(ValueError, match="divisible"):
        greedy_decode_actions(
            shard_decode_params(cooked, mesh), VLA_TINY,
            jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, mesh=mesh,
        )


def test_vla_policy_tp_matches_single_device():
    """VLAPolicy(mesh=...) end-to-end (load -> cook -> shard -> batched
    decode) returns the same actions as the single-device policy."""
    from roboticattack_tpu.eval.policy import load_policy

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    task = "pick up the block"

    single = load_policy(None, model_name="vla-tiny")
    a_single = single.get_action_batch(frames, task)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    tp = load_policy(None, model_name="vla-tiny", mesh=mesh)
    a_tp = tp.get_action_batch(frames, task)

    np.testing.assert_array_equal(a_single, a_tp)


def test_7b_shape_tp2_decode_fits_two_chips():
    """Compiled (not arithmetic) evidence for the serving scaling claim: the
    FULL OpenVLA-7B bs=8 decode, Megatron-sharded at tp=2, lowered with
    abstract params on a 2-device mesh.

    Pins: (a) per-chip argument bytes ~ half the 13.9 GB single-chip weights
    (+ replicated ViTs/projector/embed) and under the 15.75 GB v5e HBM with
    room for the 2.8 GB/chip head-sharded KV cache; (b) the collective
    inventory is exactly the serving model — row-parallel psums of [8,1,4096]
    decode / [8,320,4096] prefill activations plus tiny vocab-argmax gathers;
    nothing weight- or cache-sized moves over ICI. GSPMD partitioning runs
    before backend codegen, so the inventory is backend-independent; the CPU
    backend's temp numbers are NOT used (its bf16->f32 operand upcasts
    roughly double every weight buffer, an artifact TPU codegen doesn't have).
    """
    cfg = get_config("openvla-7b")

    class _ShapeSwap:
        @staticmethod
        def swapaxes(s, a, b):
            shape = list(s.shape)
            shape[a], shape[b] = shape[b], shape[a]
            return jax.ShapeDtypeStruct(tuple(shape), s.dtype)

    shapes = jax.eval_shape(lambda k: init_vla_params(k, cfg), jax.random.key(0))
    shapes = decode_layout_params(shapes, xp=_ShapeSwap)
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    specs = decode_param_specs(shapes)
    p_abs = jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)
        ),
        shapes, specs,
    )
    bs, pad = 8, 64
    rep = NamedSharding(mesh, P())
    ids = jax.ShapeDtypeStruct((bs, pad), jnp.int32, sharding=rep)
    msk = jax.ShapeDtypeStruct((bs, pad), jnp.int32, sharding=rep)
    px = jax.ShapeDtypeStruct(
        (bs, 2, cfg.dino.image_size, cfg.dino.image_size, 3),
        jnp.dtype(cfg.dtype), sharding=rep,
    )
    comp = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, cfg, i, m, x, cooked_weights=True, mesh=mesh
        )
    ).lower(p_abs, ids, msk, px).compile()

    GB = 1024 ** 3
    args_gb = comp.memory_analysis().argument_size_in_bytes / GB
    # 13.04 GB of LLM weights / 2 + ~1.3 GB replicated (ViTs, projector,
    # embed, norms) = 7.8 GB; must stay well under HBM minus the 2.8 GB/chip
    # KV cache + activations
    assert 7.0 < args_gb < 8.5, f"per-chip argument bytes drifted: {args_gb:.2f} GB"

    colls = _collectives(comp.as_text())
    assert colls, "expected row-parallel psums in the TP decode"
    t0 = 256 + pad  # patches + padded prompt
    d = cfg.llm.hidden_size
    allowed_psums = {(bs, 1, d), (bs, t0, d)}
    for op, dtype, dims, nbytes in colls:
        assert op in ("all-reduce", "all-gather"), f"unexpected {op} {dims}"
        if op == "all-reduce":
            assert dims in allowed_psums, f"unexpected psum shape {dims}"
        else:  # argmax candidate gathers: [bs, tp]-tiny, never logits/weights
            assert nbytes < 1 << 20, f"all-gather of {nbytes} bytes {dims}"
