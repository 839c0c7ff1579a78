"""Weight-only int8 serving decode (models/quant.py).

Correctness strategy: real released weights are unreachable here (zero
egress), so the math path is pinned exactly instead — int8-grid weights with
power-of-two per-channel scales make the quantized program and the
full-precision program bit-equal (multiplying by 2^k only shifts exponents;
per-output-channel dequantization commutes with the contraction), so any
divergence is a decode-path bug, not quantization noise.

Capability under test: single-chip bs>=8 batched `predict_action` — the
configuration BASELINE.md round 3 said "needs TP over >=2 chips". The
reference serves this path bs=1 fp16 only (modeling_prismatic.py:506-534).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.models.decode import (
    decode_layout_params,
    decode_layout_shapes,
    greedy_decode_actions,
)
from roboticattack_tpu.models.quant import (
    QUANT_LAYER_KEYS,
    is_quantized,
    quantize_decode_params,
    quantize_decode_shapes,
)

from test_decode import _prompt


def _cooked_tiny(seed=0):
    params = jax.device_get(init_vla_params(jax.random.key(seed), VLA_TINY))
    return decode_layout_params(params, xp=np)


def _pow2_rowscale(w):
    """Smallest power-of-two scale per output row covering int8 range."""
    absmax = np.max(np.abs(np.float32(w)), axis=-1, keepdims=True)
    return np.exp2(np.ceil(np.log2(absmax / 127.0 + 1e-30))).astype(np.float32)


def _grid_pair(cooked):
    """(float_params, quant_params) where every quantizable tensor is EXACTLY
    representable on the int8 grid with power-of-two scales — the bit-parity
    construction."""
    fl = {k: dict(v) if isinstance(v, dict) else v for k, v in cooked.items()}
    fl["llm"] = dict(cooked["llm"])
    fl_layers = dict(cooked["llm"]["layers"])
    q = dict(fl)
    q["llm"] = dict(fl["llm"])
    q_layers = dict(fl_layers)

    for k in QUANT_LAYER_KEYS:
        w = np.float32(fl_layers[k])
        s = _pow2_rowscale(w)                       # [L, out, 1]
        w8 = np.clip(np.round(w / s), -127, 127).astype(np.int8)
        fl_layers[k] = (w8.astype(np.float32) * s).astype(np.float32)
        q_layers[k] = w8
        q_layers[k + "_scale"] = s[..., 0]
    fl["llm"]["layers"] = fl_layers
    q["llm"]["layers"] = q_layers

    lm = np.float32(cooked["llm"]["lm_head"])       # [D, V] per-column scale
    s_lm = _pow2_rowscale(lm.T).T                   # [1, V]
    lm8 = np.clip(np.round(lm / s_lm), -127, 127).astype(np.int8)
    fl["llm"]["lm_head"] = (lm8.astype(np.float32) * s_lm).astype(np.float32)
    q["llm"]["lm_head"] = lm8
    q["llm"]["lm_head_scale"] = s_lm[0]

    emb = np.float32(cooked["llm"]["embed"])        # [V, D] per-row scale
    s_e = _pow2_rowscale(emb)                       # [V, 1]
    e8 = np.clip(np.round(emb / s_e), -127, 127).astype(np.int8)
    fl["llm"]["embed"] = (e8.astype(np.float32) * s_e).astype(np.float32)
    q["llm"]["embed"] = e8
    q["llm"]["embed_scale"] = s_e[:, 0]
    return fl, q


def test_roundtrip_error_bound():
    """|W - q*s| <= s/2 elementwise (up to f32 rounding of w/s, which can
    push a value across the .5 boundary — hence the 1e-3 relative slop) for
    every quantized stack."""
    cooked = _cooked_tiny()
    qp = quantize_decode_params(cooked, xp=np)
    assert is_quantized(qp) and not is_quantized(cooked)
    bound = 0.5 * (1 + 1e-3)
    for k in QUANT_LAYER_KEYS:
        w = np.float32(cooked["llm"]["layers"][k])
        q = qp["llm"]["layers"][k]
        s = qp["llm"]["layers"][k + "_scale"]
        assert q.dtype == np.int8 and s.dtype == np.float32
        err = np.abs(w - q.astype(np.float32) * s[..., None])
        assert np.all(err <= s[..., None] * bound), k
    # embed rows dequantize within half a step too
    emb = np.float32(cooked["llm"]["embed"])
    e8 = qp["llm"]["embed"].astype(np.float32)
    se = qp["llm"]["embed_scale"]
    assert np.all(np.abs(emb - e8 * se[:, None]) <= se[:, None] * bound)


def test_quantize_is_idempotent_and_guards_layout():
    cooked = _cooked_tiny()
    qp = quantize_decode_params(cooked, xp=np)
    assert quantize_decode_params(qp, xp=np) is qp
    storage = jax.device_get(init_vla_params(jax.random.key(0), VLA_TINY))
    with pytest.raises(ValueError, match="COOKED"):
        quantize_decode_params(storage, xp=np)
    with pytest.raises(ValueError, match="quantized"):
        decode_layout_params(qp, xp=np)  # double-cook would orphan the scales
    ids, mask, px = _prompt(batch=1, seed=2)
    with pytest.raises(ValueError, match="cooked_weights=True"):
        greedy_decode_actions(
            jax.tree.map(jnp.asarray, qp), VLA_TINY,
            jnp.asarray(ids), jnp.asarray(mask), px, cooked_weights=False,
        )


def test_quantize_rejects_non_llama_stacks():
    """Phi-family layer stacks (no SwiGLU gate/up/down) must fail loudly,
    not with a KeyError — Phi decode itself is routed away in decode.py."""
    cooked = _cooked_tiny()
    cooked["llm"] = dict(cooked["llm"])
    cooked["llm"]["layers"] = {
        k: v for k, v in cooked["llm"]["layers"].items() if k != "gate_w"
    }
    with pytest.raises(ValueError, match="Llama-family"):
        quantize_decode_params(cooked, xp=np)


def test_grid_weights_bit_parity():
    """On int8-grid weights with power-of-two scales, the int8 program and
    the full-precision program produce IDENTICAL tokens and actions."""
    fl, q = _grid_pair(_cooked_tiny(seed=3))
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(
        jax.tree.map(jnp.asarray, fl), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    got = greedy_decode_actions(
        jax.tree.map(jnp.asarray, q), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.actions), np.asarray(got.actions))


def test_quant_tp_matches_single_device():
    """int8 + tensor parallelism: the scale leaves shard with their stacks
    (parallel/sharding.py decode_param_specs) and the tp=2 program is
    bit-identical to the single-device int8 decode."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    qp = jax.tree.map(jnp.asarray, quantize_decode_params(_cooked_tiny(), xp=np))
    ids_np, mask_np, px = _prompt(batch=2, seed=5)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(qp, VLA_TINY, ids, mask, px, cooked_weights=True)

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_tp = shard_decode_params(qp, mesh)
    bsh = NamedSharding(mesh, P("data"))
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh
        )
    )(p_tp, *(jax.device_put(x, bsh) for x in (ids, mask, px)))
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_policy_quantize_end_to_end():
    """load_policy(quantize='int8') serves batched actions and actually
    shrinks the resident weight bytes (the point of the feature)."""
    from roboticattack_tpu.eval.policy import load_policy

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    task = "pick up the block"

    full = load_policy(None, model_name="vla-tiny")
    quant = load_policy(None, model_name="vla-tiny", quantize="int8")
    acts = quant.get_action_batch(frames, task)
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))

    bytes_full = sum(x.nbytes for x in jax.tree.leaves(full.params))
    bytes_q = sum(x.nbytes for x in jax.tree.leaves(quant.params))
    # tiny model: the LLM share of params is smaller than the 7B's ~95%, but
    # the quantized pytree must still be materially lighter
    assert bytes_q < 0.7 * bytes_full, (bytes_q, bytes_full)


def test_quant_7b_shape_budget():
    """eval_shape-level 7B accounting: int8 cuts the decode pytree from
    ~13.5 GB to ~7.7 GB (the vision tower + projector stay bf16) — under the
    15.75 GB v5e ceiling WITH a bs=16 KV cache (2.7 GB), the single-chip
    serving configuration."""
    from roboticattack_tpu.parallel.evidence import evidence_7b_config

    cfg = evidence_7b_config()
    shapes = jax.eval_shape(
        lambda k: init_vla_params(k, cfg), jax.random.key(0)
    )
    cooked = decode_layout_shapes(shapes)
    qshapes = quantize_decode_shapes(cooked)

    def total_gb(tree):
        return sum(
            int(np.prod(s.shape, dtype=np.int64)) * jnp.dtype(s.dtype).itemsize
            for s in jax.tree.leaves(tree)
        ) / 1024**3

    full = total_gb(cooked)
    quant = total_gb(qshapes)
    assert full > 13.0, full
    assert quant < 7.8, quant
    # scales are noise: < 0.5% of the quantized total
    scale_gb = sum(
        int(np.prod(s.shape, dtype=np.int64)) * 4
        for p in [qshapes["llm"]["layers"]]
        for k, s in p.items() if k.endswith("_scale")
    ) / 1024**3
    assert scale_gb < 0.005 * quant


# ---------------------------------------------------------------------------
# int4 (grouped scales, models/quant.py mode="int4")
# ---------------------------------------------------------------------------
# vla-tiny contraction dims are {64, 128}; group_size=16 divides both (the 7B
# default of 128 divides its 4096/11008 — test_quant_7b_shape_budget_int4).
GS = 16


def _pow2_groupscale(w, gs):
    """Smallest power-of-two scale per (channel, group) covering int4 range."""
    g = w.shape[-1] // gs
    wg = np.float32(w).reshape(w.shape[:-1] + (g, gs))
    absmax = np.max(np.abs(wg), axis=-1)
    return np.exp2(np.ceil(np.log2(absmax / 7.0 + 1e-30))).astype(np.float32)


def _grid_pair_int4(cooked, gs=GS):
    """(float_params, int4_params) where every quantized tensor is EXACTLY
    representable on the int4 grid with power-of-two GROUP scales. int4*2^k
    has 3 significand bits, so the dequantized float weights are exact in
    f32/bf16 — the float program and the int4 prefill are bit-equal; the
    int4 decode steps contract per group (different f32 summation order),
    so token equality there is empirical-on-fixed-seeds, not bit-forced.
    Quantized leaves use the PACKED two-s4-per-byte int8 representation
    (models/quant.py _pack_nibbles)."""
    from roboticattack_tpu.models.quant import _pack_nibbles

    fl = dict(cooked)
    fl["llm"] = dict(cooked["llm"])
    fl_layers = dict(cooked["llm"]["layers"])
    q = dict(fl)
    q["llm"] = dict(fl["llm"])
    q_layers = dict(fl_layers)

    def grid(w):
        s = _pow2_groupscale(w, gs)                  # [..., G]
        g = w.shape[-1] // gs
        wg = np.float32(w).reshape(w.shape[:-1] + (g, gs))
        w4 = np.clip(np.round(wg / s[..., None]), -7, 7)
        deq = (w4 * s[..., None]).reshape(w.shape).astype(np.float32)
        packed = _pack_nibbles(w4.reshape(w.shape).astype(np.int8), np)
        return deq, packed, s

    for k in QUANT_LAYER_KEYS:
        deq, w4, s = grid(np.float32(fl_layers[k]))
        fl_layers[k] = deq
        q_layers[k] = w4
        q_layers[k + "_scale"] = s
    fl["llm"]["layers"] = fl_layers
    q["llm"]["layers"] = q_layers

    lm = np.float32(cooked["llm"]["lm_head"])        # [D, V], contraction dim 0
    deq, w4, s = grid(lm.T)
    fl["llm"]["lm_head"] = deq.T.copy()
    q["llm"]["lm_head"] = w4.T.copy()
    q["llm"]["lm_head_scale"] = s

    emb = np.float32(cooked["llm"]["embed"])         # per-row int8, both modes
    s_e = _pow2_rowscale(emb)
    e8 = np.clip(np.round(emb / s_e), -127, 127).astype(np.int8)
    fl["llm"]["embed"] = (e8.astype(np.float32) * s_e).astype(np.float32)
    q["llm"]["embed"] = e8
    q["llm"]["embed_scale"] = s_e[:, 0]
    return fl, q


def test_int4_roundtrip_error_bound():
    """|W - q*s| <= s/2 per (channel, group) for every int4 stack, and the
    scale tensors have the grouped rank the decode dispatches on."""
    cooked = _cooked_tiny()
    qp = quantize_decode_params(cooked, xp=np, mode="int4", group_size=GS)
    from roboticattack_tpu.models.quant import quant_mode

    assert quant_mode(qp) == "int4" and is_quantized(qp)
    bound = 0.5 * (1 + 1e-3)

    def unpack(p):
        # packed two-s4-per-byte int8 (quant.py _pack_nibbles): low nibble is
        # channel 2j, high is 2j+1 — interleave back for the error check
        lo = np.left_shift(p.astype(np.int8), 4) >> 4
        hi = p.astype(np.int8) >> 4
        return np.stack([lo, hi], axis=-1).reshape(p.shape[:-1] + (-1,))

    for k in QUANT_LAYER_KEYS:
        w = np.float32(cooked["llm"]["layers"][k])
        q = qp["llm"]["layers"][k]
        s = qp["llm"]["layers"][k + "_scale"]
        assert q.dtype == np.int8 and q.shape[-1] == w.shape[-1] // 2, k
        assert s.dtype == np.float32
        assert s.shape == w.shape[:-1] + (w.shape[-1] // GS,), k
        g = w.shape[-1] // GS
        wg = w.reshape(w.shape[:-1] + (g, GS))
        qg = np.float32(unpack(q)).reshape(wg.shape)
        assert np.all(np.abs(qg) <= 7), k  # s4 value range, sign-extended
        err = np.abs(wg - qg * s[..., None])
        assert np.all(err <= s[..., None] * bound), k
    # embed stays per-row int8 (fidelity trade documented in quant.py)
    assert qp["llm"]["embed"].dtype == np.int8


def test_int4_group_size_must_divide():
    with pytest.raises(ValueError, match="group_size"):
        quantize_decode_params(_cooked_tiny(), xp=np, mode="int4",
                               group_size=48)


def test_int4_requantize_mode_mismatch_rejected():
    cooked = _cooked_tiny()
    q8 = quantize_decode_params(cooked, xp=np, mode="int8")
    with pytest.raises(ValueError, match="already int8"):
        quantize_decode_params(q8, xp=np, mode="int4", group_size=GS)
    q4 = quantize_decode_params(cooked, xp=np, mode="int4", group_size=GS)
    assert quantize_decode_params(q4, xp=np, mode="int4") is q4  # idempotent
    with pytest.raises(ValueError, match="quantized"):
        decode_layout_params(q4, xp=np)  # double-cook would orphan scales


def test_int4_grouped_proj_matches_f64():
    """The grouped two-einsum decode path (models/decode.py _proj s==1
    branch) against f64 numpy grouped math — the unit-level pin on the int4
    contraction, independent of end-to-end token stability."""
    from roboticattack_tpu.models.decode import _proj

    rng = np.random.default_rng(7)
    out_dim, in_dim, g = 24, 32, 4
    w4 = rng.integers(-7, 8, (out_dim, in_dim))
    scale = np.exp2(rng.integers(-8, -2, (out_dim, g))).astype(np.float32)
    y = rng.standard_normal((3, 1, in_dim)).astype(np.float32)

    from roboticattack_tpu.models.quant import _pack_nibbles

    got = np.asarray(_proj(
        jnp.asarray(y), jnp.asarray(_pack_nibbles(w4.astype(np.int8), np)),
        cooked=True, scale=jnp.asarray(scale),
    ))
    wg = w4.reshape(out_dim, g, in_dim // g).astype(np.float64)
    yg = y.reshape(3, 1, g, in_dim // g).astype(np.float64)
    part = np.einsum("bsgi,ogi->bsog", yg, wg)
    want = np.einsum("bsog,og->bso", part, scale.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_int4_grid_weights_token_parity():
    """On int4-grid weights with power-of-two group scales the int4 program
    reproduces the full-precision program's tokens (prefill is bit-exact;
    decode steps differ only by f32 summation order within groups — see
    _grid_pair_int4). Fixed seeds; both batch rows checked."""
    fl, q = _grid_pair_int4(_cooked_tiny(seed=3))
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(
        jax.tree.map(jnp.asarray, fl), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    got = greedy_decode_actions(
        jax.tree.map(jnp.asarray, q), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(np.asarray(ref.actions), np.asarray(got.actions))


def test_int4_tp_matches_single_device():
    """int4 + tensor parallelism: grouped scales shard with their stacks —
    column-parallel on OUT, row-parallel on the contraction GROUPS
    (parallel/sharding.py _scale_spec) — and tp=2 tokens match the
    single-device int4 program."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params

    qp = jax.tree.map(jnp.asarray, quantize_decode_params(
        _cooked_tiny(), xp=np, mode="int4", group_size=GS))
    ids_np, mask_np, px = _prompt(batch=2, seed=5)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(qp, VLA_TINY, ids, mask, px, cooked_weights=True)

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    p_tp = shard_decode_params(qp, mesh)
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh
        )
    )(p_tp, ids, mask, px)
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_int4_tp_rejects_group_straddling_shards():
    """A shard boundary inside a quantization group would make GSPMD gather
    the row-parallel stacks — rejected loudly (models/decode.py)."""
    from roboticattack_tpu.parallel import make_mesh

    # tiny o_w contraction is 64: gs=32 -> 2 groups; tp=4 puts 16 columns per
    # chip, half a group -> must raise (kv heads = 4 pass the head guard)
    qp = jax.tree.map(jnp.asarray, quantize_decode_params(
        _cooked_tiny(), xp=np, mode="int4", group_size=32))
    ids_np, mask_np, px = _prompt(batch=2, seed=6)
    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="group size"):
        greedy_decode_actions(
            qp, VLA_TINY, jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, mesh=mesh,
        )


def test_policy_int4_end_to_end():
    """load_policy(quantize='int4:16') serves batched actions; the pytree is
    materially lighter than int8's."""
    from roboticattack_tpu.eval.policy import load_policy

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    q8 = load_policy(None, model_name="vla-tiny", quantize="int8")
    q4 = load_policy(None, model_name="vla-tiny", quantize="int4:16")
    acts = q4.get_action_batch(frames, "pick up the block")
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))

    def packed_bytes(tree):
        # int4 stacks are stored PACKED two-s4-per-int8 (quant.py), so plain
        # nbytes IS the deployment number on every backend — including CPU,
        # which used to hold jnp.int4 unpacked at 1 byte/elem
        return sum(x.nbytes for x in jax.tree.leaves(tree))

    def quantized_portion(p):
        # the stacks + lm_head and their scales — what int4 shrinks (embed is
        # per-row int8 in both modes; vision/projector stay bf16)
        return {"layers": p.params["llm"]["layers"],
                "lm": p.params["llm"]["lm_head"],
                "lms": p.params["llm"]["lm_head_scale"]}

    b8 = packed_bytes(quantized_portion(q8))
    b4 = packed_bytes(quantized_portion(q4))
    qw = q4.params["llm"]["layers"]["q_w"]
    assert jnp.dtype(qw.dtype) == jnp.int8  # packed s4 bytes
    assert qw.shape[-1] == q8.params["llm"]["layers"]["q_w"].shape[-1] // 2
    assert b4 < 0.8 * b8, (b4, b8)
    with pytest.raises(ValueError, match="quantize"):
        load_policy(None, model_name="vla-tiny", quantize="int5")


def test_quant_7b_shape_budget_int4():
    """eval_shape-level 7B accounting: int4 cuts the decode pytree to
    ~5.0 GB (group_size=128 divides 4096 and 11008) — bs=32 serving HBM
    headroom on one 15.75 GB v5e."""
    from roboticattack_tpu.parallel.evidence import evidence_7b_config

    cfg = evidence_7b_config()
    shapes = jax.eval_shape(
        lambda k: init_vla_params(k, cfg), jax.random.key(0)
    )
    cooked = decode_layout_shapes(shapes)
    q4 = quantize_decode_shapes(cooked, mode="int4")

    def total_gb(tree):
        # packed s4 storage: nbytes-equivalent accounting is exact
        return sum(
            int(np.prod(s.shape, dtype=np.int64)) * jnp.dtype(s.dtype).itemsize
            for s in jax.tree.leaves(tree)
        ) / 1024**3

    quant = total_gb(q4)
    assert quant < 5.2, quant
    # grouped scales cost ~1/32 of the int4 stack bytes (f32 per 128 weights)
    scale_gb = sum(
        int(np.prod(s.shape, dtype=np.int64)) * 4
        for k, s in q4["llm"]["layers"].items() if k.endswith("_scale")
    ) / 1024**3
    assert 0.1 < scale_gb < 0.25, scale_gb


# --- w8a8: int8 weights + dynamic int8 PREFILL activations --------------------
# (models/decode.py act_quant — the MXU double-rate integer path; activation
# rounding is lossy, so exactness is pinned on grid-valued activations and
# TP bit-identity, not on agreement with the bf16 program)


def test_w8a8_proj_exact_on_grid_activations():
    """_proj(act8=True) against the weight-only int8 path on activations
    already representable on the per-token int8 grid (power-of-two token
    scales): both contractions are exact integer sums, so the outputs must
    be bit-equal — any difference is a w8a8 math bug, not rounding."""
    from roboticattack_tpu.models.decode import _proj

    rng = np.random.default_rng(11)
    out_dim, in_dim = 24, 32
    w8 = rng.integers(-127, 128, (out_dim, in_dim)).astype(np.int8)
    scale = np.exp2(rng.integers(-8, -2, out_dim)).astype(np.float32)
    # y rows: integer grids times a power-of-two token scale, with absmax
    # exactly 127*2^e so _quantize_act recovers the same grid
    e = rng.integers(-3, 3, (3, 5, 1)).astype(np.float32)
    grid = rng.integers(-127, 128, (3, 5, in_dim)).astype(np.float32)
    grid[..., 0] = 127.0  # pin the absmax so sy = 2^e exactly
    y = grid * np.exp2(e)

    ref = np.asarray(_proj(jnp.asarray(y), jnp.asarray(w8), cooked=True,
                           scale=jnp.asarray(scale)))
    got = np.asarray(_proj(jnp.asarray(y), jnp.asarray(w8), cooked=True,
                           scale=jnp.asarray(scale), act8=True))
    np.testing.assert_array_equal(ref, got)


def test_w8a8_requires_int8_weights():
    """act_quant='int8' on unquantized or int4 params must fail loudly (the
    int8 x int8 contraction has no grouped-int4 form)."""
    cooked = jax.tree.map(jnp.asarray, _cooked_tiny())
    ids_np, mask_np, px = _prompt(batch=1, seed=6)
    with pytest.raises(ValueError, match="w8a8"):
        greedy_decode_actions(
            cooked, VLA_TINY, jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, act_quant="int8",
        )
    q4 = jax.tree.map(jnp.asarray, quantize_decode_params(
        _cooked_tiny(), xp=np, mode="int4", group_size=16))
    with pytest.raises(ValueError, match="w8a8"):
        greedy_decode_actions(
            q4, VLA_TINY, jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, act_quant="int8",
        )
    with pytest.raises(ValueError, match="act_quant"):
        greedy_decode_actions(
            cooked, VLA_TINY, jnp.asarray(ids_np), jnp.asarray(mask_np), px,
            cooked_weights=True, act_quant="int4",
        )


def test_w8a8_tp_matches_single_device():
    """w8a8 + tensor parallelism is BIT-identical to single-device w8a8: the
    per-token absmax reduces exactly over the sharded contraction dim and
    the int32 partial sums psum exactly (integer addition is associative) —
    the TP-composition guarantee the docstring claims."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    qp = jax.tree.map(jnp.asarray, quantize_decode_params(_cooked_tiny(), xp=np))
    ids_np, mask_np, px = _prompt(batch=2, seed=7)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, act_quant="int8")

    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    p_tp = shard_decode_params(qp, mesh)
    bsh = NamedSharding(mesh, P("data"))
    got = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh,
            act_quant="int8",
        )
    )(p_tp, *(jax.device_put(x, bsh) for x in (ids, mask, px)))
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))


def test_policy_w8a8_end_to_end():
    """load_policy(quantize='w8a8') serves batched actions; the resident
    pytree is the int8-quantized one (w8a8 changes the program, not the
    stored weights)."""
    from roboticattack_tpu.eval.policy import load_policy

    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, (2, 56, 56, 3), dtype=np.uint8)
    w8a8 = load_policy(None, model_name="vla-tiny", quantize="w8a8")
    acts = w8a8.get_action_batch(frames, "pick up the block")
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))
    lt = w8a8.params["llm"]["layers"]
    assert jnp.dtype(lt["q_w"].dtype) == jnp.int8
    assert lt["q_w_scale"].ndim == 2  # per-channel, not grouped


def test_w8a8_jacobi_matches_sequential():
    """w8a8 composes with Jacobi drafts: the drafted tail's fixed point on a
    w8a8 program equals the sequential w8a8 decode bit-exactly on the tiny
    model (same pin as tests/test_decode_jacobi.py for bf16/int8), and a
    self-draft verifies in one pass."""
    qp = jax.tree.map(jnp.asarray, quantize_decode_params(_cooked_tiny(), xp=np))
    ids_np, mask_np, px = _prompt(batch=2, seed=9)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    seq = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, act_quant="int8")
    jac = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, act_quant="int8",
                                draft_tokens=seq.tokens)
    np.testing.assert_array_equal(np.asarray(seq.tokens), np.asarray(jac.tokens))
    assert int(jax.device_get(jac.verify_passes)) == 1


def test_int4_jacobi_matches_sequential_nongrid():
    """int4 + Jacobi on NON-grid scales (the production case — real
    checkpoints' scales are not powers of two): the s<=8 grouped-exact
    branches in _proj/_lm_logits_all make the verification pass compute the
    sequential tail's math, so the drafted fixed point reproduces the
    sequential tokens and a self-draft verifies in one pass. Before this
    regime split the s>1 branch rounded dequantized weights to bf16 and the
    fixed point could diverge silently."""
    qp = jax.tree.map(jnp.asarray, quantize_decode_params(
        _cooked_tiny(seed=5), xp=np, mode="int4", group_size=16))
    ids_np, mask_np, px = _prompt(batch=2, seed=10)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    seq = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True)
    jac = greedy_decode_actions(qp, VLA_TINY, ids, mask, px,
                                cooked_weights=True, draft_tokens=seq.tokens)
    np.testing.assert_array_equal(np.asarray(seq.tokens), np.asarray(jac.tokens))
    assert int(jax.device_get(jac.verify_passes)) == 1


def test_all_serving_levers_compose():
    """Capstone: every serving lever at once — w8a8 weights/activations,
    int8 KV cache, visual-token pruning, tensor parallelism, and a Jacobi
    draft — compiles and decodes finite actions on the virtual mesh. Pins
    that no pair of levers has a hidden incompatibility (each pairwise
    composition is pinned exactly elsewhere; this is the N-way smoke)."""
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_decode_params
    from jax.sharding import NamedSharding, PartitionSpec as P

    qp = jax.tree.map(jnp.asarray, quantize_decode_params(_cooked_tiny(), xp=np))
    ids_np, mask_np, px = _prompt(batch=2, seed=12)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    p_tp = shard_decode_params(qp, mesh)
    rep = NamedSharding(mesh, P())
    ids, mask, px = (jax.device_put(x, rep) for x in (ids, mask, px))
    draft = jax.device_put(jnp.zeros((2, 7), jnp.int32), rep)
    res = jax.jit(
        lambda p, i, m, x, d: greedy_decode_actions(
            p, VLA_TINY, i, m, x, cooked_weights=True, mesh=mesh,
            act_quant="int8", kv_cache="int8", visual_tokens=8,
            draft_tokens=d,
        )
    )(p_tp, ids, mask, px, draft)
    acts = np.asarray(jax.device_get(res.actions))
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))
    assert 1 <= int(jax.device_get(res.verify_passes)) <= 6


def test_policy_bare_int4_composes_with_tp():
    """Bare quantize='int4' under a TP mesh auto-resolves a group size whose
    groups never straddle a row-parallel shard (int4_group_size_for tp
    awareness) — previously the tiny model's auto gs=64 tripped the
    straddle guard at tp=2 (per-chip contraction 32)."""
    from roboticattack_tpu.eval.policy import load_policy
    from roboticattack_tpu.parallel import make_mesh

    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    pol = load_policy(None, model_name="vla-tiny", quantize="int4", mesh=mesh)
    frame = np.random.default_rng(3).integers(0, 255, (56, 56, 3), dtype=np.uint8)
    acts = pol.get_action_batch(np.stack([frame, frame]), "push the lever")
    assert acts.shape == (2, 7) and np.all(np.isfinite(acts))
    sc = pol.params["llm"]["layers"]["down_w_scale"]
    assert sc.shape[-1] == pol.cfg.llm.intermediate_size // 32  # gs=32
