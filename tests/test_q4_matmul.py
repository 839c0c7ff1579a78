"""Interpret-mode correctness for the fused int4 dequant-matmul kernel
(ops/q4_matmul.py) against the f32 reference dequant, plus layout parity
with models/quant.py packing. Serving primitive being accelerated:
modeling_prismatic.py:506-536's greedy decode steps."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.ops.q4_matmul import q4_matmul, q4_reference


def _mk(out_dim, in_dim, gs, b, s, seed=0):
    rng = np.random.default_rng(seed)
    g = in_dim // gs
    w = jnp.asarray(
        rng.integers(-128, 128, size=(out_dim, in_dim // 2), dtype=np.int64
                     ).astype(np.int8)
    )
    scale = jnp.asarray(
        (rng.standard_normal((out_dim, g)).astype(np.float32) * 0.02) ** 2
        + 1e-4
    )
    y = jnp.asarray(
        rng.standard_normal((b, s, in_dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    return y, w, scale


@pytest.mark.parametrize("mode", ["grouped", "dense"])
@pytest.mark.parametrize(
    "out_dim,in_dim,b,s",
    [
        (256, 512, 1, 1),     # matvec, row padding exercised
        (256, 512, 3, 7),     # Jacobi-pass shape, m=21 -> pad 32
        (384, 768, 2, 1),     # out % tile_o != 0 (tile 256 below)
    ],
)
def test_q4_matmul_matches_reference(mode, out_dim, in_dim, b, s):
    y, w, scale = _mk(out_dim, in_dim, gs=128, b=b, s=s)
    got = q4_matmul(y, w, scale, tile_o=256, mode=mode, interpret=True)
    want = q4_reference(y.astype(jnp.float32), w, scale)
    assert got.shape == (b, s, out_dim)
    # kernel contracts bf16 activations (exact s4 integers in bf16); the
    # reference contracts f32 — bound the relative error accordingly
    np.testing.assert_allclose(
        np.float32(got), np.float32(want),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(want).max()),
    )


def test_q4_matmul_matches_decode_proj():
    """The kernel must agree with models/decode.py's XLA int4 formulation on
    REAL quantize_decode_params packing (same layout contract end to end)."""
    from roboticattack_tpu.models.decode import _proj

    y, w, scale = _mk(256, 512, gs=128, b=2, s=1, seed=3)
    xla = _proj(y, w, cooked=True, scale=scale)
    ker = q4_matmul(y, w, scale, tile_o=256, mode="grouped", interpret=True)
    np.testing.assert_allclose(
        np.float32(ker), np.float32(xla),
        rtol=2e-2, atol=2e-2 * float(jnp.abs(xla).max()),
    )


def test_q4_matmul_rejects_bad_shapes():
    y, w, scale = _mk(256, 512, gs=128, b=1, s=1)
    with pytest.raises(ValueError, match="packed width"):
        q4_matmul(y[..., :-2], w, scale, interpret=True)


def test_int4_kernel_token_parity_grid():
    """End-to-end plumbing: greedy_decode_actions(int4_kernel=True) routes
    the decode tail through the Pallas kernel (interpreted off-TPU) and, on
    int4-grid weights with power-of-two group scales, reproduces the
    full-precision program's tokens — the same exactness construction as
    test_decode_quant.py's token-parity pins."""
    from roboticattack_tpu.models.decode import greedy_decode_actions
    from roboticattack_tpu.models import VLA_TINY
    from test_decode import _prompt
    from test_decode_quant import _cooked_tiny, _grid_pair_int4

    fl, q = _grid_pair_int4(_cooked_tiny(seed=3))
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    ref = greedy_decode_actions(
        jax.tree.map(jnp.asarray, fl), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    got = greedy_decode_actions(
        jax.tree.map(jnp.asarray, q), VLA_TINY, ids, mask, px,
        cooked_weights=True, int4_kernel=True,
    )
    np.testing.assert_array_equal(np.asarray(ref.tokens), np.asarray(got.tokens))
    np.testing.assert_array_equal(
        np.asarray(ref.actions), np.asarray(got.actions)
    )


def test_int4_kernel_jacobi_runs():
    """int4_kernel composes with the Jacobi tail (s=7 verification passes go
    through the kernel's padded-row path) — drafted decode returns the same
    tokens as the kernel's sequential tail (fixed point of the same greedy
    operator on the exact grid construction)."""
    from roboticattack_tpu.models.decode import greedy_decode_actions
    from roboticattack_tpu.models import VLA_TINY
    from test_decode import _prompt
    from test_decode_quant import _cooked_tiny, _grid_pair_int4

    _, q = _grid_pair_int4(_cooked_tiny(seed=3))
    qp = jax.tree.map(jnp.asarray, q)
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    seq = greedy_decode_actions(
        qp, VLA_TINY, ids, mask, px, cooked_weights=True, int4_kernel=True,
    )
    jac = greedy_decode_actions(
        qp, VLA_TINY, ids, mask, px, cooked_weights=True, int4_kernel=True,
        draft_tokens=jnp.asarray(seq.tokens),
    )
    np.testing.assert_array_equal(np.asarray(seq.tokens), np.asarray(jac.tokens))


def test_int4_kernel_rejects_tp_mesh():
    """The kernel has no GSPMD partitioning rules — a model>1 mesh must be
    rejected loudly, not silently gathered."""
    from roboticattack_tpu.models.decode import greedy_decode_actions
    from roboticattack_tpu.models import VLA_TINY
    from roboticattack_tpu.parallel import make_mesh
    from test_decode import _prompt
    from test_decode_quant import _cooked_tiny, _grid_pair_int4

    _, q = _grid_pair_int4(_cooked_tiny(seed=3))
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="single-device"):
        greedy_decode_actions(
            jax.tree.map(jnp.asarray, q), VLA_TINY, jnp.asarray(ids_np),
            jnp.asarray(mask_np), px, cooked_weights=True, mesh=mesh,
            int4_kernel=True,
        )
