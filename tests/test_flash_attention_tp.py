"""Flash attention under a data x model mesh: the custom_partitioning wrapper
must run the kernel per-shard on (batch, head) blocks with no gathers, and
match the XLA reference in both values and gradients."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from roboticattack_tpu.ops.attention import causal_bias, mha, padding_bias
from roboticattack_tpu.ops.flash_attention import flash_attention


def _inputs(b=4, h=4, s=64, d=32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    mask = np.ones((b, s), np.int32)
    mask[b - 1, s - 7 :] = 0
    bias4 = causal_bias(s, s) + padding_bias(jnp.asarray(mask))  # [B,1,S,S]
    return q, k, v, bias4, mask


def _sharded(mesh, q, k, v, bias4):
    qkv_s = NamedSharding(mesh, P("data", "model", None, None))
    b_s = NamedSharding(mesh, P("data", None, None))
    return (
        jax.device_put(q, qkv_s),
        jax.device_put(k, qkv_s),
        jax.device_put(v, qkv_s),
        jax.device_put(bias4[:, 0], b_s),
    )


def test_tp_forward_no_gather_and_matches():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    q, k, v, bias4, mask = _inputs()
    qs, ks, vs, bs = _sharded(mesh, q, k, v, bias4)

    f = jax.jit(lambda q, k, v, b: flash_attention(q, k, v, b, True))
    hlo = f.lower(qs, ks, vs, bs).compile().as_text()
    assert "all-gather" not in hlo, "flash kernel was gathered/replicated under TP"

    out = np.asarray(f(qs, ks, vs, bs))
    assert f(qs, ks, vs, bs).sharding.spec == P("data", "model")
    want = np.asarray(mha(q, k, v, bias=bias4))
    for i in range(q.shape[0]):
        valid = mask[i].astype(bool)
        np.testing.assert_allclose(out[i][:, valid], want[i][:, valid], rtol=2e-5, atol=2e-5)


def test_tp_gradients_match():
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    q, k, v, bias4, mask = _inputs(b=4, h=2, s=48, d=16, seed=1)
    qs, ks, vs, bs = _sharded(mesh, q, k, v, bias4)
    valid = jnp.asarray(np.where(mask, 1.0, 0.0)[:, None, :, None])  # [B,1,S,1]

    def loss_flash(q, k, v, b):
        return jnp.sum((flash_attention(q, k, v, b, True) * valid) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((mha(q, k, v, bias=bias4) * valid) ** 2)

    g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))(qs, ks, vs, bs)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, want in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=3e-5)
