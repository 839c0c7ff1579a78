"""Phi-2 decoder parity vs HF `PhiForCausalLM` (the reference's phi-2+3b zoo
backbone, prismatic/models/backbones/llm/phi.py) — pins the parallel
residual, partial rotary, biased projections, gelu_new MLP, LayerNorm
placement, and every converter name/transpose."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from roboticattack_tpu.models.config import PhiConfig, VLA_TINY
from roboticattack_tpu.models.phi import convert_phi, init_phi_params, phi_apply

TINY_PHI = PhiConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, max_seq_len=64,
)


def _tiny_hf_phi():
    from transformers import PhiConfig as HFPhiConfig
    from transformers import PhiForCausalLM

    hf_cfg = HFPhiConfig(
        vocab_size=TINY_PHI.vocab_size, hidden_size=TINY_PHI.hidden_size,
        num_hidden_layers=TINY_PHI.num_layers,
        num_attention_heads=TINY_PHI.num_heads,
        num_key_value_heads=TINY_PHI.num_heads,
        intermediate_size=TINY_PHI.intermediate_size,
        partial_rotary_factor=TINY_PHI.partial_rotary_factor,
        rope_theta=TINY_PHI.rope_theta, layer_norm_eps=TINY_PHI.ln_eps,
        hidden_act="gelu_new", max_position_embeddings=TINY_PHI.max_seq_len,
        attention_dropout=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    return PhiForCausalLM(hf_cfg).eval()


def test_phi_rotary_dim():
    assert TINY_PHI.head_dim == 16
    assert TINY_PHI.rotary_dim == 6  # int(16 * 0.4), matches HF rotary_ndims
    assert PhiConfig().rotary_dim == 32  # phi-2: int(80 * 0.4)


def test_phi_parity_vs_hf():
    model = _tiny_hf_phi()
    sd = {"language_model." + k: v.numpy() for k, v in model.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_phi(sd, TINY_PHI))

    rng = np.random.default_rng(0)
    ids = rng.integers(2, TINY_PHI.vocab_size, (2, 11))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()

    emb = params["embed"][jnp.asarray(ids)]
    got = np.asarray(phi_apply(params, TINY_PHI, emb))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    # left-context invariance under right padding + mask
    mask = np.ones((2, 11), np.int32)
    mask[:, 8:] = 0
    got_masked = np.asarray(
        phi_apply(params, TINY_PHI, emb, attention_mask=jnp.asarray(mask))
    )
    with torch.no_grad():
        want_short = model(torch.from_numpy(ids[:, :8])).logits.numpy()
    np.testing.assert_allclose(got_masked[:, :8], want_short, rtol=2e-4, atol=2e-5)

    # logits_tail slices positions, not values
    tail = np.asarray(phi_apply(params, TINY_PHI, emb, logits_tail=4))
    np.testing.assert_allclose(tail, got[:, -4:], rtol=1e-6)


def test_phi_vla_forward_and_grads():
    """A phi-decoder VLA config runs the multimodal forward with finite loss
    and gradients w.r.t. pixels (what the attack engine differentiates)."""
    from roboticattack_tpu.models import init_vla_params, vla_forward

    cfg = dataclasses.replace(VLA_TINY, name="tiny-phi", llm=TINY_PHI)
    params = init_vla_params(jax.random.key(0), cfg)
    assert "b" in params["llm"]["lm_head"]  # phi head is biased

    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(2, 120, (2, 10)))
    mask = jnp.ones((2, 10), jnp.int32)
    labels = jnp.asarray(np.where(rng.random((2, 10)) < 0.5, np.asarray(ids), -100))
    pixels = jnp.asarray(rng.random((2, 2, 56, 56, 3)), jnp.float32)

    def loss_fn(px):
        return vla_forward(params, cfg, ids, mask, px, labels).loss

    loss, grad = jax.value_and_grad(loss_fn)(pixels)
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).sum()) > 0

    # unimodal branch dispatches to phi too
    out = vla_forward(params, cfg, ids, mask, None, labels)
    assert np.isfinite(float(out.loss))


def test_phi_params_shard_under_tp_mesh():
    """vla_param_specs tolerates the Phi layer layout (unknown keys
    replicate; biased lm_head gets vocab-sharded w + b)."""
    import jax as _jax

    if len(_jax.devices()) < 4:
        pytest.skip("needs the virtual multi-device mesh")

    from roboticattack_tpu.models import init_vla_params
    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.sharding import shard_params

    cfg = dataclasses.replace(VLA_TINY, name="tiny-phi", llm=TINY_PHI)
    params = init_vla_params(jax.random.key(1), cfg)
    mesh = make_mesh(data=2, model=2, devices=_jax.devices()[:4])
    sharded = shard_params(params, mesh)
    assert np.isfinite(np.asarray(sharded["llm"]["lm_head"]["w"])).all()


def test_phi_decode_guarded():
    from roboticattack_tpu.models.decode import greedy_decode_actions

    cfg = dataclasses.replace(VLA_TINY, llm=TINY_PHI)
    with pytest.raises(NotImplementedError, match="Phi-2"):
        greedy_decode_actions(
            None, cfg, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32),
            jnp.zeros((1, 2, 56, 56, 3)),
        )
