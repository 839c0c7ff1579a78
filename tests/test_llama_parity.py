"""Numeric parity: our Llama decoder + converter vs HF `LlamaForCausalLM`
(fp32, tiny config). This validates RMSNorm/RoPE/attention/SwiGLU/CE and the
state-dict mapping in one shot (SURVEY.md §7 step 2)."""

import numpy as np
import jax.numpy as jnp
import torch

from roboticattack_tpu.models import TINY_LLAMA
from roboticattack_tpu.models.convert import convert_llama
from roboticattack_tpu.models.llama import cross_entropy_loss, embed_tokens, llama_apply
from roboticattack_tpu.utils.constants import IGNORE_INDEX


def _build_hf_tiny():
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    hf_cfg = HFLlamaConfig(
        vocab_size=TINY_LLAMA.vocab_size,
        hidden_size=TINY_LLAMA.hidden_size,
        intermediate_size=TINY_LLAMA.intermediate_size,
        num_hidden_layers=TINY_LLAMA.num_layers,
        num_attention_heads=TINY_LLAMA.num_heads,
        num_key_value_heads=TINY_LLAMA.num_kv_heads,
        max_position_embeddings=TINY_LLAMA.max_seq_len,
        rms_norm_eps=TINY_LLAMA.rms_eps,
        rope_theta=TINY_LLAMA.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


def test_llama_matches_hf():
    model = _build_hf_tiny()
    state = {
        "language_model." + k: v.detach().numpy() for k, v in model.state_dict().items()
    }
    # HF ties nothing for llama; lm_head present. Convert:
    params = convert_llama(state, TINY_LLAMA)
    params = {k: jnp.asarray(v) if not isinstance(v, dict)
              else {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 31000, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int32)
    mask[1, 9:] = 0  # right padding on row 1
    labels = ids.copy().astype(np.int64)
    labels[:, :6] = IGNORE_INDEX
    labels[mask == 0] = IGNORE_INDEX

    with torch.no_grad():
        out = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            labels=torch.from_numpy(labels),
        )
    hf_logits = out.logits.numpy()
    hf_loss = float(out.loss)

    emb = embed_tokens(params, jnp.asarray(ids))
    logits = llama_apply(params, TINY_LLAMA, emb, attention_mask=jnp.asarray(mask))
    ours = np.asarray(logits)

    # compare only non-pad positions (HF emits junk at pad queries too, but
    # masking conventions at fully-masked rows can differ)
    np.testing.assert_allclose(ours[0], hf_logits[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(ours[1, :9], hf_logits[1, :9], rtol=2e-4, atol=2e-4)

    loss = float(cross_entropy_loss(logits, jnp.asarray(labels)))
    assert abs(loss - hf_loss) < 2e-4, (loss, hf_loss)


def test_gqa_matches_hf():
    """Grouped-query attention (the Mistral-v0.1 zoo configs: 8 kv heads for
    32 query heads) parity vs HF, through both the plain and the chunked
    attention paths."""
    import dataclasses

    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    cfg = dataclasses.replace(TINY_LLAMA, num_kv_heads=2, attn_impl="xla")
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        num_key_value_heads=2, max_position_embeddings=cfg.max_seq_len,
        rms_norm_eps=cfg.rms_eps, rope_theta=cfg.rope_theta,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    state = {
        "language_model." + k: v.detach().numpy() for k, v in model.state_dict().items()
    }
    params = convert_llama(state, cfg)
    params = {k: jnp.asarray(v) if not isinstance(v, dict)
              else {kk: jnp.asarray(vv) for kk, vv in v.items()}
              for k, v in params.items()}

    rng = np.random.default_rng(1)
    ids = rng.integers(5, 31000, size=(2, 128))
    mask = np.ones((2, 128), dtype=np.int32)
    with torch.no_grad():
        hf_logits = model(input_ids=torch.from_numpy(ids)).logits.numpy()

    emb = embed_tokens(params, jnp.asarray(ids))
    for impl in ("xla", "chunked"):  # chunked needs sq > chunk: 128 > 64
        c = dataclasses.replace(cfg, attn_impl=impl)
        ours = np.asarray(llama_apply(params, c, emb, attention_mask=jnp.asarray(mask)))
        np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4, err_msg=impl)


def test_cross_entropy_ignores_all_invalid():
    logits = jnp.zeros((1, 4, 8))
    labels = jnp.full((1, 4), IGNORE_INDEX)
    assert float(cross_entropy_loss(logits, labels)) == 0.0
