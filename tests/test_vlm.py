"""Multimodal forward semantics on the tiny fused-backbone config."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.models import VLA_TINY, action_logit_slice, init_vla_params, vla_forward
from roboticattack_tpu.utils import WordStubTokenizer, build_vla_example, dual_normalize, pad_batch
from roboticattack_tpu.utils.constants import IGNORE_INDEX, PAD_TOKEN_ID


def _batch(batch=2, seed=0):
    rng = np.random.default_rng(seed)
    tok = WordStubTokenizer()
    ids_list, lab_list = [], []
    for i in range(batch):
        ids, lab = build_vla_example(f"move the plate {i}", rng.uniform(-1, 1, 7), tok)
        ids_list.append(ids)
        lab_list.append(lab)
    input_ids = pad_batch(ids_list, PAD_TOKEN_ID)
    labels = pad_batch(lab_list, IGNORE_INDEX)
    attn = (input_ids != PAD_TOKEN_ID).astype(np.int32)
    images = rng.uniform(0, 1, (batch, 56, 56, 3)).astype(np.float32)
    return jnp.asarray(input_ids), jnp.asarray(attn), jnp.asarray(labels), jnp.asarray(images)


def test_vla_forward_shapes_and_loss():
    cfg = VLA_TINY
    params = init_vla_params(jax.random.key(0), cfg)
    input_ids, attn, labels, images = _batch()
    pixels = dual_normalize(images)
    assert pixels.shape == (2, 2, 56, 56, 3)

    out = vla_forward(params, cfg, input_ids, attn, pixels, labels)
    s = input_ids.shape[1]
    assert out.logits.shape == (2, s, cfg.llm.vocab_size)  # text-region logits only
    assert np.isfinite(float(out.loss))
    assert float(out.loss) > 0

    sl = action_logit_slice(out.logits, cfg, s)
    assert sl.shape == (2, s - 1, cfg.llm.vocab_size)


def test_action_logit_slice_alignment():
    """logits[:, P + j] must predict text token j+1: verify by making the
    LM trivially copy its input (zero layers can't, so verify the geometry by
    teacher-forcing on CE decomposition instead): CE computed from our slice +
    labels[:, 1:] equals the model's own loss."""
    cfg = VLA_TINY
    params = init_vla_params(jax.random.key(1), cfg)
    input_ids, attn, labels, images = _batch(seed=1)
    pixels = dual_normalize(images)
    out = vla_forward(params, cfg, input_ids, attn, pixels, labels)

    sl = np.asarray(action_logit_slice(out.logits, cfg, input_ids.shape[1]))
    lab = np.asarray(labels)[:, 1:]
    valid = lab != IGNORE_INDEX
    lp = jax.nn.log_softmax(jnp.asarray(sl), axis=-1)
    tok_ll = np.take_along_axis(np.asarray(lp), np.where(valid, lab, 0)[..., None], axis=-1)[..., 0]
    manual_ce = -(tok_ll * valid).sum() / valid.sum()
    assert abs(manual_ce - float(out.loss)) < 1e-5


def test_gradient_flows_to_pixels_only_through_patches():
    cfg = VLA_TINY
    params = init_vla_params(jax.random.key(2), cfg)
    input_ids, attn, labels, images = _batch(seed=2)

    def loss_fn(imgs):
        return vla_forward(params, cfg, input_ids, attn, dual_normalize(imgs), labels).loss

    g = jax.grad(loss_fn)(images)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_forward_jits_and_is_deterministic():
    cfg = VLA_TINY
    params = init_vla_params(jax.random.key(3), cfg)
    input_ids, attn, labels, images = _batch(seed=3)
    pixels = dual_normalize(images)

    f = jax.jit(lambda p, i, a, px, l: vla_forward(p, cfg, i, a, px, l).loss)
    l1 = float(f(params, input_ids, attn, pixels, labels))
    l2 = float(f(params, input_ids, attn, pixels, labels))
    assert l1 == l2
