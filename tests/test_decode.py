"""KV-cache greedy decode vs naive full-forward greedy decode (tiny model)."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.models import VLA_TINY, init_vla_params, vla_forward
from roboticattack_tpu.models.decode import (
    ensure_trailing_empty_token,
    greedy_decode_actions,
    unnormalize_actions,
)
from roboticattack_tpu.utils import WordStubTokenizer, dual_normalize
from roboticattack_tpu.utils.constants import EMPTY_TOKEN_ID, PAD_TOKEN_ID

CFG = VLA_TINY


def _prompt(batch=1, pad_to=16, seed=0):
    tok = WordStubTokenizer()
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(batch):
        text = f"In: What action should the robot take to close drawer {i}?\nOut: "
        ids = tok.encode(text, add_bos=True)
        rows.append(np.asarray(ids, np.int32))
    width = pad_to
    ids = np.full((batch, width), PAD_TOKEN_ID, np.int32)
    mask = np.zeros((batch, width), np.int32)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    images = rng.uniform(0, 1, (batch, 56, 56, 3)).astype(np.float32)
    return ids, mask, dual_normalize(jnp.asarray(images))


def _naive_greedy(params, ids, mask, pixels, steps=7):
    """Reference-style generation: full forward each step, argmax at the last
    real position."""
    ids = ids.copy()
    mask = mask.copy()
    out = []
    for _ in range(steps):
        logits = np.asarray(
            vla_forward(params, CFG, jnp.asarray(ids), jnp.asarray(mask), pixels, None).logits
        )
        toks = []
        for b in range(ids.shape[0]):
            n = int(mask[b].sum())
            toks.append(int(np.argmax(logits[b, n - 1])))
        out.append(toks)
        # append token (grow arrays)
        ids = np.concatenate([ids, np.full((ids.shape[0], 1), PAD_TOKEN_ID, np.int32)], 1)
        mask = np.concatenate([mask, np.zeros((ids.shape[0], 1), np.int32)], 1)
        for b in range(ids.shape[0]):
            n = int(mask[b].sum())
            ids[b, n] = out[-1][b]
            mask[b, n] = 1
    return np.asarray(out).T  # [B, steps]


def test_greedy_decode_matches_naive():
    params = init_vla_params(jax.random.key(0), CFG)
    ids, mask, pixels = _prompt(batch=2, seed=1)
    want = _naive_greedy(params, ids, mask, pixels)
    got = greedy_decode_actions(params, CFG, jnp.asarray(ids), jnp.asarray(mask), pixels)
    np.testing.assert_array_equal(np.asarray(got.tokens), want)


def test_decode_padding_invariance():
    params = init_vla_params(jax.random.key(2), CFG)
    ids, mask, pixels = _prompt(batch=1, pad_to=14, seed=3)
    ids2 = np.concatenate([ids, np.full((1, 6), PAD_TOKEN_ID, np.int32)], 1)
    mask2 = np.concatenate([mask, np.zeros((1, 6), np.int32)], 1)
    a = greedy_decode_actions(params, CFG, jnp.asarray(ids), jnp.asarray(mask), pixels)
    b = greedy_decode_actions(params, CFG, jnp.asarray(ids2), jnp.asarray(mask2), pixels)
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))


def test_detokenize_and_unnormalize():
    params = init_vla_params(jax.random.key(4), CFG)
    ids, mask, pixels = _prompt(batch=1, seed=5)
    res = greedy_decode_actions(params, CFG, jnp.asarray(ids), jnp.asarray(mask), pixels)
    actions = np.asarray(res.actions)
    assert actions.shape == (1, 7)
    assert (np.abs(actions) <= 1.0).all()
    # action_vocab_size = 32000 even though embed rows = 32064 (config :504)
    assert CFG.action_vocab_size == 32000

    stats = {"bridge_orig": {"action": {
        "q01": [-0.1] * 7, "q99": [0.1] * 7, "mask": [True] * 6 + [False]}}}
    un = unnormalize_actions(actions, stats)
    np.testing.assert_allclose(
        un[0, :6], 0.5 * (actions[0, :6] + 1) * 0.2 - 0.1, rtol=1e-6
    )
    np.testing.assert_allclose(un[0, 6], actions[0, 6])


def test_ensure_trailing_empty_token():
    ids = np.array([[1, 5, 6, PAD_TOKEN_ID]], np.int32)
    mask = np.array([[1, 1, 1, 0]], np.int32)
    out_ids, out_mask = ensure_trailing_empty_token(ids, mask)
    assert out_ids[0, 3] == EMPTY_TOKEN_ID and out_mask[0, 3] == 1

    ids2 = np.array([[1, 5, EMPTY_TOKEN_ID]], np.int32)
    mask2 = np.array([[1, 1, 1]], np.int32)
    out_ids2, out_mask2 = ensure_trailing_empty_token(ids2, mask2)
    np.testing.assert_array_equal(out_ids2[:, :3], ids2)
    assert out_mask2.sum() == 3


def test_cooked_layout_decode_is_bit_identical():
    """decode_layout_params + cooked_weights=True (the layout every real
    policy decode runs — the uncooked 7B cannot compile in 15.75 GB HBM) must
    reproduce the storage-layout decode bit-for-bit; also covers the
    Phi-safety skip of absent mlp keys."""
    import jax

    from roboticattack_tpu.models.decode import decode_layout_params

    params = jax.device_get(init_vla_params(jax.random.key(3), VLA_TINY))
    ids_np, mask_np, px = _prompt(batch=2, seed=4)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)
    a = greedy_decode_actions(
        jax.tree.map(jnp.asarray, params), VLA_TINY, ids, mask, px
    )
    cooked = decode_layout_params(params)
    b = greedy_decode_actions(
        jax.tree.map(jnp.asarray, cooked), VLA_TINY, ids, mask, px,
        cooked_weights=True,
    )
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    np.testing.assert_array_equal(np.asarray(a.actions), np.asarray(b.actions))
    # original pytree untouched (cooking copies the dict spine); gate_w is
    # non-square so the transpose is visible in the shape
    assert params["llm"]["layers"]["gate_w"].shape != cooked["llm"]["layers"]["gate_w"].shape
    np.testing.assert_array_equal(
        np.asarray(cooked["llm"]["layers"]["gate_w"]),
        np.swapaxes(np.asarray(params["llm"]["layers"]["gate_w"]), 1, 2),
    )
