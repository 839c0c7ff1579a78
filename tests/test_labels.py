"""Label masking / rewriting vs. a direct NumPy re-implementation of the
reference's boolean-indexing semantics (TMA.py:124-129, UADA.py:371-379)."""

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.utils import (
    build_tma_target_tokens,
    build_vla_example,
    extract_action_tokens,
    gripper_open_rows,
    mask_labels,
    overwrite_with_target,
    pad_batch,
    WordStubTokenizer,
)
from roboticattack_tpu.utils.constants import (
    ACTION_TOKEN_BEGIN_IDX,
    ACTION_TOKEN_MIN,
    EOS_TOKEN_ID,
    IGNORE_INDEX,
    PAD_TOKEN_ID,
)


def _make_label_batch(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    tok = WordStubTokenizer()
    ids_list, label_list = [], []
    for i in range(batch):
        action = rng.uniform(-1, 1, size=7)
        ids, labels = build_vla_example(f"pick up the bowl variant {i}", action, tok)
        ids_list.append(ids)
        label_list.append(labels)
    input_ids = pad_batch(ids_list, PAD_TOKEN_ID)
    labels = pad_batch(label_list, IGNORE_INDEX)
    return input_ids, labels


def test_example_geometry():
    input_ids, labels = _make_label_batch()
    # each row: exactly 7 action tokens + 1 EOS labeled
    for row_ids, row_lab in zip(input_ids, labels):
        valid = row_lab != IGNORE_INDEX
        assert valid.sum() == 8
        action_lab = row_lab[row_lab > ACTION_TOKEN_BEGIN_IDX]
        assert action_lab.shape[0] == 7
        assert row_lab[valid][-1] == EOS_TOKEN_ID
        assert row_ids[0] == 1  # BOS


def _reference_mask_labels(labels, maskidx):
    labels = labels.copy()
    mask = labels > ACTION_TOKEN_BEGIN_IDX
    masked = labels[mask].reshape(-1, 7)
    template = np.full_like(masked, IGNORE_INDEX)
    for idx in maskidx:
        template[:, idx] = masked[:, idx]
    labels[labels > 2] = template.reshape(-1)
    return labels


def test_mask_labels_matches_reference():
    _, labels = _make_label_batch()
    for maskidx in ([0], [6], [0, 1, 2], [0, 1, 2, 3, 4, 5, 6]):
        expected = _reference_mask_labels(labels, maskidx)
        got = np.asarray(mask_labels(jnp.asarray(labels), maskidx))
        np.testing.assert_array_equal(got, expected)


def test_overwrite_with_target_matches_reference():
    _, labels = _make_label_batch()
    target = build_tma_target_tokens(np.zeros(7), maskidx=[0, 6])
    assert target.shape == (8,)
    assert target[0] == 31872 and target[6] == 31872
    assert all(target[i] == IGNORE_INDEX for i in (1, 2, 3, 4, 5, 7))

    expected = labels.copy()
    for j in range(expected.shape[0]):
        row = expected[j]
        row[row != IGNORE_INDEX] = target
    got = np.asarray(overwrite_with_target(jnp.asarray(labels), jnp.asarray(target)))
    np.testing.assert_array_equal(got, expected)


def test_extract_action_tokens_and_gripper_filter():
    _, labels = _make_label_batch(batch=6, seed=3)
    acts = np.asarray(extract_action_tokens(jnp.asarray(labels)))
    expected = np.stack(
        [row[row > ACTION_TOKEN_BEGIN_IDX] for row in labels]
    )
    np.testing.assert_array_equal(acts, expected)

    # force row 0's gripper token to the +1 token and check the filter
    labels2 = labels.copy()
    pos = np.where(labels2[0] > ACTION_TOKEN_BEGIN_IDX)[0][-1]
    labels2[0, pos] = ACTION_TOKEN_MIN
    open_rows = np.asarray(gripper_open_rows(jnp.asarray(labels2)))
    assert open_rows[0]


def test_change_target_flips_directions():
    from roboticattack_tpu.utils import change_target
    from roboticattack_tpu.utils.constants import ACTION_TOKEN_ZERO, ACTION_TOKEN_MAX

    labels = jnp.asarray(
        [[IGNORE_INDEX, ACTION_TOKEN_ZERO, ACTION_TOKEN_ZERO + 5, ACTION_TOKEN_ZERO - 5, 2]]
    )
    out = np.asarray(change_target(labels, jax.random.key(0)))
    assert out[0, 0] == IGNORE_INDEX
    assert out[0, 1] in (ACTION_TOKEN_MIN, ACTION_TOKEN_MAX)
    assert out[0, 2] == ACTION_TOKEN_MIN   # negative action -> +1 token
    assert out[0, 3] == ACTION_TOKEN_MAX   # positive action -> -1 token
    assert out[0, 4] == ACTION_TOKEN_MAX   # EOS flips too (reference quirk)


def test_guide_mode_masks_before_flipping():
    """upa_guide composition (UPA.py:128-131): mask_labels runs first, so
    action dims outside --maskidx stay IGNORE and never receive flipped
    targets."""
    from roboticattack_tpu.utils import change_target
    from roboticattack_tpu.utils.constants import ACTION_TOKEN_MAX, ACTION_TOKEN_MIN

    # 7 action tokens (alternating signs) + EOS, one leading prompt ignore
    acts = [ACTION_TOKEN_ZERO_OFF(i) for i in range(7)]
    labels = np.array([[IGNORE_INDEX] + acts + [2]], dtype=np.int32)
    out = np.asarray(
        change_target(mask_labels(jnp.asarray(labels), [0, 2]), jax.random.key(1))
    )
    flipped = {ACTION_TOKEN_MIN, ACTION_TOKEN_MAX}
    assert out[0, 1] in flipped and out[0, 3] in flipped  # maskidx dims flip
    for j in (2, 4, 5, 6, 7):                             # others stay IGNORE
        assert out[0, j] == IGNORE_INDEX, (j, out)
    assert out[0, 8] == ACTION_TOKEN_MAX                  # EOS still flips


def ACTION_TOKEN_ZERO_OFF(i):
    from roboticattack_tpu.utils.constants import ACTION_TOKEN_ZERO

    return ACTION_TOKEN_ZERO + (5 if i % 2 else -5)


def test_modify_labels_dict():
    from roboticattack_tpu.utils.labels import modify_labels_dict

    labels = jnp.asarray([[IGNORE_INDEX, IGNORE_INDEX, 31800, 31801, 31802, 2]])
    out = np.asarray(modify_labels_dict(labels, {"0": 31744, "2": 31999, "1": -100}))
    assert out[0, 2] == 31744   # first valid + 0
    assert out[0, 3] == 31801   # -100 entry skipped
    assert out[0, 4] == 31999   # first valid + 2
