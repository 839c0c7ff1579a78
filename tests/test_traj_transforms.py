"""Goal relabeling / task augmentation / subsample / pad-mask transforms, and
the unimodal (language-only) VLM forward branch."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.traj_transforms import (
    add_pad_mask_dict,
    delete_task_conditioning,
    subsample,
    to_padding,
    tree_merge,
    uniform_goal_relabel,
)

T = 8


def _traj():
    rng = np.random.default_rng(0)
    return {
        "observation": {
            "image_primary": tf.constant(rng.uniform(0, 1, (T, 4, 4, 3)), tf.float32),
            "state": tf.constant(rng.standard_normal((T, 7)), tf.float32),
        },
        "action": tf.constant(rng.standard_normal((T, 7)), tf.float32),
        "task": {"language_instruction": tf.constant(["move"] * (T - 2) + [""] * 2)},
    }


def test_uniform_goal_relabel_future_only():
    tf.random.set_seed(0)
    traj = uniform_goal_relabel(_traj())
    goal_state = np.asarray(traj["task"]["state"])
    states = np.asarray(traj["observation"]["state"])
    # each goal must be one of the STRICTLY FUTURE states (or the final state)
    for i in range(T):
        dists = np.abs(states[max(i + 1, 1):] - goal_state[i]).sum(axis=-1)
        if i < T - 1:
            assert dists.min() < 1e-6, i
    # existing task keys survive the merge
    assert "language_instruction" in traj["task"]


def test_subsample_caps_length_and_noops_short():
    traj = subsample(_traj(), 3)
    assert np.asarray(traj["action"]).shape == (3, 7)
    # all picked rows come from the original trajectory
    traj2 = subsample(_traj(), 100)
    assert np.asarray(traj2["action"]).shape == (T, 7)


def test_add_pad_mask_dict_marks_empty_strings():
    traj = add_pad_mask_dict(_traj())
    lang_mask = np.asarray(traj["task"]["pad_mask_dict"]["language_instruction"])
    np.testing.assert_array_equal(lang_mask, [True] * (T - 2) + [False] * 2)
    assert np.asarray(traj["observation"]["pad_mask_dict"]["state"]).all()


def test_delete_task_conditioning_keeps_exactly_one_modality():
    tf.random.set_seed(1)
    traj = _traj()
    # at trajectory-transform time images are still encoded JPEG strings [T]
    # (decode happens later in the frame transforms)
    traj["task"]["image_primary"] = tf.constant([f"jpeg{i}" for i in range(T)])
    traj["task"]["timestep"] = tf.range(T)
    traj = add_pad_mask_dict(traj)
    out = delete_task_conditioning(traj, keep_image_prob=0.5)
    img_kept = np.asarray(out["task"]["pad_mask_dict"]["image_primary"])
    lang_kept = np.asarray(out["task"]["pad_mask_dict"]["language_instruction"])
    # rows whose instruction was real padding keep images; otherwise XOR
    for i in range(T - 2):
        assert img_kept[i] != lang_kept[i], i
    assert img_kept[T - 2 :].all() and not lang_kept[T - 2 :].any()
    # dropped images mean goal timestep collapses to the last step
    ts = np.asarray(out["task"]["timestep"])
    assert (ts[~img_kept] == T - 1).all()
    # dropped instructions are padded to ""
    lang = out["task"]["language_instruction"].numpy()
    assert all((s == b"") == (not k) for s, k in zip(lang, lang_kept))


def test_delete_task_conditioning_noop_without_images():
    traj = add_pad_mask_dict(_traj())
    out = delete_task_conditioning(traj, keep_image_prob=0.5)
    assert np.asarray(out["task"]["pad_mask_dict"]["language_instruction"])[:-2].all()


def test_tree_merge_and_padding():
    merged = tree_merge({"a": {"x": 1}, "b": 2}, {"a": {"y": 3}})
    assert merged == {"a": {"x": 1, "y": 3}, "b": 2}
    assert to_padding(tf.constant(["a", "b"])).numpy().tolist() == [b"", b""]
    assert float(tf.reduce_sum(to_padding(tf.ones((2, 3))))) == 0.0


def test_unimodal_forward_branch():
    """pixel_values=None -> plain decoder forward (modeling_prismatic.py:344-359)."""
    import jax
    import jax.numpy as jnp

    from roboticattack_tpu.models import VLA_TINY, init_vla_params, vla_forward
    from roboticattack_tpu.models.llama import (
        cross_entropy_loss,
        embed_tokens,
        llama_apply,
    )

    params = init_vla_params(jax.random.key(0), VLA_TINY)
    ids = jnp.asarray(np.random.default_rng(0).integers(3, 1000, (2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)
    labels = jnp.where(jnp.arange(12) < 4, -100, ids)

    out = vla_forward(params, VLA_TINY, ids, mask, None, labels)
    assert out.logits.shape == (2, 12, VLA_TINY.llm.vocab_size)

    want_logits = llama_apply(
        params["llm"], VLA_TINY.llm, embed_tokens(params["llm"], ids), attention_mask=mask
    )
    np.testing.assert_allclose(np.asarray(out.logits), np.asarray(want_logits), atol=1e-6)
    want_loss = cross_entropy_loss(want_logits, labels)
    np.testing.assert_allclose(float(out.loss), float(want_loss), atol=1e-6)
