"""RLDS pipeline vs the reference's tf semantics, on synthetic trajectories
(no TFDS needed — the trajectory dataset is injected)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.rlds import (
    binarize_gripper_actions,
    bridge_orig_transform,
    compute_dataset_statistics,
    frames_to_attack_batches,
    invert_gripper_actions,
    make_frame_dataset,
    normalize_traj_actions,
    rel2abs_gripper_actions,
    relabel_bridge_actions,
)
from roboticattack_tpu.utils import WordStubTokenizer
from roboticattack_tpu.utils.constants import IGNORE_INDEX, PAD_TOKEN_ID


def _synthetic_traj_dataset(n_traj=4, traj_len=10, seed=0, image_size=32):
    def gen():
        # seed inside: each epoch (incl. the statistics pass) must yield the
        # SAME trajectories, like a real TFDS source
        rng = np.random.default_rng(seed)
        for i in range(n_traj):
            state = rng.standard_normal((traj_len, 7)).astype(np.float32)
            action = np.concatenate(
                [
                    rng.uniform(-0.5, 0.5, (traj_len, 6)),
                    rng.choice([0.0, 1.0], (traj_len, 1)),
                ],
                axis=1,
            ).astype(np.float32)
            action[0] = 0.0  # bridge quirk: first step all-zero
            images = rng.integers(0, 255, (traj_len, image_size, image_size, 3), dtype=np.uint8)
            yield {
                "image": images,
                "action": action,
                "observation": {"state": state},
                "language": np.array([b"pick up the fork"] * traj_len),
            }

    return tf.data.Dataset.from_generator(
        gen,
        output_signature={
            "image": tf.TensorSpec((None, image_size, image_size, 3), tf.uint8),
            "action": tf.TensorSpec((None, 7), tf.float32),
            "observation": {"state": tf.TensorSpec((None, 7), tf.float32)},
            "language": tf.TensorSpec((None,), tf.string),
        },
    )


def test_binarize_gripper_backward_scan():
    acts = tf.constant([1.0, 0.5, 0.5, 0.0, 0.5, 1.0], tf.float32)
    out = binarize_gripper_actions(acts).numpy()
    # intermediates take the value of the state reached after them
    np.testing.assert_array_equal(out, [1, 0, 0, 0, 1, 1])

    # reference NumPy semantics replica
    def ref(a):
        open_m, closed_m = a > 0.95, a < 0.05
        between = ~(open_m | closed_m)
        new, carry = np.empty_like(a), a[-1]
        for i in reversed(range(len(a))):
            if not between[i]:
                carry = float(open_m[i])
            new[i] = carry
        return new

    rng = np.random.default_rng(0)
    a = rng.choice([0.0, 0.3, 0.5, 0.7, 1.0], size=50).astype(np.float32)
    np.testing.assert_array_equal(binarize_gripper_actions(tf.constant(a)).numpy(), ref(a))


def test_rel2abs_gripper():
    acts = tf.constant([0.0, 0.0, 1.0, 0.0, -1.0, 0.0], tf.float32)  # close then open
    out = rel2abs_gripper_actions(acts).numpy()
    np.testing.assert_allclose(out, [1, 1, 0, 0, 1, 1])
    assert float(invert_gripper_actions(tf.constant(0.25))) == 0.75


def test_relabel_bridge_actions_state_delta():
    state = np.arange(28, dtype=np.float32).reshape(4, 7)
    traj = {
        "observation": {"state": tf.constant(state)},
        "action": tf.constant(np.ones((4, 7), np.float32)),
        "image": tf.constant(np.zeros((4, 2, 2, 3), np.uint8)),
        "language": tf.constant([b"x"] * 4),
    }
    out = relabel_bridge_actions(traj)
    assert out["action"].shape == (3, 7)
    np.testing.assert_allclose(out["action"].numpy()[:, :6], 7.0)  # state deltas
    np.testing.assert_allclose(out["action"].numpy()[:, 6], 1.0)   # gripper passthrough


def test_bridge_transform_drops_first_and_relabels():
    ds = _synthetic_traj_dataset(n_traj=1, traj_len=10)
    traj = next(iter(ds))
    out = bridge_orig_transform(dict(traj))
    # 10 steps -> drop first (9) -> relabel drops last (8)
    assert out["action"].shape[0] == 8
    g = out["action"].numpy()[:, 6]
    assert set(np.unique(g)).issubset({0.0, 1.0})


def test_statistics_and_normalization():
    ds = _synthetic_traj_dataset(n_traj=4, traj_len=10).map(bridge_orig_transform)
    stats = compute_dataset_statistics(ds)
    assert stats["num_trajectories"] == 4
    assert stats["num_transitions"] == 4 * 8
    assert stats["action"]["mask"] == [True] * 6 + [False]

    traj = next(iter(ds))
    normed = normalize_traj_actions(dict(traj), stats)["action"].numpy()
    assert normed[:, :6].min() >= -1.0 and normed[:, :6].max() <= 1.0
    # gripper dim not normalized (mask False)
    np.testing.assert_array_equal(normed[:, 6], traj["action"].numpy()[:, 6])


def test_end_to_end_frames_to_batches():
    ds = _synthetic_traj_dataset(n_traj=3, traj_len=8, image_size=40)
    frames, stats = make_frame_dataset(
        "bridge_orig", train=True, image_size=224, traj_dataset=ds, seed=0, shuffle_buffer=64
    )
    batches = frames_to_attack_batches(frames, WordStubTokenizer(), batch_size=4)
    b = next(batches)
    assert b.images.shape == (4, 224, 224, 3)
    assert b.images.dtype == np.float32 and b.images.max() <= 1.0
    assert b.input_ids.shape == b.labels.shape == b.attention_mask.shape
    assert (b.input_ids[:, 0] == 1).all()
    for row_ids, row_lab in zip(b.input_ids, b.labels):
        valid = row_lab != IGNORE_INDEX
        assert valid.sum() == 8  # 7 action tokens + EOS
        assert (row_ids != PAD_TOKEN_ID).sum() >= 10


def test_interleaved_mixture_stream():
    from roboticattack_tpu.data.rlds import make_interleaved_frame_dataset

    ds_a = _synthetic_traj_dataset(n_traj=2, traj_len=6, seed=1, image_size=36)
    ds_b = _synthetic_traj_dataset(n_traj=2, traj_len=6, seed=2, image_size=36)
    mixed, stats = make_interleaved_frame_dataset(
        {"bridge_orig": 0.7, "libero_goal_no_noops": 0.3},
        image_size=64,
        traj_datasets={"bridge_orig": ds_a, "libero_goal_no_noops": ds_b},
        shuffle_buffer=32,
        seed=0,
    )
    seen = {"bridge_orig": 0, "libero_goal_no_noops": 0}
    it = mixed.as_numpy_iterator()
    for _ in range(60):
        f = next(it)
        seen[f["dataset_name"].decode()] += 1
        assert f["image"].shape == (64, 64, 3)
    assert seen["bridge_orig"] > seen["libero_goal_no_noops"] > 0
    assert set(stats) == {"bridge_orig", "libero_goal_no_noops"}


def test_device_prefetch_preserves_order():
    import jax.numpy as jnp
    from roboticattack_tpu.data import device_prefetch

    batches = ({"x": np.full((2, 2), i, np.float32)} for i in range(10))
    out = list(device_prefetch(batches, depth=3))
    assert len(out) == 10
    for i, b in enumerate(out):
        assert isinstance(b["x"], jnp.ndarray)
        assert float(b["x"][0, 0]) == i


def test_episodic_iterator():
    from roboticattack_tpu.data.rlds import episodic_iterator

    ds = _synthetic_traj_dataset(n_traj=2, traj_len=5, image_size=30)
    eps = list(episodic_iterator(ds, image_size=48))
    assert len(eps) == 2
    assert eps[0]["image"].shape == (5, 48, 48, 3)
    assert eps[0]["action"].shape == (5, 7)


def test_augmentations():
    from roboticattack_tpu.data.rlds import make_frame_dataset, with_augmentations

    ds = _synthetic_traj_dataset(n_traj=2, traj_len=6, image_size=40)
    frames, _ = make_frame_dataset(
        "bridge_orig", train=True, image_size=64, traj_dataset=ds, seed=0, shuffle_buffer=16
    )
    aug = with_augmentations(frames, seed=1)
    it = aug.as_numpy_iterator()
    f1, f2 = next(it), next(it)
    assert f1["image"].shape == (64, 64, 3) and f1["image"].dtype == np.uint8
    # determinism: re-building the pipeline reproduces the same augmented frames
    frames2, _ = make_frame_dataset(
        "bridge_orig", train=True, image_size=64, traj_dataset=_synthetic_traj_dataset(
            n_traj=2, traj_len=6, image_size=40), seed=0, shuffle_buffer=16
    )
    it2 = with_augmentations(frames2, seed=1).as_numpy_iterator()
    np.testing.assert_array_equal(next(it2)["image"], f1["image"])


def test_host_sharding_disjoint_and_stats_global():
    from roboticattack_tpu.data.rlds import make_frame_dataset

    def build(shard_index, num_shards):
        ds = _synthetic_traj_dataset(n_traj=4, traj_len=6, image_size=30)
        return make_frame_dataset(
            "bridge_orig", train=True, image_size=32, traj_dataset=ds, seed=0,
            shuffle_buffer=1, num_shards=num_shards, shard_index=shard_index,
        )

    frames0, stats0 = build(0, 2)
    frames1, stats1 = build(1, 2)
    # statistics computed on the unsharded stream -> identical across hosts
    np.testing.assert_allclose(stats0["action"]["q99"], stats1["action"]["q99"])
    # disjoint trajectory shards -> disjoint frame actions (trajectories differ)
    a0 = {tuple(np.round(next(frames0.as_numpy_iterator())["action"], 5)) for _ in range(1)}
    acts0 = [tuple(np.round(f["action"], 5)) for _, f in zip(range(8), frames0.as_numpy_iterator())]
    acts1 = [tuple(np.round(f["action"], 5)) for _, f in zip(range(8), frames1.as_numpy_iterator())]
    assert set(acts0).isdisjoint(set(acts1))
