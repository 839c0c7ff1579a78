"""Native (C++) file layer as a production data path: RLDS-episode TFRecords
-> frames -> AttackBatches with NO TensorFlow on the hot path, matching the
tf.data pipeline's standardization + normalization. Plus the stats-cache
SHA keying and pad_to skip-rate counters."""

import json
import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.native_pipeline import (
    NativeFrameDataset,
    np_binarize_gripper_actions,
    np_bridge_orig_transform,
    np_libero_transform,
    np_normalize_actions,
)
from roboticattack_tpu.data.rlds import (
    binarize_gripper_actions,
    bridge_orig_transform,
    compute_dataset_statistics,
    frames_to_attack_batches,
    libero_transform,
    make_frame_dataset,
    normalize_traj_actions,
    statistics_cache_path,
)
from roboticattack_tpu.utils.prompting import WordStubTokenizer

T = 6
RNG = np.random.default_rng(0)


def _jpeg(rng, size=32) -> bytes:
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    return jpeg_bytes(rng, size)


def _write_episode_tfrecord(path, n_episodes=3, action_dim=7, rng=None,
                            image_key="image"):
    from roboticattack_tpu.data.synthetic_shards import write_episode_tfrecord

    write_episode_tfrecord(path, n_episodes=n_episodes, steps=T,
                           action_dim=action_dim, rng=rng, image_key=image_key)


def _stats():
    return {
        "action": {
            "mean": [0.0] * 7, "std": [1.0] * 7, "min": [-3.0] * 7, "max": [3.0] * 7,
            "q01": [-2.0] * 7, "q99": [2.0] * 7, "mask": [True] * 6 + [False],
        }
    }


def test_numpy_transforms_match_tf():
    rng = np.random.default_rng(2)
    grip = rng.uniform(0, 1, 32).astype(np.float32)
    np.testing.assert_allclose(
        np_binarize_gripper_actions(grip),
        binarize_gripper_actions(tf.constant(grip)).numpy(), atol=1e-6,
    )
    traj_np = {
        "image": np.arange(T),
        "action": rng.standard_normal((T, 7)).astype(np.float32),
        "language": np.array([b"x"] * T, object),
        "observation": {"state": rng.standard_normal((T, 7)).astype(np.float32)},
    }
    tf_traj = {"action": tf.constant(traj_np["action"]),
               "observation": {"state": tf.constant(traj_np["observation"]["state"])}}
    got = np_bridge_orig_transform({k: (dict(v) if isinstance(v, dict) else v.copy())
                                    for k, v in traj_np.items()})
    want = bridge_orig_transform(tf_traj)
    np.testing.assert_allclose(got["action"], want["action"].numpy(), atol=1e-6)

    lib_np = np_libero_transform({"action": traj_np["action"].copy()})
    lib_tf = libero_transform({"action": tf.constant(traj_np["action"])})
    np.testing.assert_allclose(lib_np["action"], lib_tf["action"].numpy(), atol=1e-6)

    normed_np = np_normalize_actions(traj_np["action"], _stats())
    normed_tf = normalize_traj_actions(
        {"action": tf.constant(traj_np["action"])}, _stats()
    )["action"].numpy()
    np.testing.assert_allclose(normed_np, normed_tf, atol=1e-6)


def test_native_frame_dataset_end_to_end(tmp_path):
    path = tmp_path / "ep.tfrecord"
    _write_episode_tfrecord(path)
    ds = NativeFrameDataset(
        [str(path)], name="unregistered_raw", stats=_stats(), image_size=56,
        shuffle_buffer=4, seed=0, train=True,
    )
    it = ds.as_numpy_iterator()
    frames = [next(it) for _ in range(2 * 3 * T)]  # beyond one epoch -> repeats
    f = frames[0]
    assert f["image"].shape == (56, 56, 3) and f["image"].dtype == np.uint8
    assert f["action"].shape == (7,)
    assert abs(float(f["action"][:6].max())) <= 1.0  # normalized dims clipped
    assert f["language"] == b"lift the block"

    batches = frames_to_attack_batches(ds, WordStubTokenizer(), batch_size=2, pad_to=32)
    batch = next(batches)
    assert batch.images.shape == (2, 56, 56, 3)
    assert batch.images.dtype == np.float32 and batch.images.max() <= 1.0
    assert batch.input_ids.shape == (2, 32)


def test_make_frame_dataset_native_layer(tmp_path):
    # TFDS on-disk layout: <data_dir>/<name>/<version>/<name>-train.tfrecord-...
    d = tmp_path / "bridge_orig" / "1.0.0"
    d.mkdir(parents=True)
    _write_episode_tfrecord(d / "bridge_orig-train.tfrecord-00000-of-00001",
                            image_key="image_0")
    frames, stats = make_frame_dataset(
        "bridge_orig", data_dir=str(tmp_path), stats=_stats(),
        image_size=56, file_layer="native", shuffle_buffer=2,
    )
    f = next(frames.as_numpy_iterator())
    assert f["image"].shape == (56, 56, 3)
    with pytest.raises(ValueError, match="needs `stats`"):
        make_frame_dataset("bridge_orig", data_dir=str(tmp_path), file_layer="native")


def test_stats_cache_sha_keying(tmp_path):
    deps = ("builder-info-v1", "train[:95%]", "def transform(x): return x")
    path1 = statistics_cache_path(deps, str(tmp_path))
    # editing the transform source changes the cache file
    path2 = statistics_cache_path(deps[:-1] + ("def transform(x): return y",), str(tmp_path))
    assert path1 != path2
    import hashlib

    want = hashlib.sha256("".join(deps).encode()).hexdigest()
    assert os.path.basename(path1) == f"dataset_statistics_{want}.json"

    class FakeDS:
        def as_numpy_iterator(self):
            yield {"action": np.ones((4, 7), np.float32), "observation": {}}

    stats = compute_dataset_statistics(FakeDS(), str(tmp_path), hash_dependencies=deps)
    assert os.path.exists(path1)
    # reference schema: action AND proprio moment blocks + counts
    for block in ("action", "proprio"):
        for key in ("mean", "std", "min", "max", "q01", "q99"):
            assert key in stats[block], (block, key)
    assert stats["num_transitions"] == 4 and stats["num_trajectories"] == 1
    # second call loads from cache (would differ if recomputed on other data)
    class OtherDS:
        def as_numpy_iterator(self):
            yield {"action": np.zeros((9, 7), np.float32), "observation": {}}

    again = compute_dataset_statistics(OtherDS(), str(tmp_path), hash_dependencies=deps)
    assert again["num_transitions"] == 4


def test_skip_rate_counters():
    class LongPromptDS:
        def as_numpy_iterator(self):
            rng = np.random.default_rng(0)
            i = 0
            while True:
                lang = "word " * (40 if i % 2 else 2)  # alternate too-long/ok
                yield {
                    "image": rng.integers(0, 255, (56, 56, 3), dtype=np.uint8),
                    "action": rng.uniform(-1, 1, 7).astype(np.float32),
                    "language": lang,
                }
                i += 1

    counters = {}
    it = frames_to_attack_batches(
        LongPromptDS(), WordStubTokenizer(), batch_size=4, pad_to=32, counters=counters
    )
    next(it)
    assert counters["frames_seen"] >= 7
    assert counters["frames_skipped_pad_to"] >= 3
    rate = counters["frames_skipped_pad_to"] / counters["frames_seen"]
    assert 0.3 < rate < 0.7


def test_make_attack_iterators_stats_sink(tmp_path, monkeypatch):
    """stats_sink collects per-dataset statistics for the run-dir
    dataset_statistics.json the eval side consumes."""
    from roboticattack_tpu.data import rlds as rlds_mod
    from roboticattack_tpu.data.rlds import (
        make_attack_iterators,
        save_reference_statistics,
    )

    class FakeFrames:
        def as_numpy_iterator(self):
            rng = np.random.default_rng(0)
            while True:
                yield {
                    "image": rng.integers(0, 255, (56, 56, 3), dtype=np.uint8),
                    "action": rng.uniform(-1, 1, 7).astype(np.float32),
                    "language": "pick it up",
                }

    def fake_mfd(name, data_dir=None, train=True, stats=None, seed=42, **kw):
        return FakeFrames(), (stats or _stats())

    monkeypatch.setattr(rlds_mod, "make_frame_dataset", fake_mfd)
    sink = {}
    train, val = make_attack_iterators(
        "bridge_orig", 2, tokenizer=WordStubTokenizer(), stats_sink=sink
    )
    next(train)
    assert "bridge_orig" in sink and "q01" in sink["bridge_orig"]["action"]
    out = tmp_path / "dataset_statistics.json"
    save_reference_statistics(sink, str(out))
    blob = json.loads(out.read_text())
    assert blob["bridge_orig"]["action"]["q99"] == [2.0] * 7


def test_attack_cli_native_file_layer(tmp_path):
    """Full production-path integration: the attack CLI drives the C++ file
    layer (--file_layer native --stats_json ...) end-to-end on a synthetic
    RLDS TFRecord with the tiny model."""
    from roboticattack_tpu.cli.attack import main

    d = tmp_path / "bridge_orig" / "1.0.0"
    d.mkdir(parents=True)
    _write_episode_tfrecord(d / "bridge_orig-train.tfrecord-00000-of-00001",
                            image_key="image_0", n_episodes=4)
    stats_path = tmp_path / "dataset_statistics.json"
    stats_path.write_text(json.dumps({"bridge_orig": _stats()}))
    out = tmp_path / "run"
    main([
        "--attack", "tma", "--model", "vla-tiny", "--dataset", "bridge_orig",
        "--data_dir", str(tmp_path), "--file_layer", "native",
        "--stats_json", str(stats_path), "--maskidx", "0",
        "--iter", "2", "--innerLoop", "1", "--bs", "2", "--lr", "5e-2",
        "--warmup", "0", "--eval_every", "2", "--eval_batches", "1",
        "--pad_to", "48", "--shuffle_buffer", "8", "--output", str(out),
    ])
    import torch

    patch = torch.load(out / "last" / "patch.pt", weights_only=True)
    assert patch.shape == (3, 50, 50)
    assert 0.0 <= float(patch.min()) and float(patch.max()) <= 1.0
    # the run dir carries the eval-consumable statistics file
    blob = json.loads((out / "dataset_statistics.json").read_text())
    assert "bridge_orig" in blob
