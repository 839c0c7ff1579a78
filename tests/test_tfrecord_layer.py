"""TFDS-free tf.data file layer (`file_layer='tfrecord'`): reads the TFDS
on-disk layout (TFRecord shards + dataset_info.json) with plain TensorFlow —
the real-data path no longer needs `tensorflow_datasets` installed. Pinned
behaviors: trajectory equality with the episode writer, exact percent-split
boundaries from dataset_info.json, the modulus fallback, standardization +
normalization equivalence with the injected in-memory pipeline, and the full
attack CLI drive."""

import json

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.rlds import (
    _parse_split,
    bridge_orig_transform,
    compute_dataset_statistics,
    load_tfrecord_trajectories,
    make_frame_dataset,
    normalize_traj_actions,
)

from test_native_pipeline import T


def _write_layout(tmp_path, n_episodes=4, with_info=True, name="bridge_orig",
                  image_key="image_0", n_shards=1, image_size=32):
    from roboticattack_tpu.data.synthetic_shards import write_rlds_layout

    return write_rlds_layout(
        tmp_path, name=name, n_episodes=n_episodes, steps=T,
        image_key=image_key, n_shards=n_shards, with_info=with_info,
        image_size=image_size,
    )


def test_parse_split():
    assert _parse_split("train") == ("train", None, None)
    assert _parse_split("train[:95%]") == ("train", 0.0, 0.95)
    assert _parse_split("train[95%:]") == ("train", 0.95, 1.0)
    with pytest.raises(ValueError):
        _parse_split("train[weird]")


def test_tfrecord_trajectories_roundtrip(tmp_path):
    _write_layout(tmp_path, n_episodes=3)
    ds, info = load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train", return_builder_info=True
    )
    trajs = list(ds.as_numpy_iterator())
    assert len(trajs) == 3
    t0 = trajs[0]
    assert t0["image"].shape == (T,)
    assert t0["action"].shape == (T, 7)
    assert t0["observation"]["state"].shape == (T, 8)
    assert t0["language"][0] == b"lift the block"
    assert "shardLengths" in info  # builder info is the dataset_info blob


def test_tfrecord_exact_percent_split(tmp_path):
    """With dataset_info.json, train[:95%]/train[95%:] cut at exact episode
    counts (TFDS semantics, dataset.py:234-237): 20 episodes -> 19 + 1."""
    _write_layout(tmp_path, n_episodes=20, n_shards=2)
    train = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train[:95%]").as_numpy_iterator())
    val = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train[95%:]").as_numpy_iterator())
    assert len(train) == 19 and len(val) == 1
    # disjoint: the val episode's actions appear in no train episode
    val_sig = val[0]["action"].tobytes()
    assert all(t["action"].tobytes() != val_sig for t in train)


def test_tfrecord_modulus_fallback_split(tmp_path):
    """Without dataset_info.json the split falls back to a deterministic
    index modulus — still a disjoint, exhaustive partition."""
    _write_layout(tmp_path, n_episodes=10, with_info=False)
    train = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train[:95%]").as_numpy_iterator())
    val = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train[95%:]").as_numpy_iterator())
    assert len(train) + len(val) == 10
    sigs_t = {t["action"].tobytes() for t in train}
    sigs_v = {t["action"].tobytes() for t in val}
    assert not (sigs_t & sigs_v)


def test_oxe_image_key_resolution(tmp_path):
    """Any registered OXE dataset reads from disk through its registry
    primary-camera key (configs.py table), not just the 5 attack datasets."""
    import roboticattack_tpu  # noqa: F401  (registers OXE configs on import)
    from roboticattack_tpu.data.rlds import dataset_image_key

    assert dataset_image_key("bridge_orig") == "image_0"
    assert dataset_image_key("taco_play") == "rgb_static"
    assert dataset_image_key("unregistered") == "image"

    _write_layout(tmp_path, n_episodes=2, name="taco_play", image_key="rgb_static")
    trajs = list(load_tfrecord_trajectories(
        "taco_play", str(tmp_path), "train").as_numpy_iterator())
    assert len(trajs) == 2 and trajs[0]["image"].shape == (T,)


def _write_raw_oxe_layout(tmp_path, name, features, n_episodes=3, with_info=True):
    """Write RAW-schema episodes: `features` maps 'steps/...' keys to
    per-episode value builders (T rows flattened, tf.Example wire format)."""
    import roboticattack_tpu  # noqa: F401

    d = tmp_path / name / "1.0.0"
    d.mkdir(parents=True, exist_ok=True)
    path = d / f"{name}-train.tfrecord-00000-of-00001"
    rng = np.random.default_rng(3)
    with tf.io.TFRecordWriter(str(path)) as w:
        for _ in range(n_episodes):
            feats = {}
            for key, build in features.items():
                val = build(rng)
                if isinstance(val, list) and isinstance(val[0], bytes):
                    feats[key] = tf.train.Feature(
                        bytes_list=tf.train.BytesList(value=val))
                else:
                    feats[key] = tf.train.Feature(
                        float_list=tf.train.FloatList(
                            value=np.asarray(val, np.float32).reshape(-1)))
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feats)).SerializeToString())
    if with_info:
        (d / "dataset_info.json").write_text(json.dumps({
            "name": name,
            "splits": [{"name": "train", "shardLengths": [str(n_episodes)]}],
        }))


def test_raw_oxe_dataset_through_frame_pipeline(tmp_path):
    """A raw-schema OXE dataset (taco_play: nested action dict
    rel_actions_world, observation.robot_obs) runs end-to-end through
    make_frame_dataset on the tfrecord layer — the registered transform is
    applied to the RAW nested trajectory (the schema the reference's
    standardize_fn sees, dataset.py:131-200) before restructuring."""
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    _write_raw_oxe_layout(tmp_path, "taco_play", {
        "steps/observation/rgb_static": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/robot_obs": lambda r: r.standard_normal((T, 15)),
        "steps/observation/natural_language_instruction":
            lambda r: [b"wipe the table"] * T,
        "steps/action/rel_actions_world": lambda r: r.standard_normal((T, 7)),
    })
    frames, stats = make_frame_dataset(
        "taco_play", data_dir=str(tmp_path), train=True, image_size=56,
        shuffle_buffer=1, file_layer="tfrecord",
    )
    f = next(frames.as_numpy_iterator())
    assert f["image"].shape == (56, 56, 3)
    assert f["action"].shape == (7,) and np.isfinite(f["action"]).all()
    assert f["language"] == b"wipe the table"
    assert np.abs(f["action"][:6]).max() <= 1.0  # BOUNDS_Q99 clip
    assert stats["action"]["mask"] == [True] * 6 + [False]


def test_raw_oxe_dict_action_dataset(tmp_path):
    """A dict-action family dataset (fractal/rt1-style world_vector +
    rotation_delta + rel2abs gripper) through the raw tfrecord path; the
    [T]-flattened gripper column exercises the rank-1 wire decode."""
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    _write_raw_oxe_layout(tmp_path, "fractal20220817_data", {
        "steps/observation/image": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/natural_language_instruction":
            lambda r: [b"pick rxbar"] * T,
        "steps/action/world_vector": lambda r: r.standard_normal((T, 3)),
        "steps/action/rotation_delta": lambda r: r.standard_normal((T, 3)),
        "steps/action/gripper_closedness_action":
            lambda r: r.uniform(-1, 1, T),  # [T] on the wire
    })
    frames, _ = make_frame_dataset(
        "fractal20220817_data", data_dir=str(tmp_path), train=True,
        image_size=56, shuffle_buffer=1, file_layer="tfrecord",
    )
    f = next(frames.as_numpy_iterator())
    assert f["action"].shape == (7,) and np.isfinite(f["action"]).all()


def test_empty_first_shard_is_skipped(tmp_path):
    """TFDS may write empty leading shards (shardLengths allows 0); schema
    introspection must walk past them instead of dying on StopIteration."""
    import os

    d = _write_layout(tmp_path, n_episodes=4)
    old = os.path.join(d, "bridge_orig-train.tfrecord-00000-of-00001")
    os.rename(old, os.path.join(d, "bridge_orig-train.tfrecord-00001-of-00002"))
    open(os.path.join(d, "bridge_orig-train.tfrecord-00000-of-00002"), "wb").close()
    (tmp_path / "bridge_orig" / "1.0.0" / "dataset_info.json").write_text(json.dumps({
        "name": "bridge_orig",
        "splits": [{"name": "train", "shardLengths": ["0", "4"]}],
    }))
    trajs = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train").as_numpy_iterator())
    assert len(trajs) == 4


def test_split_with_no_records_raises(tmp_path):
    """An all-empty split raises a descriptive ValueError, not StopIteration."""
    import os

    d = tmp_path / "bridge_orig" / "1.0.0"
    d.mkdir(parents=True)
    open(os.path.join(d, "bridge_orig-train.tfrecord-00000-of-00001"), "wb").close()
    with pytest.raises(ValueError, match="no records"):
        load_tfrecord_trajectories("bridge_orig", str(tmp_path), "train")


def test_multi_version_dirs_pick_highest_numeric(tmp_path):
    """Two TFDS version dirs on disk: shards must come from exactly ONE dir —
    the numerically highest version ('1.10.0' > '1.2.0'; lexicographic order
    would invert them and mix shardLengths across versions)."""
    import os
    import shutil

    d = _write_layout(tmp_path, n_episodes=3)
    shutil.move(d, os.path.join(os.path.dirname(d), "1.2.0"))
    d = _write_layout(tmp_path, n_episodes=5)
    shutil.move(d, os.path.join(os.path.dirname(d), "1.10.0"))

    from roboticattack_tpu.data.native_pipeline import discover_tfrecords

    paths = discover_tfrecords("bridge_orig", str(tmp_path))
    assert len({os.path.dirname(p) for p in paths}) == 1
    assert "1.10.0" in paths[0]
    trajs = list(load_tfrecord_trajectories(
        "bridge_orig", str(tmp_path), "train").as_numpy_iterator())
    assert len(trajs) == 5


def test_raw_oxe_ragged_width_raises(tmp_path):
    """A raw-schema dataset whose per-episode feature widths differ across
    records must raise loudly at loader build instead of silently
    mis-reshaping every record after the first (widths are schema constants
    inferred from the leading records)."""
    from roboticattack_tpu.data.rlds import load_tfrecord_oxe_trajectories
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    widths = iter([15, 14, 15])
    _write_raw_oxe_layout(tmp_path, "taco_play", {
        "steps/observation/rgb_static": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/robot_obs": lambda r: r.standard_normal((T, next(widths))),
        "steps/observation/natural_language_instruction":
            lambda r: [b"wipe the table"] * T,
        "steps/action/rel_actions_world": lambda r: r.standard_normal((T, 7)),
    })
    with pytest.raises(ValueError, match="inconsistent across"):
        load_tfrecord_oxe_trajectories("taco_play", str(tmp_path), "train")


def test_raw_oxe_ragged_record_beyond_scan_window_raises(tmp_path):
    """A NON-empty record whose width disagrees with the inferred one, sitting
    BEYOND the introspection scan window (first 8 records), fails the
    per-record length assert at iteration (informative tf error) instead of
    silently mis-reshaping. Empty records stay legal (see the test above)."""
    from roboticattack_tpu.data.rlds import load_tfrecord_oxe_trajectories
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    # records 0-7: width 15 (inside the scan window); record 8: width 14
    counts = iter([15] * 8 + [14])
    _write_raw_oxe_layout(tmp_path, "taco_play", {
        "steps/observation/rgb_static": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/robot_obs":
            lambda r: r.standard_normal((T, next(counts))).reshape(-1),
        "steps/observation/natural_language_instruction":
            lambda r: [b"wipe the table"] * T,
        "steps/action/rel_actions_world": lambda r: r.standard_normal((T, 7)),
    }, n_episodes=9)
    ds = load_tfrecord_oxe_trajectories("taco_play", str(tmp_path), "train")
    with pytest.raises(tf.errors.InvalidArgumentError, match="robot_obs"):
        list(ds.as_numpy_iterator())


def test_raw_oxe_empty_feature_records_stay_legal(tmp_path):
    """A feature that is EMPTY in some records (optional / absent — parsed as
    length 0 by allow_missing) must decode as an empty tensor, not trip the
    ragged-length guard: only a non-empty wrong length is ragged."""
    from roboticattack_tpu.data.rlds import load_tfrecord_oxe_trajectories
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    # records 0-1 carry width-15 robot_obs, record 2 has it EMPTY
    counts = iter([15, 15, 0])
    _write_raw_oxe_layout(tmp_path, "taco_play", {
        "steps/observation/rgb_static": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/robot_obs":
            lambda r: r.standard_normal((T, next(counts))).reshape(-1),
        "steps/observation/natural_language_instruction":
            lambda r: [b"wipe the table"] * T,
        "steps/action/rel_actions_world": lambda r: r.standard_normal((T, 7)),
    })
    ds = load_tfrecord_oxe_trajectories("taco_play", str(tmp_path), "train")
    trajs = list(ds.as_numpy_iterator())
    assert len(trajs) == 3  # the empty-feature record decodes, not raises


def test_raw_oxe_missing_language_raises_at_build(tmp_path):
    """No language key anywhere (raw features or transform output): the
    loader raises a KeyError naming the candidates at build time, not an
    opaque tf error deep in the frame pipeline."""
    from roboticattack_tpu.data.rlds import load_tfrecord_oxe_trajectories
    from roboticattack_tpu.data.synthetic_shards import jpeg_bytes

    _write_raw_oxe_layout(tmp_path, "bridge_orig", {
        "steps/observation/image_0": lambda r: [jpeg_bytes(r, 32) for _ in range(T)],
        "steps/observation/state": lambda r: r.standard_normal((T, 7)),
        "steps/action": lambda r: r.standard_normal((T, 7)),
    })
    with pytest.raises(KeyError, match="language"):
        load_tfrecord_oxe_trajectories("bridge_orig", str(tmp_path), "train")


def test_tfrecord_layer_matches_injected_pipeline(tmp_path):
    """make_frame_dataset(file_layer='tfrecord') produces the same
    standardized + normalized trajectories as the in-memory tf pipeline fed
    the same episodes (the path every existing test exercises)."""
    _write_layout(tmp_path, n_episodes=3)

    # disk path — full split means stats aggregate all 3 episodes
    ds = load_tfrecord_trajectories("bridge_orig", str(tmp_path), "train")
    std = ds.map(bridge_orig_transform)
    stats = compute_dataset_statistics(std)
    normed = list(
        std.map(lambda t: normalize_traj_actions(t, stats)).as_numpy_iterator()
    )

    # same episodes through make_frame_dataset's tfrecord branch
    frames, stats2 = make_frame_dataset(
        "bridge_orig", data_dir=str(tmp_path), train=True, image_size=56,
        stats=stats, shuffle_buffer=1, file_layer="tfrecord",
    )
    f = next(frames.as_numpy_iterator())
    assert f["image"].shape == (56, 56, 3)
    assert stats2 is stats
    # the first frame's action row must be one of the normalized actions
    all_rows = np.concatenate([t["action"] for t in normed], axis=0)
    assert np.isclose(all_rows, f["action"], atol=1e-6).all(axis=1).any()


def test_native_and_tfrecord_layers_agree(tmp_path):
    """Cross-validation of the two independent parsers: the C++ reader
    (native_pipeline) and the plain-tf.data tfrecord layer produce the SAME
    frames from the same shards — identical normalized action multiset and
    languages, images equal within the lanczos-implementation tolerance
    (C++ resampler vs tf.image lanczos3)."""
    from roboticattack_tpu.data.rlds import dataset_image_key

    _write_layout(tmp_path, n_episodes=3, image_size=64)

    stats = compute_dataset_statistics(
        load_tfrecord_trajectories("bridge_orig", str(tmp_path), "train")
        .map(bridge_orig_transform)
    )
    frames = {}
    for layer in ("tfrecord", "native"):
        # train=True: the 3-episode val split is empty (round(.95*3)=3); both
        # layers stream all episodes in storage order at shuffle_buffer=1
        ds, _ = make_frame_dataset(
            "bridge_orig", data_dir=str(tmp_path), train=True, image_size=56,
            stats=stats, shuffle_buffer=1, file_layer=layer,
        )
        it = ds.as_numpy_iterator()
        # 3 episodes x (T - 2 dropped by the bridge transform) frames
        out = [next(it) for _ in range(3 * (T - 2))]
        frames[layer] = sorted(out, key=lambda f: f["action"].tobytes())
    assert dataset_image_key("bridge_orig") == "image_0"
    for a, b in zip(frames["tfrecord"], frames["native"]):
        np.testing.assert_array_equal(a["action"], b["action"])
        assert a["language"] == b["language"]
        diff = np.abs(a["image"].astype(np.int16) - b["image"].astype(np.int16))
        assert np.mean(diff) < 1.5 and np.percentile(diff, 99) <= 4, (
            diff.mean(), diff.max())


def test_statistics_aggregate_full_split(tmp_path):
    """Statistics come from the FULL split (the reference's split='all',
    dataset.py:209-222), not the loaded 95%/5% slice: a train-split and a
    val-split make_frame_dataset produce identical stats from one cache
    entry, so both normalize identically."""
    _write_layout(tmp_path, n_episodes=20)
    _, stats_train = make_frame_dataset(
        "bridge_orig", data_dir=str(tmp_path), train=True, image_size=56,
        shuffle_buffer=1, file_layer="tfrecord",
    )
    _, stats_val = make_frame_dataset(
        "bridge_orig", data_dir=str(tmp_path), train=False, image_size=56,
        shuffle_buffer=1, file_layer="tfrecord",
    )
    assert stats_train == stats_val
    assert stats_train["num_trajectories"] == 20  # all episodes, not 19


def test_interleaved_mixture_from_disk(tmp_path):
    """A weighted 2-dataset mixture reads straight from on-disk shards via
    the tfrecord layer (make_interleaved_dataset semantics,
    rlds/dataset.py:457-588), tagging frames with their dataset of origin."""
    from roboticattack_tpu.data.rlds import make_interleaved_frame_dataset

    _write_layout(tmp_path, n_episodes=20, name="bridge_orig", image_key="image_0")
    _write_layout(tmp_path, n_episodes=20, name="libero_goal_no_noops",
                  image_key="image")
    mixed, stats = make_interleaved_frame_dataset(
        {"bridge_orig": 3.0, "libero_goal_no_noops": 1.0},
        data_dir=str(tmp_path), image_size=56, shuffle_buffer=4,
        file_layer="tfrecord",
    )
    assert set(stats) == {"bridge_orig", "libero_goal_no_noops"}
    seen = {b"bridge_orig": 0, b"libero_goal_no_noops": 0}
    it = mixed.as_numpy_iterator()
    for _ in range(80):
        f = next(it)
        assert f["image"].shape == (56, 56, 3)
        seen[f["dataset_name"]] += 1
    assert seen[b"bridge_orig"] > seen[b"libero_goal_no_noops"] > 0  # ~3:1


def test_attack_cli_tfrecord_file_layer(tmp_path):
    """Full integration: the attack CLI on --file_layer tfrecord computes
    statistics from the shards (no --stats_json needed, unlike 'native') and
    trains end-to-end. Needs >=20 episodes so train[95%:] is non-empty
    (round(0.95*n) cuts like TFDS; a 4-episode dataset has an empty val
    split in the reference too)."""
    from roboticattack_tpu.cli.attack import main

    _write_layout(tmp_path, n_episodes=20)
    out = tmp_path / "run"
    main([
        "--attack", "tma", "--model", "vla-tiny", "--dataset", "bridge_orig",
        "--data_dir", str(tmp_path), "--file_layer", "tfrecord",
        "--maskidx", "0", "--iter", "2", "--innerLoop", "1", "--bs", "2",
        "--lr", "5e-2", "--warmup", "0", "--eval_every", "2",
        "--eval_batches", "1", "--pad_to", "48", "--shuffle_buffer", "8",
        "--output", str(out),
    ])
    import torch

    patch = torch.load(out / "last" / "patch.pt", weights_only=True)
    assert patch.shape == (3, 50, 50)
    blob = json.loads((out / "dataset_statistics.json").read_text())
    assert "bridge_orig" in blob
