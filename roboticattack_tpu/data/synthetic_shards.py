"""Synthetic RLDS TFRecord layouts (bridge-orig schema) for tests and benches.

One writer for the episode proto schema every file layer parses
('steps/observation/<image_key>' repeated JPEG bytes,
'steps/observation/state' [T*8] floats, 'steps/action' [T*action_dim] floats,
'steps/language_instruction' repeated bytes) plus the TFDS on-disk directory
layout (<root>/<name>/<version>/<name>-train.tfrecord-... + dataset_info.json
with per-shard lengths). Keeping it in one place means a schema change in the
loaders (rlds.load_tfrecord_trajectories, native_pipeline) breaks the fixture
in exactly one spot.
"""

from __future__ import annotations

import io
import json
import os
from typing import Optional

import numpy as np


def jpeg_bytes(rng: np.random.Generator, size: int = 32) -> bytes:
    from PIL import Image

    arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def write_episode_tfrecord(
    path,
    n_episodes: int = 3,
    steps: int = 6,
    action_dim: int = 7,
    rng: Optional[np.random.Generator] = None,
    image_key: str = "image",
    image_size: int = 32,
    language: bytes = b"lift the block",
) -> None:
    """Write one TFRecord shard of RLDS episodes in the bridge schema."""
    import tensorflow as tf

    rng = rng if rng is not None else np.random.default_rng(1)
    with tf.io.TFRecordWriter(str(path)) as w:
        for _ in range(n_episodes):
            actions = rng.standard_normal((steps, action_dim)).astype(np.float32)
            actions[:, -1] = rng.uniform(-1, 1, steps)
            feats = {
                f"steps/observation/{image_key}": tf.train.Feature(
                    bytes_list=tf.train.BytesList(
                        value=[jpeg_bytes(rng, image_size) for _ in range(steps)]
                    )
                ),
                "steps/observation/state": tf.train.Feature(
                    float_list=tf.train.FloatList(
                        value=rng.standard_normal(steps * 8).astype(np.float32)
                    )
                ),
                "steps/action": tf.train.Feature(
                    float_list=tf.train.FloatList(value=actions.reshape(-1))
                ),
                "steps/language_instruction": tf.train.Feature(
                    bytes_list=tf.train.BytesList(value=[language] * steps)
                ),
            }
            w.write(tf.train.Example(
                features=tf.train.Features(feature=feats)).SerializeToString())


def write_rlds_layout(
    root,
    name: str = "bridge_orig",
    n_episodes: int = 4,
    steps: int = 6,
    image_key: str = "image_0",
    image_size: int = 32,
    n_shards: int = 1,
    with_info: bool = True,
    rng: Optional[np.random.Generator] = None,
    language: bytes = b"lift the block",
) -> str:
    """TFDS on-disk layout under <root>/<name>/1.0.0/; returns the version dir."""
    d = os.path.join(str(root), name, "1.0.0")
    os.makedirs(d, exist_ok=True)
    rng = rng if rng is not None else np.random.default_rng(0)
    per = n_episodes // n_shards
    for s in range(n_shards):
        write_episode_tfrecord(
            os.path.join(d, f"{name}-train.tfrecord-{s:05d}-of-{n_shards:05d}"),
            n_episodes=per, steps=steps, rng=rng, image_key=image_key,
            image_size=image_size, language=language,
        )
    if with_info:
        with open(os.path.join(d, "dataset_info.json"), "w") as f:
            json.dump({
                "name": name,
                "splits": [{"name": "train", "shardLengths": [str(per)] * n_shards}],
            }, f)
    return d
