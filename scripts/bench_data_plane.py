"""Host data-plane throughput: frames/s of each file layer on synthetic
RLDS TFRecord shards (256px JPEG frames like real bridge_orig, so BOTH layers
pay the lanczos resize to 224; bridge schema + transform + normalization —
everything up to the accelerator feed).

Usage: python scripts/bench_data_plane.py [--episodes 64] [--steps 40]
Prints one line per available layer. The attack consumes ~10 frames/s/chip
(bs=8 at ~1.24 inner steps/s with innerLoop>=1 reusing the batch), so any
layer comfortably above that keeps the TPU fed; the margin is the headroom
for multi-chip DP feeding from one host.
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_shards(root: str, episodes: int, steps: int, image_size: int) -> None:
    from roboticattack_tpu.data.synthetic_shards import write_rlds_layout

    write_rlds_layout(
        root, name="bridge_orig", n_episodes=episodes, steps=steps,
        image_key="image_0", image_size=image_size,
        language=b"put the spoon on the towel",
    )


def bench_layer(layer: str, root: str, stats, n_frames: int) -> float:
    from roboticattack_tpu.data.rlds import make_frame_dataset

    frames, _ = make_frame_dataset(
        "bridge_orig", data_dir=root, train=True, image_size=224, stats=stats,
        shuffle_buffer=256, file_layer=layer,
    )
    it = frames.as_numpy_iterator()
    for _ in range(32):  # warmup: fill prefetch/shuffle machinery
        next(it)
    t0 = time.perf_counter()
    for _ in range(n_frames):
        next(it)
    dt = time.perf_counter() - t0
    return n_frames / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=64)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--frames", type=int, default=1500)
    ap.add_argument("--data_dir", default=None, help="reuse an existing layout")
    args = ap.parse_args()

    from roboticattack_tpu.data.rlds import (
        bridge_orig_transform,
        compute_dataset_statistics,
        load_tfrecord_trajectories,
    )

    tmp = None
    root = args.data_dir
    if root is None:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
        print(f"writing {args.episodes} episodes x {args.steps} steps ...",
              file=sys.stderr)
        write_shards(root, args.episodes, args.steps, 256)

    stats = compute_dataset_statistics(
        load_tfrecord_trajectories("bridge_orig", root, "train").map(bridge_orig_transform)
    )
    for layer in ("tfrecord", "native"):
        try:
            rate = bench_layer(layer, root, stats, args.frames)
            print(f"{layer:9s} {rate:8.0f} frames/s")
        except Exception as e:  # layer unavailable (e.g. native lib build failure)
            print(f"{layer:9s} unavailable: {type(e).__name__}: {e}")
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
