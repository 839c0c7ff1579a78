"""Batched predict_action throughput on the 7B (serving benchmark).

The reference's `predict_action` path is bs=1-only (HF cached generate,
modeling_prismatic.py:325-341); ours is batch-native (models/decode.py). On a
weight-streaming-bound decode, N simultaneous requests (or N lockstep eval
environments, eval/libero.py batch_trials) cost ~one request's wall-clock —
this script measures actions/s at several batch sizes on the attached chip.

Usage: python scripts/bench_decode.py [--model openvla-7b] [--batches 1,2,4,8]
Prints one JSON line per batch size on stdout; diagnostics on stderr.
"""

import argparse
import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="default: openvla-7b on TPU, vla-tiny on CPU")
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--prompt_pad", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roboticattack_tpu.models import get_config, init_vla_params
    from roboticattack_tpu.models.decode import greedy_decode_actions
    from roboticattack_tpu.utils import WordStubTokenizer
    from roboticattack_tpu.utils.constants import PAD_TOKEN_ID

    platform = jax.devices()[0].platform
    name = args.model or ("vla-tiny" if platform == "cpu" else "openvla-7b")
    cfg = get_config(name)
    log(f"platform={platform} model={name}")

    t0 = time.time()
    params = jax.jit(lambda k: init_vla_params(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    log(f"param init: {time.time()-t0:.1f}s")

    tok = WordStubTokenizer()
    ids = np.asarray(tok.encode(
        "In: What action should the robot take to pick up the block?\nOut:",
        add_bos=True), np.int32)
    row = np.full((1, args.prompt_pad), PAD_TOKEN_ID, np.int32)
    mask = np.zeros((1, args.prompt_pad), np.int32)
    row[0, : len(ids)] = ids
    mask[0, : len(ids)] = 1

    decode = jax.jit(lambda p, i, m, px: greedy_decode_actions(p, cfg, i, m, px))
    rng = np.random.default_rng(0)
    size = cfg.dino.image_size
    for bs in [int(b) for b in args.batches.split(",")]:
        px = jnp.asarray(
            rng.standard_normal((bs, 2, size, size, 3)), jnp.dtype(cfg.dtype)
        )
        i_b = jnp.broadcast_to(jnp.asarray(row), (bs, args.prompt_pad))
        m_b = jnp.broadcast_to(jnp.asarray(mask), (bs, args.prompt_pad))
        t0 = time.time()
        out = decode(params, i_b, m_b, px)
        jax.block_until_ready(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(args.iters):
            t0 = time.time()
            out = decode(params, i_b, m_b, px)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        best = min(times)
        print(json.dumps({
            "metric": "predict_action_throughput",
            "batch": bs,
            "latency_s": round(best, 4),
            "actions_per_sec": round(bs / best, 2),
            "compile_s": round(compile_s, 1),
        }), flush=True)
        log(f"bs={bs}: {best*1000:.1f} ms/call -> {bs/best:.2f} actions/s")


if __name__ == "__main__":
    main()
