"""Microbenchmark: int4 decode-tail projection implementations on the chip.

Streams a 32-layer stack of gate-shaped projections ([11008, 4096], the
biggest per-layer weight class) through each implementation and reports
ms per full-stack stream + effective HBM bandwidth vs the packed-byte
roofline. This is the fast decision loop for the Pallas q4 kernel — no 7B
weight cooking, ~1 compile per impl.

Usage: python scripts/micro_q4.py [--b 1,8,32] [--impl all|xla4|ker_g|ker_d|xla8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", default="1,8,32")
    ap.add_argument("--impl", default="all")
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out_dim", type=int, default=11008)
    ap.add_argument("--in_dim", type=int, default=4096)
    ap.add_argument("--tile_o", type=int, default=512)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from roboticattack_tpu.models.decode import _proj
    from roboticattack_tpu.ops.q4_matmul import q4_matmul

    L, OUT, IN = args.layers, args.out_dim, args.in_dim
    GS = 128
    G = IN // GS

    # generate ON DEVICE: a multi-GB host->device upload through the axon
    # relay takes tens of minutes (bench_decode.py's cooked-shapes lesson)
    @jax.jit
    def _init(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        wp = jax.random.randint(k1, (L, OUT, IN // 2), -128, 128,
                                jnp.int32).astype(jnp.int8)
        sc = jax.random.uniform(k2, (L, OUT, G), jnp.float32, 1e-3, 2e-2)
        w8 = jax.random.randint(k3, (L, OUT, IN), -128, 128,
                                jnp.int32).astype(jnp.int8)
        s8 = jax.random.uniform(k4, (L, OUT), jnp.float32, 1e-3, 2e-2)
        return wp, sc, w8, s8

    t0 = time.time()
    wp, sc, w8, s8 = _init(jax.random.key(0))
    _ = jax.device_get(s8[0, 0])
    print(f"on-device init: {time.time()-t0:.1f}s", flush=True)
    rng = np.random.default_rng(0)

    packed_gb = wp.size / 1e9
    int8_gb = w8.size / 1e9

    def scan_over(proj, stack, scales):
        def run(y):
            def body(acc, xs):
                w_l, s_l = xs
                return acc + proj(y, w_l, s_l), None

            acc0 = jnp.zeros((y.shape[0], y.shape[1], OUT), y.dtype)
            acc, _ = jax.lax.scan(body, acc0, (stack, scales))
            return acc

        return jax.jit(run)

    impls = {
        "xla4": (scan_over(lambda y, w, s: _proj(y, w, True, s), wp, sc),
                 packed_gb),
        "ker_g": (scan_over(
            lambda y, w, s: q4_matmul(y, w, s, tile_o=args.tile_o,
                                      mode="grouped"), wp, sc), packed_gb),
        "ker_d": (scan_over(
            lambda y, w, s: q4_matmul(y, w, s, tile_o=args.tile_o,
                                      mode="dense"), wp, sc), packed_gb),
        "xla8": (scan_over(lambda y, w, s: _proj(y, w, True, s), w8, s8),
                 int8_gb),
    }
    want = list(impls) if args.impl == "all" else args.impl.split(",")

    for b in [int(x) for x in args.b.split(",")]:
        y = jnp.asarray(
            rng.standard_normal((b, 1, IN)).astype(np.float32)
        ).astype(jnp.bfloat16)
        for name in want:
            fn, gb = impls[name]
            try:
                t0 = time.time()
                r = fn(y)
                _ = jax.device_get(r[0, 0, :4])
                compile_s = time.time() - t0
                t0 = time.time()
                for _ in range(args.iters):
                    r = fn(y)
                _ = jax.device_get(r[0, 0, :4])
                dt = (time.time() - t0) / args.iters
                print(
                    f"b={b:3d} {name:6s} {dt*1e3:8.2f} ms/stream  "
                    f"{gb/dt:7.1f} GB/s  (compile {compile_s:.1f}s)",
                    flush=True,
                )
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"b={b:3d} {name:6s} FAILED: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
