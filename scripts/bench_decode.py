"""Batched predict_action throughput on the 7B (serving benchmark).

The reference's `predict_action` path is bs=1-only (HF cached generate,
modeling_prismatic.py:325-341); ours is batch-native (models/decode.py). On a
weight-streaming-bound decode, N simultaneous requests (or N lockstep eval
environments, eval/libero.py batch_trials) cost ~one request's wall-clock —
this script measures actions/s at several batch sizes on the attached chip.

Usage: python scripts/bench_decode.py [--model openvla-7b] [--batches 1,2,4]
(bs>=6 OOMs at compile on one 15.75 GB v5e — see the --batches help text)
Prints one JSON line per batch size on stdout; diagnostics on stderr.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None, help="default: openvla-7b on TPU, vla-tiny on CPU")
    # bs>4 on one 15.75 GB v5e OOMs at compile: XLA materializes the KV cache
    # in 2-3 layouts during prefill->cache assembly (~590 MB each at bs=6),
    # which on top of 13.5 GB of weights exceeds HBM. bs<=4 fits and already
    # demonstrates the batched-serving scaling (measured 5.6 -> 12.9
    # actions/s from bs 1 -> 4); larger batches need TP over >=2 chips.
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--prompt_pad", type=int, default=64)
    # tensor-parallel serving over the first `tp` attached devices (Megatron
    # splits via parallel.sharding.decode_param_specs, head-sharded KV cache);
    # tp=2 fits bs=8 in 2x 15.75 GB (compiled per-chip numbers pinned in
    # tests/test_decode_tp.py). Needs >=tp devices — ready for multi-chip.
    ap.add_argument("--tp", type=int, default=1)
    # data-parallel serving: batch rows shard over a 'data' mesh axis (the
    # KV cache and activations shard with them, models/decode.py pins it);
    # composes with --tp as a dp x tp grid over the first dp*tp devices —
    # the throughput-scaling axis once weights fit per chip
    ap.add_argument("--dp", type=int, default=1)
    # weight-only int8 (models/quant.py): ~7.7 GB of weight arguments instead
    # of 13.5 on the 7B, so bs>=8 batched serving fits ONE 15.75 GB v5e, and
    # a weight-streaming-bound decode step reads half the HBM bytes. int4
    # (grouped scales, group=128): ~5.0 GB, packed s4 streaming per step
    # grammar: int8 | int4 | int4:<group_size> (bare int4 resolves the group
    # size per-model via models.quant.int4_group_size_for)
    from roboticattack_tpu.utils.quant_args import quantize_arg

    ap.add_argument("--quantize", default=None, type=quantize_arg)
    # int8 KV cache with exact per-position dequantization (models/decode.py
    # _attend_kv8): halves the cache bytes — the next ceiling after weight
    # quantization at large serving batches
    ap.add_argument("--kv_cache", default=None, choices=[None, "int8", "int4"])
    # Jacobi self-speculative tail (models/decode.py draft_tokens): 'warm'
    # drafts with the previous identical call's tokens (the control-loop
    # best case — one verification pass replaces the 6-step tail), 'cold'
    # drafts zeros (worst case: bounded by the sequential tail's 6 streams),
    # 'stream': decode a temporally-CORRELATED image sequence drafting each
    # frame with the previous frame's decoded tokens — the control-loop
    # middle ground the warm/cold bounds bracket (consecutive robot
    # observations are highly correlated); reports the verify-pass
    # distribution over --stream_len frames
    ap.add_argument("--jacobi", default=None,
                    choices=[None, "warm", "cold", "stream"])
    ap.add_argument("--stream_len", type=int, default=24,
                    help="frames per correlated stream (--jacobi stream)")
    ap.add_argument("--stream_alpha", type=float, default=0.15,
                    help="per-frame innovation: x' = sqrt(1-a^2)*x + a*noise")
    # phase attribution: ALSO time a num_steps=1 program (prefill + argmax,
    # no decode tail) and report prefill_s / tail_s per row — the breakdown
    # that attributes a w8a8 or vt speedup to the prefill and a jacobi/kv
    # speedup to the tail. Costs one extra compile per batch size.
    ap.add_argument("--split_phases", action="store_true")
    # LOSSY prefill/cache reduction: keep only the k most salient patch
    # tokens before the LLM (models/decode.py visual_tokens) — prefill is
    # the FLOP bill at bs>=8, so k=128 ~halves it
    ap.add_argument("--visual_tokens", default=None, type=int)
    # fused Pallas dequant-matmul decode tail for int4 weights
    # (ops/q4_matmul.py); auto = on for single-device int4 on the TPU
    ap.add_argument("--int4_kernel", default="auto",
                    choices=["auto", "on", "off"])
    # shell-env JAX_PLATFORMS is silently ignored on this box (sitecustomize
    # pins the TPU plugin — CLAUDE.md gotcha); this flag is the working override
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from roboticattack_tpu.models import get_config, init_vla_params
    from roboticattack_tpu.models.decode import decode_layout_shapes, greedy_decode_actions
    from roboticattack_tpu.utils import WordStubTokenizer
    from roboticattack_tpu.utils.constants import ACTION_DIM, PAD_TOKEN_ID

    platform = jax.devices()[0].platform
    name = args.model or ("vla-tiny" if platform == "cpu" else "openvla-7b")
    cfg = get_config(name)
    log(f"platform={platform} model={name}")

    # random weights DIRECTLY in the cooked decode layout, generated on
    # device: feeding the storage layout makes the 7B decode program
    # materialize ~3.6 GB of transposed weight temps and OOM HBM at compile
    # (models/decode.py:decode_layout_params), and neither a host init
    # (minutes on one CPU core + a 13.5 GB relay upload) nor an on-device
    # transpose (2x HBM) is workable — so build the cooked SHAPES via
    # eval_shape and fill them with random normals on device.
    t0 = time.time()
    shapes = jax.eval_shape(lambda k: init_vla_params(k, cfg), jax.random.key(0))
    shapes = decode_layout_shapes(shapes)
    from roboticattack_tpu.utils.quant_args import resolve_quantize

    # w8a8 resolves to int8 weight storage + dynamic int8 prefill activations
    quant_mode, act_quant, quant_gs = resolve_quantize(args.quantize)
    if quant_mode:
        from roboticattack_tpu.models.quant import (
            int4_group_size_for,
            quantize_decode_shapes,
        )

        # int4 grouped scales need a group size dividing every contraction
        # dim; 128 (the 7B default) does not divide the tiny CPU model's
        # dims. tp-aware so groups never straddle row-parallel shards.
        shapes = quantize_decode_shapes(shapes, mode=quant_mode,
                                        group_size=quant_gs
                                        or int4_group_size_for(cfg, tp=args.tp))
    leaves, treedef = jax.tree.flatten(shapes)

    mesh = None
    out_shardings = None
    if args.tp > 1 or args.dp > 1:
        from jax.sharding import NamedSharding
        from roboticattack_tpu.parallel import make_serving_mesh
        from roboticattack_tpu.parallel.sharding import decode_param_specs

        try:
            mesh = make_serving_mesh(tp=args.tp, dp=args.dp)
        except ValueError as e:
            log(str(e))
            sys.exit(2)
        # generate the weights DIRECTLY into their shards (out_shardings on
        # the init jit) — no chip ever holds the full 13.5 GB
        out_shardings = jax.tree.map(
            lambda sp: NamedSharding(mesh, sp), decode_param_specs(shapes)
        )
        log(f"dp={args.dp} x tp={args.tp} mesh over "
            f"{mesh.devices.ravel().tolist()}")

    @(jax.jit if out_shardings is None else
      (lambda f: jax.jit(f, out_shardings=out_shardings)))
    def gen(key):
        keys = jax.random.split(key, len(leaves))

        def one(k, s):
            # int8/int4 leaves (--quantize): uniform full-range weights;
            # their f32 scale leaves get ~0.02/qmax so dequantized magnitudes
            # match the bf16 branch. Values are irrelevant to throughput —
            # dtypes and shapes are what the program streams.
            if s.dtype == jnp.int8:
                return jax.random.randint(k, s.shape, -127, 128, jnp.int32).astype(jnp.int8)
            if s.dtype == jnp.dtype(jnp.int4):
                return jax.random.randint(k, s.shape, -7, 8, jnp.int32).astype(jnp.int4)
            draw = jax.random.normal(k, s.shape, dtype=jnp.float32) * 0.02
            if quant_mode and s.dtype == jnp.float32:
                qmax = 127.0 if quant_mode == "int8" else 7.0
                draw = jnp.abs(draw) / qmax + 1e-6
            return draw.astype(s.dtype)

        return jax.tree.unflatten(treedef, [one(k, s) for k, s in zip(keys, leaves)])

    params = gen(jax.random.key(0))
    # block_until_ready does not block through the axon relay (CLAUDE.md
    # gotcha) — materialize a scalar to actually synchronize, so the first
    # batch's compile_s metric isn't inflated by param generation
    np.asarray(jax.device_get(jax.tree.leaves(params)[0].ravel()[0]))
    log(f"cooked-layout param init: {time.time()-t0:.1f}s")

    tok = WordStubTokenizer()
    ids = np.asarray(tok.encode(
        "In: What action should the robot take to pick up the block?\nOut:",
        add_bos=True), np.int32)
    row = np.full((1, args.prompt_pad), PAD_TOKEN_ID, np.int32)
    mask = np.zeros((1, args.prompt_pad), np.int32)
    row[0, : len(ids)] = ids
    mask[0, : len(ids)] = 1

    q4k = (
        quant_mode == "int4" and args.tp == 1 and platform == "tpu"
        if args.int4_kernel == "auto" else args.int4_kernel == "on"
    )
    if q4k:
        log("int4_kernel: fused Pallas dequant-matmul decode tail")
    decode = jax.jit(
        lambda p, i, m, px: greedy_decode_actions(
            p, cfg, i, m, px, cooked_weights=True, mesh=mesh,
            kv_cache=args.kv_cache, visual_tokens=args.visual_tokens,
            act_quant=act_quant, int4_kernel=q4k,
        )
    )
    decode_draft = jax.jit(
        lambda p, i, m, px, d: greedy_decode_actions(
            p, cfg, i, m, px, cooked_weights=True, mesh=mesh,
            kv_cache=args.kv_cache, draft_tokens=d,
            visual_tokens=args.visual_tokens, act_quant=act_quant,
            int4_kernel=q4k,
        )
    )
    decode_prefill = jax.jit(
        lambda p, i, m, px: greedy_decode_actions(
            p, cfg, i, m, px, cooked_weights=True, mesh=mesh,
            kv_cache=args.kv_cache, visual_tokens=args.visual_tokens,
            act_quant=act_quant, num_steps=1, int4_kernel=q4k,
        )
    )
    rng = np.random.default_rng(0)
    size = cfg.dino.image_size
    for bs in [int(b) for b in args.batches.split(",")]:
        px = jnp.asarray(
            rng.standard_normal((bs, 2, size, size, 3)), jnp.dtype(cfg.dtype)
        )
        i_b = jnp.broadcast_to(jnp.asarray(row), (bs, args.prompt_pad))
        m_b = jnp.broadcast_to(jnp.asarray(mask), (bs, args.prompt_pad))
        if mesh is not None and args.dp > 1:
            if bs % args.dp:
                log(f"bs={bs}: skipped (not divisible by dp={args.dp})")
                continue
            from jax.sharding import NamedSharding, PartitionSpec as P

            bsh = NamedSharding(mesh, P("data"))
            px = jax.device_put(px, bsh)
            i_b = jax.device_put(i_b, bsh)
            m_b = jax.device_put(m_b, bsh)
        # time to HOST materialization: through the remote-TPU relay,
        # block_until_ready returns without waiting (measured 0.1 ms for a 7B
        # decode — impossible); device_get of the tiny [B,7] result is the
        # only reliable completion barrier, and its transfer is negligible
        try:
            verify_passes = None
            stream = None
            if args.jacobi == "stream":
                # temporally-correlated stream: frame t+1 = sqrt(1-a^2) x_t +
                # a*noise (unit-variance AR(1)), draft = frame t's decoded
                # tokens. Measures the pass-count DISTRIBUTION the warm (1
                # pass) / cold (~worst case) single-frame rows only bracket —
                # the regime a robot control loop actually runs in.
                zero = jnp.zeros((bs, ACTION_DIM), jnp.int32)
                t0 = time.time()
                res = decode_draft(params, i_b, m_b, px, zero)
                np.asarray(jax.device_get(res.tokens))
                compile_s = time.time() - t0
                a = args.stream_alpha
                keep = (1.0 - a * a) ** 0.5
                px_np = rng.standard_normal((bs, 2, size, size, 3)).astype(np.float32)
                draft = zero
                passes, times = [], []
                for _ in range(args.stream_len):
                    px_t = jnp.asarray(px_np, jnp.dtype(cfg.dtype))
                    t0 = time.time()
                    res = decode_draft(params, i_b, m_b, px_t, draft)
                    toks = np.asarray(jax.device_get(res.tokens))
                    times.append(time.time() - t0)
                    passes.append(int(jax.device_get(res.verify_passes)))
                    draft = jnp.asarray(toks)
                    px_np = (keep * px_np
                             + a * rng.standard_normal(px_np.shape).astype(np.float32))
                hist = {str(p): passes.count(p) for p in sorted(set(passes))}
                stream = {
                    "stream_len": args.stream_len,
                    "stream_alpha": args.stream_alpha,
                    "verify_passes_mean": round(float(np.mean(passes)), 2),
                    "verify_passes_hist": hist,
                }
                verify_passes = passes[-1]
            elif args.jacobi:
                # compile the ONE program being measured first (zero draft),
                # then derive the warm draft from ITS OWN greedy tokens —
                # compiling the sequential program just for a draft would
                # double the 7B relay compiles per batch size
                zero = jnp.zeros((bs, 7), jnp.int32)
                t0 = time.time()
                res = decode_draft(params, i_b, m_b, px, zero)
                tokens = np.asarray(jax.device_get(res.tokens))
                compile_s = time.time() - t0
                # warm = the same inputs' own tokens (control-loop best case:
                # the previous action repeats); cold = zeros (worst case,
                # bounded by the sequential tail)
                draft = jnp.asarray(tokens) if args.jacobi == "warm" else zero
                verify_passes = int(jax.device_get(
                    decode_draft(params, i_b, m_b, px, draft).verify_passes))
                run = lambda: decode_draft(params, i_b, m_b, px, draft)
            else:
                t0 = time.time()
                np.asarray(jax.device_get(decode(params, i_b, m_b, px).actions))
                compile_s = time.time() - t0
                run = lambda: decode(params, i_b, m_b, px)
            if stream is None:
                times = []
                for _ in range(args.iters):
                    t0 = time.time()
                    np.asarray(jax.device_get(run().actions))
                    times.append(time.time() - t0)
            prefill_best = None
            if args.split_phases:
                np.asarray(jax.device_get(  # compile the prefill-only program
                    decode_prefill(params, i_b, m_b, px).actions))
                pf = []
                for _ in range(args.iters):
                    t0 = time.time()
                    np.asarray(jax.device_get(
                        decode_prefill(params, i_b, m_b, px).actions))
                    pf.append(time.time() - t0)
                prefill_best = min(pf)
        except Exception as e:
            log(f"bs={bs}: FAILED ({type(e).__name__}: {str(e)[:160]})")
            print(json.dumps({
                "metric": "predict_action_throughput", "batch": bs,
                "error": str(e)[:200],
            }), flush=True)
            continue
        best = min(times)
        # NOT named `row` — that's the prompt-ids buffer the next batch-size
        # iteration broadcasts from
        out = {
            "metric": "predict_action_throughput",
            "batch": bs,
            "latency_s": round(best, 4),
            "actions_per_sec": round(bs / best, 2),
            "compile_s": round(compile_s, 1),
        }
        if args.jacobi:
            out["jacobi"] = args.jacobi
            out["verify_passes"] = verify_passes
        if stream is not None:
            out.update(stream)
            # over a stream, min() is the all-accepted frame; mean is the
            # steady-state number a serving planner should use
            out["latency_mean_s"] = round(float(np.mean(times)), 4)
            out["actions_per_sec_mean"] = round(bs / float(np.mean(times)), 2)
        if prefill_best is not None:
            # tail = full program minus the num_steps=1 (prefill + argmax)
            # program — attributes a w8a8/vt win to the prefill and a
            # jacobi/kv win to the tail
            out["prefill_s"] = round(prefill_best, 4)
            out["tail_s"] = round(max(0.0, best - prefill_best), 4)
        print(json.dumps(out), flush=True)
        log(f"bs={bs}: {best*1000:.1f} ms/call -> {bs/best:.2f} actions/s")


if __name__ == "__main__":
    main()
