"""Benchmark: UADA attack inner-step throughput on OpenVLA-7B, bs=8, 1 chip.

This is BASELINE.json config 2 — the reference's default operating point
(bs=8, 3x50x50 patch, geometry augmentation, innerLoop'd fwd+bwd through the
frozen 7B; VLAAttacker/UADA_wrapper.py defaults). One "iteration" below = one
inner step = one full fwd+bwd of the 7B VLM at bs 8, seq ~288 multimodal
tokens, plus patch compositing/augmentation and the AdamW patch update — all
inside one jitted XLA program.

Baseline note: the reference repo publishes NO throughput numbers
(SURVEY.md §6; BASELINE.json "published": {}). `vs_baseline` is therefore a
ratio to an *estimated* reference rate on one A100-80GB, reported as a
BRACKET, not a point. The roofline bound: fwd+bwd of the same workload is
~100 TFLOP (no remat needed at 80 GB), so pure compute at 35-70% bf16 MFU
(312 TFLOP/s peak) gives 1.1-2.2 inner steps/s; the reference's
per-inner-step host work (serialized per-image PIL patch pasting, .item()
syncs, CPU de-tokenize inside the loss, TMA.py:132-161) is NOT overlapped
with the GPU and plausibly costs 30-50% of the step, bracketing the
achievable rate at ~0.7-1.4 inner steps/s/GPU. `vs_baseline` divides by the
1.0 midpoint for a single scalar; `vs_baseline_range` carries the honest
[value/1.4, value/0.7] bracket and `baseline_estimate_range` the denominator
bracket itself. A measured A100 run of the reference would collapse the
bracket; no CUDA hardware is attached here.

Prints ONE JSON line on stdout; diagnostics go to stderr.

Usage: python bench.py [--tiny] [--iters N] [--inner K] [--bs B]
"""

import argparse
import json
import sys
import time


REF_A100_INNER_STEPS_PER_SEC = 1.0  # bracket midpoint, see module docstring
REF_A100_ESTIMATE_RANGE = (0.7, 1.4)  # 35-70% MFU roofline minus host-work discount


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="use vla-tiny (CPU smoke)")
    ap.add_argument("--iters", type=int, default=3, help="timed outer steps")
    # inner=8 amortizes the per-outer-step work (AdamW update, metric
    # emission, host sync) like the reference's production innerLoop=50 does;
    # measured 1.261 inner/s vs 1.245 at inner=2 on one v5e
    ap.add_argument("--inner", type=int, default=8, help="inner fwd+bwd per outer step")
    ap.add_argument("--bs", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roboticattack_tpu.attacks import AttackSpec, init_attack_state, make_attack_step
    from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
    from roboticattack_tpu.models import get_config, init_vla_params
    from roboticattack_tpu.utils import WordStubTokenizer

    platform = jax.devices()[0].platform
    name = "vla-tiny" if (args.tiny or platform == "cpu") else "openvla-7b"
    cfg = get_config(name)
    log(f"platform={platform} model={name} bs={args.bs} inner={args.inner}")

    t0 = time.time()
    params = jax.jit(lambda k: init_vla_params(k, cfg))(jax.random.key(0))
    jax.block_until_ready(params)
    log(f"param init: {time.time()-t0:.1f}s "
        f"({sum(x.nbytes for x in jax.tree.leaves(params))/1e9:.1f} GB)")

    batch = next(batch_iterator(
        dummy_frame_iterator(WordStubTokenizer(), image_size=cfg.dino.image_size, seed=0),
        args.bs, pad_to=32,
    ))
    batch = jax.tree.map(jnp.asarray, batch)

    spec = AttackSpec(objective="uada", geometry=True, inner_loop=args.inner)
    step = make_attack_step(spec, cfg, None, [0, 1, 2, 3, 4, 5, 6])
    state = init_attack_state(jax.random.key(1), (50, 50))

    t0 = time.time()
    state, metrics = step(
        params, state, batch, jnp.float32(2e-3), jnp.bool_(True), jax.random.key(2)
    )
    jax.block_until_ready(state)
    log(f"compile + first step: {time.time()-t0:.1f}s "
        f"(loss={float(np.asarray(metrics['loss'])[-1]):.4f})")

    times = []
    for i in range(args.iters):
        t0 = time.time()
        state, metrics = step(
            params, state, batch, jnp.float32(2e-3), jnp.bool_(True), jax.random.key(3 + i)
        )
        jax.block_until_ready(state)
        times.append(time.time() - t0)
    best = min(times)
    inner_per_sec = args.inner / best
    log(f"steady-state outer-step times: {[f'{t:.3f}' for t in times]} "
        f"-> {inner_per_sec:.3f} inner fwd+bwd/s")

    # FLOP accounting (7B config): ~134 TFLOP per inner step incl. remat
    if name == "openvla-7b":
        tflops = 134.0 * inner_per_sec
        log(f"~{tflops:.0f} TFLOP/s ({tflops/197*100:.0f}% of v5e bf16 peak, remat-inclusive)")

    metric_name = (
        "uada_attack_inner_steps_per_sec_7b_bs8" if name == "openvla-7b"
        else "uada_attack_inner_steps_per_sec_tiny"
    )
    vs = inner_per_sec / REF_A100_INNER_STEPS_PER_SEC if name == "openvla-7b" else None
    out = {
        "metric": metric_name,
        "value": round(inner_per_sec, 4),
        "unit": "fwd+bwd inner steps/s/chip",
        "vs_baseline": round(vs, 4) if vs is not None else None,
    }
    if vs is not None:
        lo, hi = REF_A100_ESTIMATE_RANGE
        out["baseline_estimate_range"] = [lo, hi]
        out["vs_baseline_range"] = [round(inner_per_sec / hi, 4), round(inner_per_sec / lo, 4)]
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit a parseable line for the driver
        log(f"bench failed: {type(e).__name__}: {e}")
        print(json.dumps({
            "metric": "uada_attack_inner_steps_per_sec_7b_bs8",
            "value": 0.0,
            "unit": "fwd+bwd inner steps/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }))
        sys.exit(1)
