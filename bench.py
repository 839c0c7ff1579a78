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

Prints ONE JSON line on stdout; diagnostics go to stderr. The line's primary
metric is the UADA inner-step rate (unchanged series since round 1); an
`extra` array pins the OTHER production graphs — TMA (gripper-targeted
maskidx=[6], including its split clean-filter + val programs, the round-3 OOM
fix) and UPA (L1 grad clip) — so a regression in an objective-specific
subgraph moves the tracked benchmark even though the headline number is
UADA's (VERDICT r3 weak #5).

Usage: python bench.py [--tiny] [--iters N] [--inner K] [--bs B] [--objectives uada,tma,upa]
"""

import argparse
import json
import os
import sys
import time


REF_A100_INNER_STEPS_PER_SEC = 1.0  # bracket midpoint, see module docstring
REF_A100_ESTIMATE_RANGE = (0.7, 1.4)  # 35-70% MFU roofline minus host-work discount

# the metric name BOTH error paths emit — main() updates it from --objectives
# /--tiny as soon as args are parsed, so a failed `--objectives tma` run
# reports its error under tma's series instead of planting a spurious 0.0 in
# uada's (and leaving tma's looking like a missing run)
_ERROR_METRIC = ["uada_attack_inner_steps_per_sec_7b_bs8"]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _devices_or_die(jax, timeout_s: float = None):
    """jax.devices() with a hard timeout: the TPU relay on this box can go
    fully unresponsive (measured 2026-08-17: device enumeration itself hangs
    >1 h, not just compiles). The driver must always get its one JSON line,
    so on timeout emit the error form and hard-exit — the enumeration thread
    is unkillable while blocked in the PJRT client."""
    import threading

    if timeout_s is None:  # generous: slow-but-alive init is ~minutes here
        timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", 900))
    out, err = [], []

    def enumerate_devices():
        try:
            out.append(jax.devices())
        except Exception as e:  # report the REAL failure, not a fake timeout
            err.append(f"{type(e).__name__}: {str(e)[:200]}")

    t = threading.Thread(target=enumerate_devices, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if not out:
        reason = (err[0] if err else
                  f"TPU relay unresponsive: jax.devices() exceeded "
                  f"{timeout_s:.0f}s")
        log(f"jax.devices() failed: {reason}")
        print(json.dumps({
            "metric": _ERROR_METRIC[0],
            "value": 0.0,
            "unit": "fwd+bwd inner steps/s/chip",
            "vs_baseline": 0.0,
            "error": reason,
        }))
        os._exit(1)
    return out[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="use vla-tiny (CPU smoke)")
    ap.add_argument("--iters", type=int, default=3, help="timed outer steps")
    # inner=8 amortizes the per-outer-step work (AdamW update, metric
    # emission, host sync) like the reference's production innerLoop=50 does;
    # measured 1.261 inner/s vs 1.245 at inner=2 on one v5e
    ap.add_argument("--inner", type=int, default=8, help="inner fwd+bwd per outer step")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--objectives", default="uada,tma,upa",
                    help="first is the primary metric; the rest go in `extra`")
    args = ap.parse_args()
    primary_guess = args.objectives.split(",")[0].strip() or "uada"
    _ERROR_METRIC[0] = (
        f"{primary_guess}_attack_inner_steps_per_sec_"
        f"{'tiny' if args.tiny else '7b_bs8'}"
    )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from roboticattack_tpu.attacks import AttackSpec, init_attack_state, make_attack_step
    from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
    from roboticattack_tpu.models import get_config, init_vla_params
    from roboticattack_tpu.utils import WordStubTokenizer

    platform = _devices_or_die(jax)[0].platform
    name = "vla-tiny" if (args.tiny or platform == "cpu") else "openvla-7b"
    _ERROR_METRIC[0] = (
        f"{primary_guess}_attack_inner_steps_per_sec_"
        f"{'7b_bs8' if name == 'openvla-7b' else 'tiny'}"
    )
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

    from roboticattack_tpu.utils import build_tma_target_tokens

    # Objective definitions — the three production graphs. TMA runs the
    # reference's headline gripper-targeted config (maskidx=[6]), which pulls
    # in the split clean-filter + val programs (the round-3 compile-OOM fix);
    # UPA runs with its adamW-branch L1 grad clip (UPA.py:155-158).
    def objective_setup(obj):
        if obj == "uada":
            return (AttackSpec(objective="uada", geometry=True,
                               inner_loop=args.inner),
                    None, [0, 1, 2, 3, 4, 5, 6])
        if obj == "tma":
            maskidx = [6]
            return (AttackSpec(objective="tma", geometry=True,
                               inner_loop=args.inner),
                    build_tma_target_tokens(np.zeros(7), maskidx), maskidx)
        if obj == "upa":
            return (AttackSpec(objective="upa", geometry=True,
                               inner_loop=args.inner, grad_clip_l1=1e-3),
                    None, [0, 1, 2, 3, 4, 5, 6])
        raise ValueError(f"unknown objective {obj}")

    def sync(tree):
        # block_until_ready does NOT block through the axon relay (CLAUDE.md);
        # device_get of a scalar slice is the reliable completion barrier
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.device_get(leaf.ravel()[0] if leaf.ndim else leaf))

    def time_objective(obj, iters):
        spec, target, maskidx = objective_setup(obj)
        step = make_attack_step(spec, cfg, target, maskidx)
        state = init_attack_state(jax.random.key(1), (50, 50))
        t0 = time.time()
        state, metrics = step(
            params, state, batch, jnp.float32(2e-3), jnp.bool_(True), jax.random.key(2)
        )
        sync(state.patch)
        compile_s = time.time() - t0
        log(f"[{obj}] compile + first step: {compile_s:.1f}s "
            f"(loss={float(np.asarray(metrics['loss'])[-1]):.4f})")
        times = []
        for i in range(iters):
            t0 = time.time()
            state, metrics = step(
                params, state, batch, jnp.float32(2e-3), jnp.bool_(True),
                jax.random.key(3 + i),
            )
            sync(state.patch)
            times.append(time.time() - t0)
        inner_per_sec = args.inner / min(times)
        log(f"[{obj}] steady-state outer-step times: "
            f"{[f'{t:.3f}' for t in times]} -> {inner_per_sec:.3f} inner fwd+bwd/s")
        result = {"value": round(inner_per_sec, 4), "compile_s": round(compile_s, 1)}

        if obj == "tma":
            # the maskidx=[6] eval cadence: clean-image pre-filter as its OWN
            # program + the single-forward val (fused they OOM the 7B at
            # compile — commit ac7d2f4); pin that both still compile and run
            from roboticattack_tpu.attacks.engine import (
                make_clean_filter_step, make_val_step)

            clean = make_clean_filter_step(cfg)   # both come back jitted
            val = make_val_step(spec, cfg, target, maskidx)
            for label, fn in (
                ("clean_filter", lambda: clean(params, batch)),
                ("val", lambda: val(params, state.patch, batch, jax.random.key(9))),
            ):
                t0 = time.time()
                out_ = fn()
                sync(out_)
                c_s = time.time() - t0
                t0 = time.time()
                out_ = fn()
                sync(out_)
                result[f"{label}_s"] = round(time.time() - t0, 3)
                log(f"[tma] {label}: compile+run {c_s:.1f}s, steady {result[f'{label}_s']:.3f}s")
        return result

    objectives = [o.strip() for o in args.objectives.split(",") if o.strip()]
    primary_obj = objectives[0]
    primary = time_objective(primary_obj, args.iters)
    inner_per_sec = primary["value"]

    # FLOP accounting (7B config): ~134 TFLOP per inner step incl. remat
    if name == "openvla-7b":
        tflops = 134.0 * inner_per_sec
        log(f"~{tflops:.0f} TFLOP/s ({tflops/197*100:.0f}% of v5e bf16 peak, remat-inclusive)")

    suffix = "7b_bs8" if name == "openvla-7b" else "tiny"
    metric_name = f"{primary_obj}_attack_inner_steps_per_sec_{suffix}"
    vs = inner_per_sec / REF_A100_INNER_STEPS_PER_SEC if name == "openvla-7b" else None
    out = {
        "metric": metric_name,
        "value": inner_per_sec,
        "unit": "fwd+bwd inner steps/s/chip",
        "vs_baseline": round(vs, 4) if vs is not None else None,
        # keep the primary objective's sub-metrics (compile_s; TMA's split
        # clean_filter_s/val_s — the commit-ac7d2f4 subgraphs) visible so a
        # regression in them moves the tracked JSON, same as for extras
        **{k: v for k, v in primary.items() if k != "value"},
    }
    if vs is not None:
        lo, hi = REF_A100_ESTIMATE_RANGE
        out["baseline_estimate_range"] = [lo, hi]
        out["vs_baseline_range"] = [round(inner_per_sec / hi, 4), round(inner_per_sec / lo, 4)]
    extra = []
    for obj in objectives[1:]:
        r = time_objective(obj, max(2, args.iters - 1))
        r["metric"] = f"{obj}_attack_inner_steps_per_sec_{suffix}"
        r["unit"] = "fwd+bwd inner steps/s/chip"
        extra.append(r)
    if extra:
        out["extra"] = extra
    print(json.dumps(out))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always emit a parseable line for the driver
        log(f"bench failed: {type(e).__name__}: {e}")
        print(json.dumps({
            "metric": _ERROR_METRIC[0],
            "value": 0.0,
            "unit": "fwd+bwd inner steps/s/chip",
            "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {str(e)[:200]}",
        }))
        sys.exit(1)
