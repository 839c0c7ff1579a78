"""Serving-throughput sweep -> SERVING_EVIDENCE.json (merged by config).

Runs scripts/bench_decode.py across serving configurations on the attached
chip and aggregates the per-batch JSON lines into one artifact, so measured
serving numbers are tracked the same way compiled memory/collective facts
are (MULTICHIP_EVIDENCE.json). Merge semantics: existing configs in the
output file are kept unless re-run — a partial sweep (relay flake, OOM)
never erases prior measurements.

Usage:
  python scripts/serving_sweep.py                    # default config grid
  python scripts/serving_sweep.py --configs int4:1,8,16,32 int4+kv8:16,32,48
  (config syntax: <weights>[+kv8]:<batch,list> with weights bf16|int8|int4)

Each config runs in a FRESH subprocess: a wedged/OOM'd relay compile must
not take the whole sweep down, and bench_decode's device state dies with
its process. The relay is probed first (scripts/tpu_probe.py) — a dead
relay writes nothing and exits 2.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)  # parse_config imports roboticattack_tpu.utils

DEFAULT_CONFIGS = [
    "bf16:1,4",
    "int8:8,16",
    "int4:1,8,16,32",
    "int4+kv8:16,32",
    # fused Pallas dequant-matmul decode tail (ops/q4_matmul.py) — the
    # kernel-vs-XLA A/B at matched batches; plain int4 rows run with the
    # kernel explicitly OFF so the pair isolates the kernel
    "int4+qk:1,8,16,32",
    # Jacobi self-speculative decode (models/decode.py draft_tokens): 'jw' =
    # warm drafts (previous step's tokens — the control-loop steady state;
    # best case, one verification pass), 'jc' = cold zero drafts (worst
    # case, bounded by the sequential tail)
    "int8+jw:1,8",
    "int8+jc:1,8",
    "bf16+jw:1",
    # int4 KV cache (grouped-K/per-position-V, models/decode.py _attend_kv4):
    # quarters the cache bytes — the envelope probes past int4+kv8 bs=32
    # (bs=64 reaches for the post-cache-in-carry ceiling)
    "int4+kv4:32,48,64",
    # int8 weights + int8 cache at bs=32: the exact-dequant big-batch row
    "int8+kv8:32",
    # correlated-stream Jacobi (the control-loop middle ground jw/jc only
    # bracket): per-frame drafts from the previous frame's tokens over an
    # AR(1) image stream; reports the verify-pass histogram
    "int8+js:8",
    # visual-token pruning (LOSSY, models/decode.py visual_tokens): prefill
    # is the FLOP bill at bs>=8 — vt128 halves the patch tokens
    "int8+vt128:8,16",
    # w8a8 (LOSSY, models/decode.py act_quant): the prefill projections run
    # the MXU's double-rate int8 path — the FLOP-bill lever on top of int8's
    # bytes lever; vs int8 rows isolates the prefill speedup
    "w8a8:8,16",
    "w8a8+vt128:16",
    # envelope probe: int8 weights (7.7 GB) + halved cache at bs=32 — may
    # OOM on one chip (the sweep records error rows honestly)
    "w8a8+kv8:32",
    # the bs=1 robot-control latency candidate: once a warm draft collapses
    # the tail to one pass, PREFILL dominates — w8a8 halves its FLOP bill
    "w8a8+jw:1,8",
    # phase attribution A/B: prefill_s/tail_s for int8 vs w8a8 at bs=8 —
    # the direct measurement of the w8a8 prefill claim
    "int8+ph:8",
    "w8a8+ph:8",
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_config(spec):
    """'<bf16|int8|w8a8|int4>[+kv8|+kv4][+jw|+jc][+vt<k>][+ph]:<batches>' ->
    (name, weights, kv_cache, jacobi, visual_tokens, batches, split_phases).
    '+ph' rows also report prefill_s/tail_s (bench_decode --split_phases;
    one extra relay compile per batch size, so mark only the rows whose
    attribution you need)."""
    from roboticattack_tpu.utils.quant_args import parse_suffixes

    name, batches = spec.split(":", 1)
    parts = name.split("+")
    weights, suffixes = parts[0], parts[1:]
    if weights not in ("bf16", "int8", "w8a8", "int4"):
        raise ValueError(f"weights {weights!r} in {spec!r}")
    kv, vt, jacobi, ph, qk = parse_suffixes(
        suffixes, context=f"{spec!r}: ", jacobi=True, phases=True, kernel=True
    )
    if qk and not weights.startswith("int4"):
        raise ValueError(f"{spec!r}: +qk requires int4 weights")
    return name, weights, kv, jacobi, vt, batches, ph, qk


def run_config(name, weights, kv_cache, jacobi, visual_tokens, batches,
               iters, timeout_s, platform=None, split_phases=False,
               int4_kernel=False):
    cmd = [sys.executable, os.path.join(REPO, "scripts", "bench_decode.py"),
           "--batches", batches, "--iters", str(iters)]
    if weights != "bf16":
        cmd += ["--quantize", weights]
    if weights.startswith("int4"):
        # explicit on/off — sweep rows must not change meaning with the
        # resolution of bench_decode's --int4_kernel auto default
        cmd += ["--int4_kernel", "on" if int4_kernel else "off"]
    if kv_cache:
        cmd += ["--kv_cache", kv_cache]
    if jacobi:
        cmd += ["--jacobi", jacobi]
    if visual_tokens is not None:
        cmd += ["--visual_tokens", str(visual_tokens)]
    if split_phases:
        cmd += ["--split_phases"]
    if platform:
        cmd += ["--platform", platform]
    log(f"[{name}] {' '.join(cmd[1:])}")
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s, cwd=REPO,
        )
    except subprocess.TimeoutExpired:
        return {"status": "timeout", "timeout_s": timeout_s}
    rows = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    # 'ok' needs at least one MEASURED row — an all-OOM config emits only
    # error rows and must not count as a successful measurement
    measured = any("actions_per_sec" in r for r in rows)
    out = {
        "status": "ok" if measured else "error",
        "wall_s": round(time.time() - t0, 1),
        "rows": rows,
    }
    if not rows:
        out["stderr_tail"] = proc.stderr[-400:]
    log(f"[{name}] {out['status']} in {out['wall_s']}s: "
        + ", ".join(
            f"bs={r.get('batch')} "
            + (f"{r['actions_per_sec']}/s" if "actions_per_sec" in r
               else f"ERR {r.get('error', '')[:60]}")
            for r in rows))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=DEFAULT_CONFIGS,
                    help="<bf16|int8|w8a8|int4>[+kv8|+kv4][+jw|+jc]"
                         "[+vt<k>][+ph]:<batches>")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(REPO, "SERVING_EVIDENCE.json"))
    ap.add_argument("--per_config_timeout_s", type=int, default=3600)
    ap.add_argument("--skip_probe", action="store_true")
    # forwarded to bench_decode (CPU smoke: --platform cpu --skip_probe)
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    args = ap.parse_args()

    if not args.skip_probe:
        try:
            probe = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "tpu_probe.py")],
                capture_output=True, text=True, timeout=600,
            )
        except subprocess.TimeoutExpired:
            # full-outage mode can block the probe INTERPRETER before its own
            # stage timeouts engage (sitecustomize registers the PJRT plugin
            # at start) — same clean exit as a failing probe
            log("probe subprocess itself timed out; relay unhealthy")
            return 2
        log(f"probe: {probe.stdout.strip() or probe.stderr.strip()}")
        if probe.returncode != 0:
            log("relay unhealthy; writing nothing")
            return 2

    results = {"configs": {}}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results["configs"].update(json.load(f).get("configs", {}))
            log(f"merging into {args.out}")
        except (json.JSONDecodeError, OSError) as e:
            log(f"ignoring unreadable prior {args.out}: {e}")

    ran = []
    for spec in args.configs:
        name, weights, kv, jacobi, vt, batches, ph, qk = parse_config(spec)
        ran.append(name)
        results["configs"][name] = run_config(
            name, weights, kv, jacobi, vt, batches, args.iters,
            args.per_config_timeout_s, platform=args.platform,
            split_phases=ph, int4_kernel=qk,
        )
        # write after EVERY config: a later relay death keeps earlier rows
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    # exit status reflects THIS run only — merged prior configs must not let
    # a sweep that measured nothing report success
    ok = sum(1 for n in ran if results["configs"][n].get("status") == "ok")
    print(json.dumps({"configs_ok": ok, "configs_ran": len(ran),
                      "configs_total": len(results["configs"]),
                      "out": args.out}))
    return 0 if ok == len(ran) and ran else 1


if __name__ == "__main__":
    sys.exit(main())
