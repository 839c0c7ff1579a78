"""Compiled multi-chip evidence at FULL OpenVLA-7B shapes -> MULTICHIP_EVIDENCE.json.

Replaces the arithmetic-only scaling model (BASELINE.md r3) with compiled
artifacts, no multi-chip hardware required:

CPU legs (virtual mesh; GSPMD partitioning is backend-independent, argument
bytes are exact, CPU temp numbers are discarded as f32-upcast-inflated):
  * attack step dp=4 x tp=2, bs=8, pad 32   — inventory + per-chip args
  * attack step dp=8 (pure DP), bs=8        — single patch-psum pin
  * attack step dp=4 x tp=2, bs=16, pad 48  — the capacity the freed HBM buys
  * serving decode tp=2, bs=8               — inventory + per-chip args
  * attack step single-chip                 — the 14.9 GB comparison point
  * serving decode int8 single-chip, bs=8   — weight-only quant args (7.7 GB)
  * serving decode int4 single-chip, bs=32  — grouped-int4 args (~5.0 GB)
  * serving decode w8a8 tp=2, bs=16         — int8-activation prefill inventory

TPU legs (--tpu; topology-AOT through the compile relay,
jax.experimental.topologies 'v5e:2x2' — real HBM temp estimates, ~3 min
relay compile each):
  * attack step dp=2 x tp=2, bs=8, pad 32
  * attack step dp=2 x tp=2, bs=16, pad 48
  * serving decode tp=2 (data axis unused), bs=8
  * serving decode int8 single-chip (v5e:1x1), bs=8 and bs=16
  * serving decode int4 single-chip (v5e:1x1), bs=32
  * serving decode w8a8 single-chip (v5e:1x1), bs=16
  * a flash-attention attempt, recording the known topology-AOT limitation

Usage: python scripts/multichip_evidence.py [--tpu] [--out MULTICHIP_EVIDENCE.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GB = 15.75  # v5e


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _run_leg_now(name, fn):
    t0 = time.time()
    try:
        out = fn()
        out["status"] = "ok"
        out["compile_s"] = round(time.time() - t0, 1)
        hr = out["memory"].get("headroom_gb")
        if hr is not None:
            # a compiled program that does NOT fit HBM must be loud: a green
            # 'ok' with silently negative headroom is how the round-4 bs=32
            # envelope claim outlived the evidence refuting it
            out["fits"] = hr >= 0
        log(f"[{name}] ok in {out['compile_s']}s: args {out['memory']['argument_gb']} GB"
            f" + temps {out['memory']['temp_gb']} GB")
        if out.get("fits") is False:
            log(f"[{name}] *** DOES NOT FIT: headroom {hr} GB < 0 "
                f"(compile succeeded but the program exceeds {HBM_GB} GB HBM)")
    except Exception as e:  # record the outcome either way — that's the point
        out = {"status": "error", "error": f"{type(e).__name__}: {str(e)[:300]}",
               "compile_s": round(time.time() - t0, 1)}
        if "RESOURCE_EXHAUSTED" in out["error"]:
            out["fits"] = False
        log(f"[{name}] FAILED in {out['compile_s']}s: {out['error'][:160]}")
    return out


class LegStore(dict):
    """Legs dict with an explicit run(key, pretty, fn, params) entry point.
    With skip_ok set, a prior status=='ok' entry whose recorded `params`
    match is kept instead of re-running its (minutes-long) relay compile;
    params mismatch (leg edited without renaming) and non-ok priors
    (error / timeout) always re-run."""

    skip_ok = False

    only = None

    def run(self, key, pretty, fn, params=None):
        if self.only and self.only not in key:
            log(f"[{pretty}] skipped (--only {self.only})")
            return
        prior = self.get(key)
        if self.skip_ok and isinstance(prior, dict) and prior.get("status") == "ok":
            if prior.get("params") == params:
                log(f"[{pretty}] skipped (prior ok, params match; --skip_ok)")
                return
            log(f"[{pretty}] prior ok but params changed "
                f"({prior.get('params')} -> {params}); re-running")
        out = _run_leg_now(pretty, fn)
        if params is not None:
            out["params"] = params
        self[key] = out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="also run the v5e:2x2 topology-AOT legs on the relay")
    ap.add_argument("--out", default="MULTICHIP_EVIDENCE.json")
    ap.add_argument("--skip_ok", action="store_true",
                    help="keep prior status=='ok' legs (with matching params) "
                         "instead of recompiling them (incremental refresh)")
    ap.add_argument("--only", default=None,
                    help="substring filter: run only legs whose key contains "
                         "this (others keep their prior entries) — e.g. "
                         "'decode' after a decode-path change")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        # CPU-only run must not touch the TPU plugin at all
        jax.config.update("jax_platforms", "cpu")
    os.environ.setdefault("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

    from roboticattack_tpu.parallel import make_mesh
    from roboticattack_tpu.parallel.evidence import (
        collective_summary,
        compile_attack_step_7b,
        compile_decode_7b,
        memory_summary,
        tpu_topology_mesh,
    )

    cpu = jax.devices("cpu")
    assert len(cpu) >= 8, f"need 8 virtual CPU devices, have {len(cpu)}"

    def leg(compile_fn):
        comp = compile_fn()
        return {"memory": memory_summary(comp),
                "collectives": collective_summary(comp)}

    # merge into an existing artifact: legs are keyed by name, so a CPU-only
    # refresh keeps previously-compiled TPU legs (and vice versa) instead of
    # clobbering them
    results = {"hbm_per_chip_gb": HBM_GB, "legs": LegStore()}
    results["legs"].skip_ok = args.skip_ok
    results["legs"].only = args.only
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            results["legs"].update(prior.get("legs", {}))
            log(f"merging into {args.out} ({len(results['legs'])} prior legs)")
        except (json.JSONDecodeError, OSError) as e:
            log(f"ignoring unreadable prior {args.out}: {e}")
    L = results["legs"]

    L.run("cpu_attack_dp4_tp2_bs8_pad32", "cpu attack dp4xtp2 bs8",
          lambda: leg(lambda: compile_attack_step_7b(
              make_mesh(data=4, model=2, devices=cpu), batch_size=8, pad_to=32)),
          params={"mesh": "dp4xtp2", "bs": 8, "pad": 32})
    L.run("cpu_attack_dp8_bs8_pad32", "cpu attack dp8 bs8",
          lambda: leg(lambda: compile_attack_step_7b(
              make_mesh(data=8, model=1, devices=cpu), batch_size=8, pad_to=32)),
          params={"mesh": "dp8", "bs": 8, "pad": 32})
    L.run("cpu_attack_dp4_tp2_bs16_pad48", "cpu attack dp4xtp2 bs16 pad48",
          lambda: leg(lambda: compile_attack_step_7b(
              make_mesh(data=4, model=2, devices=cpu), batch_size=16, pad_to=48)),
          params={"mesh": "dp4xtp2", "bs": 16, "pad": 48})
    L.run("cpu_decode_tp2_bs8", "cpu decode tp2 bs8",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=8)),
          params={"mesh": "tp2", "bs": 8})
    L.run("cpu_attack_single_chip_bs8_pad32", "cpu attack single-chip bs8",
          lambda: leg(lambda: compile_attack_step_7b(
              make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=8, pad_to=32)),
          params={"mesh": "1chip", "bs": 8, "pad": 32})
    # int8 weight-only serving (models/quant.py): single-chip bs=8 — the
    # configuration bf16 cannot compile at all (bs>=6 OOMs on 15.75 GB)
    L.run("cpu_decode_int8_single_chip_bs8", "cpu decode int8 1-chip bs8",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=8,
              quantize=True)),
          params={"mesh": "1chip", "bs": 8, "quantize": "int8"})
    # grouped int4 (mode='int4', group=128): ~5.0 GB of weight arguments —
    # the large-batch single-chip configuration
    L.run("cpu_decode_int4_single_chip_bs32", "cpu decode int4 1-chip bs32",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=32,
              quantize="int4")),
          params={"mesh": "1chip", "bs": 32, "quantize": "int4"})
    L.run("cpu_decode_jacobi_tp2_bs8", "cpu decode jacobi tp2 bs8",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=8,
              jacobi=True)),
          params={"mesh": "tp2", "bs": 8, "jacobi": True})
    # pure data-parallel serving (dp=2, tp=1, int8 weights): every batch row
    # is independent and the cache's batch axis is pinned — the compiled
    # program must move ZERO bytes across ICI (linear dp scaling as a
    # compiled fact); the collectives list below must stay empty
    L.run("cpu_decode_dp2_bs8", "cpu decode dp2 bs8",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=2, model=1, devices=cpu[:2]), batch_size=8,
              quantize=True)),
          params={"mesh": "dp2", "bs": 8, "quantize": "int8"})
    # w8a8 under TP (act_quant='int8'): same int8 weight arguments; the
    # inventory pin is that the int8 x int8 prefill's row-parallel partial
    # sums still cross ICI as [B,S,D]-class activations, nothing tensor-sized
    L.run("cpu_decode_w8a8_tp2_bs16", "cpu decode w8a8 tp2 bs16",
          lambda: leg(lambda: compile_decode_7b(
              make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=16,
              quantize=True, act_quant="int8")),
          params={"mesh": "tp2", "bs": 16, "quantize": "w8a8"})
    for name in ("cpu_attack_dp4_tp2_bs8_pad32", "cpu_attack_dp8_bs8_pad32",
                 "cpu_attack_dp4_tp2_bs16_pad48", "cpu_decode_tp2_bs8",
                 "cpu_attack_single_chip_bs8_pad32",
                 "cpu_decode_int8_single_chip_bs8",
                 "cpu_decode_int4_single_chip_bs32",
                 "cpu_decode_jacobi_tp2_bs8",
                 "cpu_decode_dp2_bs8",
                 "cpu_decode_w8a8_tp2_bs16"):
        if L.get(name, {}).get("status") == "ok":
            # CPU temp estimates are bf16->f32-upcast-inflated; keep only args
            L[name]["memory"].pop("temp_gb", None)
            L[name]["memory"].pop("total_gb", None)
            L[name]["note"] = "argument bytes exact; CPU temp estimate discarded"

    if args.tpu:
        def tpu_leg(fn):
            out = leg(fn)
            out["memory"]["headroom_gb"] = round(
                HBM_GB - out["memory"]["total_gb"], 3
            )
            return out

        def chip1():
            return tpu_topology_mesh("v5e:1x1", (1, 1),
                                     chips_per_host_bounds=(1, 1, 1))

        L.run("tpu_attack_dp2_tp2_bs8_pad32", "TPU-AOT attack dp2xtp2 bs8",
              lambda: tpu_leg(lambda: compile_attack_step_7b(
                  tpu_topology_mesh("v5e:2x2", (2, 2)), batch_size=8, pad_to=32)),
              params={"mesh": "dp2xtp2", "bs": 8, "pad": 32})
        L.run("tpu_attack_dp2_tp2_bs16_pad48", "TPU-AOT attack dp2xtp2 bs16 pad48",
              lambda: tpu_leg(lambda: compile_attack_step_7b(
                  tpu_topology_mesh("v5e:2x2", (2, 2)), batch_size=16, pad_to=48)),
              params={"mesh": "dp2xtp2", "bs": 16, "pad": 48})
        L.run("tpu_decode_tp2_bs8", "TPU-AOT decode tp2 bs8",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  tpu_topology_mesh("v5e:1x2", (1, 2),
                                    chips_per_host_bounds=(1, 2, 1)),
                  batch_size=8)),
              params={"mesh": "tp2", "bs": 8})
        L.run("tpu_decode_tp4_bs8", "TPU-AOT decode tp4 bs8",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  tpu_topology_mesh("v5e:2x2", (1, 4)), batch_size=8)),
              params={"mesh": "tp4", "bs": 8})
        # int8 weight-only single-chip serving: real HBM estimates for the
        # bs=8 and bs=16 programs bf16 can't fit (models/quant.py)
        for bs in (8, 16):
            L.run(f"tpu_decode_int8_1chip_bs{bs}",
                  f"TPU-AOT decode int8 1-chip bs{bs}",
                  lambda bs=bs: tpu_leg(lambda: compile_decode_7b(
                      chip1(), batch_size=bs, quantize=True)),
                  params={"mesh": "1chip", "bs": bs, "quantize": "int8"})
        # grouped int4: the bs=32 single-chip program (real HBM estimate),
        # and the same with the int8/int4 KV caches (the cache is a TEMP, so
        # only these real-TPU estimates — not the CPU legs — can size it)
        L.run("tpu_decode_int4_1chip_bs32", "TPU-AOT decode int4 1-chip bs32",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=32, quantize="int4")),
              params={"mesh": "1chip", "bs": 32, "quantize": "int4"})
        L.run("tpu_decode_int4_kv8_1chip_bs32", "TPU-AOT decode int4+kv8 1-chip bs32",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=32, quantize="int4", kv_cache="int8")),
              params={"mesh": "1chip", "bs": 32, "quantize": "int4", "kv": "int8"})
        L.run("tpu_decode_int4_kv4_1chip_bs48", "TPU-AOT decode int4+kv4 1-chip bs48",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=48, quantize="int4", kv_cache="int4")),
              params={"mesh": "1chip", "bs": 48, "quantize": "int4", "kv": "int4"})
        # the post-refactor envelope probes (cache-in-carry decode): int4+kv4
        # at bs=64 and int8+kv8 at bs=32 — whatever fits here is the
        # documented single-chip serving envelope (DOCUMENTED_ENVELOPE test)
        L.run("tpu_decode_int4_kv4_1chip_bs64", "TPU-AOT decode int4+kv4 1-chip bs64",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=64, quantize="int4", kv_cache="int4")),
              params={"mesh": "1chip", "bs": 64, "quantize": "int4", "kv": "int4"})
        L.run("tpu_decode_int8_kv8_1chip_bs32", "TPU-AOT decode int8+kv8 1-chip bs32",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=32, quantize=True, kv_cache="int8")),
              params={"mesh": "1chip", "bs": 32, "quantize": "int8", "kv": "int8"})
        # the SPEED stack's envelope probe: int8-class weights (what w8a8
        # serves with) + int8 cache at bs=48 — if this fits, the fastest
        # measured stack (w8a8+kv8) extends another batch tier
        L.run("tpu_decode_int8_kv8_1chip_bs48", "TPU-AOT decode int8+kv8 1-chip bs48",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=48, quantize=True, kv_cache="int8")),
              params={"mesh": "1chip", "bs": 48, "quantize": "int8", "kv": "int8"})
        # visual-token pruning (LOSSY): real-TPU temp estimate for the
        # vt=128 program — the cache shrink CPU legs can't show
        L.run("tpu_decode_int8_vt128_1chip_bs16", "TPU-AOT decode int8+vt128 1-chip bs16",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=16, quantize=True, visual_tokens=128)),
              params={"mesh": "1chip", "bs": 16, "quantize": "int8", "vt": 128})
        # Jacobi self-speculative decode under TP: the while_loop of s=7
        # verification passes must lower on real-TPU topology-AOT with the
        # same inventory shape class as the sequential tail (nothing weight-
        # or cache-sized across ICI)
        L.run("tpu_decode_jacobi_tp2_bs8", "TPU-AOT decode jacobi tp2 bs8",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  tpu_topology_mesh("v5e:1x2", (1, 2),
                                    chips_per_host_bounds=(1, 2, 1)),
                  batch_size=8, jacobi=True)),
              params={"mesh": "tp2", "bs": 8, "jacobi": True})
        L.run("tpu_decode_int8_jacobi_1chip_bs8", "TPU-AOT decode int8 jacobi 1-chip bs8",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=8, quantize=True, jacobi=True)),
              params={"mesh": "1chip", "bs": 8, "quantize": "int8", "jacobi": True})
        # w8a8 prefill (act_quant='int8'): real HBM estimate for the int32
        # prefill-partial temps on top of the int8 weight arguments
        L.run("tpu_decode_w8a8_1chip_bs16", "TPU-AOT decode w8a8 1-chip bs16",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  chip1(), batch_size=16, quantize=True, act_quant="int8")),
              params={"mesh": "1chip", "bs": 16, "quantize": "w8a8"})
        # w8a8 under TP on REAL-TPU lowering: the bit-identity guarantee
        # rides on the prefill partial-sum all-reduces staying s32 (pinned
        # s32 on the CPU lowering, tests/test_multichip_7b_shapes.py); this
        # leg records the dtype the real backend actually emits — if it
        # shows f32 psums, soften the docstring claim in models/decode.py
        L.run("tpu_decode_w8a8_tp2_bs16", "TPU-AOT decode w8a8 tp2 bs16",
              lambda: tpu_leg(lambda: compile_decode_7b(
                  tpu_topology_mesh("v5e:1x2", (1, 2),
                                    chips_per_host_bounds=(1, 2, 1)),
                  batch_size=16, quantize=True, act_quant="int8")),
              params={"mesh": "tp2", "bs": 16, "quantize": "w8a8"})

        # record the flash-attention topology-AOT limitation explicitly
        def flash_leg():
            from roboticattack_tpu.attacks import AttackSpec, make_attack_step
            from roboticattack_tpu.models import get_config
            from roboticattack_tpu.parallel.evidence import (
                abstract_attack_inputs, abstract_params)

            cfg = get_config("openvla-7b")  # attn_impl='flash' as in production
            mesh = tpu_topology_mesh("v5e:2x2", (2, 2))
            step = make_attack_step(
                AttackSpec(objective="uada", geometry=True, inner_loop=2),
                cfg, None, [0, 1, 2, 3, 4, 5, 6])
            comp = step.lower(
                abstract_params(cfg, mesh),
                *abstract_attack_inputs(mesh, 8, 32),
            ).compile()
            return {"memory": memory_summary(comp),
                    "collectives": collective_summary(comp)}

        L.run("tpu_attack_flash_attempt", "TPU-AOT flash attempt", flash_leg,
              params={"mesh": "dp2xtp2", "bs": 8, "attn": "flash"})

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    ok = sum(1 for v in L.values() if v.get("status") == "ok")
    print(json.dumps({"legs_ok": ok, "legs_total": len(L), "out": args.out}))


if __name__ == "__main__":
    main()
