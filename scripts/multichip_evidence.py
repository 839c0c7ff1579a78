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
        log(f"[{name}] ok in {out['compile_s']}s: args {out['memory']['argument_gb']} GB"
            f" + temps {out['memory']['temp_gb']} GB")
    except Exception as e:  # record the outcome either way — that's the point
        out = {"status": "error", "error": f"{type(e).__name__}: {str(e)[:300]}",
               "compile_s": round(time.time() - t0, 1)}
        log(f"[{name}] FAILED in {out['compile_s']}s: {out['error'][:160]}")
    return out


def run_leg(name, fn):
    """Deferred leg: compiles at assignment time so LegStore can skip
    already-green legs under --skip_ok without paying the compile."""
    return ("__leg__", name, fn)


class LegStore(dict):
    """Legs dict that, with skip_ok set, keeps a prior status=='ok' entry
    instead of re-running its (minutes-long) relay compile. Non-ok priors
    (error / timeout) always re-run."""

    skip_ok = False

    def __setitem__(self, key, value):
        if isinstance(value, tuple) and value and value[0] == "__leg__":
            _, pretty, fn = value
            if self.skip_ok and self.get(key, {}).get("status") == "ok":
                log(f"[{pretty}] skipped (prior leg ok; --skip_ok)")
                return
            value = _run_leg_now(pretty, fn)
        super().__setitem__(key, value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="also run the v5e:2x2 topology-AOT legs on the relay")
    ap.add_argument("--out", default="MULTICHIP_EVIDENCE.json")
    ap.add_argument("--skip_ok", action="store_true",
                    help="keep prior status=='ok' legs instead of recompiling "
                         "them (incremental refresh after adding new legs)")
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
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prior = json.load(f)
            results["legs"].update(prior.get("legs", {}))
            log(f"merging into {args.out} ({len(results['legs'])} prior legs)")
        except (json.JSONDecodeError, OSError) as e:
            log(f"ignoring unreadable prior {args.out}: {e}")
    L = results["legs"]

    L["cpu_attack_dp4_tp2_bs8_pad32"] = run_leg(
        "cpu attack dp4xtp2 bs8",
        lambda: leg(lambda: compile_attack_step_7b(
            make_mesh(data=4, model=2, devices=cpu), batch_size=8, pad_to=32)),
    )
    L["cpu_attack_dp8_bs8_pad32"] = run_leg(
        "cpu attack dp8 bs8",
        lambda: leg(lambda: compile_attack_step_7b(
            make_mesh(data=8, model=1, devices=cpu), batch_size=8, pad_to=32)),
    )
    L["cpu_attack_dp4_tp2_bs16_pad48"] = run_leg(
        "cpu attack dp4xtp2 bs16 pad48",
        lambda: leg(lambda: compile_attack_step_7b(
            make_mesh(data=4, model=2, devices=cpu), batch_size=16, pad_to=48)),
    )
    L["cpu_decode_tp2_bs8"] = run_leg(
        "cpu decode tp2 bs8",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=8)),
    )
    L["cpu_attack_single_chip_bs8_pad32"] = run_leg(
        "cpu attack single-chip bs8",
        lambda: leg(lambda: compile_attack_step_7b(
            make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=8, pad_to=32)),
    )
    # int8 weight-only serving (models/quant.py): single-chip bs=8 — the
    # configuration bf16 cannot compile at all (bs>=6 OOMs on 15.75 GB)
    L["cpu_decode_int8_single_chip_bs8"] = run_leg(
        "cpu decode int8 1-chip bs8",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=8,
            quantize=True)),
    )
    # grouped int4 (mode='int4', group=128): ~5.0 GB of weight arguments —
    # the bs=32-class single-chip configuration
    L["cpu_decode_int4_single_chip_bs32"] = run_leg(
        "cpu decode int4 1-chip bs32",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=1, model=1, devices=cpu[:1]), batch_size=32,
            quantize="int4")),
    )
    L["cpu_decode_jacobi_tp2_bs8"] = run_leg(
        "cpu decode jacobi tp2 bs8",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=8,
            jacobi=True)),
    )
    # pure data-parallel serving (dp=2, tp=1, int8 weights): every batch row
    # is independent and the cache's batch axis is pinned — the compiled
    # program must move ZERO bytes across ICI (linear dp scaling as a
    # compiled fact); the collectives list below must stay empty
    L["cpu_decode_dp2_bs8"] = run_leg(
        "cpu decode dp2 bs8",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=2, model=1, devices=cpu[:2]), batch_size=8,
            quantize=True)),
    )
    # w8a8 under TP (act_quant='int8'): same int8 weight arguments; the
    # inventory pin is that the int8 x int8 prefill's row-parallel partial
    # sums still cross ICI as [B,S,D]-class activations, nothing tensor-sized
    L["cpu_decode_w8a8_tp2_bs16"] = run_leg(
        "cpu decode w8a8 tp2 bs16",
        lambda: leg(lambda: compile_decode_7b(
            make_mesh(data=1, model=2, devices=cpu[:2]), batch_size=16,
            quantize=True, act_quant="int8")),
    )
    for name in ("cpu_attack_dp4_tp2_bs8_pad32", "cpu_attack_dp8_bs8_pad32",
                 "cpu_attack_dp4_tp2_bs16_pad48", "cpu_decode_tp2_bs8",
                 "cpu_attack_single_chip_bs8_pad32",
                 "cpu_decode_int8_single_chip_bs8",
                 "cpu_decode_int4_single_chip_bs32",
                 "cpu_decode_jacobi_tp2_bs8",
                 "cpu_decode_dp2_bs8",
                 "cpu_decode_w8a8_tp2_bs16"):
        if L[name].get("status") == "ok":
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

        L["tpu_attack_dp2_tp2_bs8_pad32"] = run_leg(
            "TPU-AOT attack dp2xtp2 bs8",
            lambda: tpu_leg(lambda: compile_attack_step_7b(
                tpu_topology_mesh("v5e:2x2", (2, 2)), batch_size=8, pad_to=32)),
        )
        L["tpu_attack_dp2_tp2_bs16_pad48"] = run_leg(
            "TPU-AOT attack dp2xtp2 bs16 pad48",
            lambda: tpu_leg(lambda: compile_attack_step_7b(
                tpu_topology_mesh("v5e:2x2", (2, 2)), batch_size=16, pad_to=48)),
        )
        L["tpu_decode_tp2_bs8"] = run_leg(
            "TPU-AOT decode tp2 bs8",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x2", (1, 2),
                                  chips_per_host_bounds=(1, 2, 1)),
                batch_size=8)),
        )
        L["tpu_decode_tp4_bs8"] = run_leg(
            "TPU-AOT decode tp4 bs8",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:2x2", (1, 4)), batch_size=8)),
        )
        # int8 weight-only single-chip serving: real HBM estimates for the
        # bs=8 and bs=16 programs bf16 can't fit (models/quant.py)
        for bs in (8, 16):
            L[f"tpu_decode_int8_1chip_bs{bs}"] = run_leg(
                f"TPU-AOT decode int8 1-chip bs{bs}",
                lambda bs=bs: tpu_leg(lambda: compile_decode_7b(
                    tpu_topology_mesh("v5e:1x1", (1, 1),
                                      chips_per_host_bounds=(1, 1, 1)),
                    batch_size=bs, quantize=True)),
            )
        # grouped int4: the bs=32 single-chip program (real HBM estimate),
        # and the same with the int8 KV cache (the cache is a TEMP, so only
        # these real-TPU estimates — not the CPU legs — can show its saving)
        L["tpu_decode_int4_1chip_bs32"] = run_leg(
            "TPU-AOT decode int4 1-chip bs32",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=32, quantize="int4")),
        )
        L["tpu_decode_int4_kv8_1chip_bs32"] = run_leg(
            "TPU-AOT decode int4+kv8 1-chip bs32",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=32, quantize="int4", kv_cache="int8")),
        )
        L["tpu_decode_int4_kv4_1chip_bs48"] = run_leg(
            "TPU-AOT decode int4+kv4 1-chip bs48",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=48, quantize="int4", kv_cache="int4")),
        )
        # visual-token pruning (LOSSY): real-TPU temp estimate for the
        # vt=128 program — the cache shrink CPU legs can't show
        L["tpu_decode_int8_vt128_1chip_bs16"] = run_leg(
            "TPU-AOT decode int8+vt128 1-chip bs16",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=16, quantize=True, visual_tokens=128)),
        )
        # Jacobi self-speculative decode under TP: the while_loop of s=7
        # verification passes must lower on real-TPU topology-AOT with the
        # same inventory shape class as the sequential tail (nothing weight-
        # or cache-sized across ICI)
        L["tpu_decode_jacobi_tp2_bs8"] = run_leg(
            "TPU-AOT decode jacobi tp2 bs8",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x2", (1, 2),
                                  chips_per_host_bounds=(1, 2, 1)),
                batch_size=8, jacobi=True)),
        )
        L["tpu_decode_int8_jacobi_1chip_bs8"] = run_leg(
            "TPU-AOT decode int8 jacobi 1-chip bs8",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=8, quantize=True, jacobi=True)),
        )
        # w8a8 prefill (act_quant='int8'): real HBM estimate for the int32
        # prefill-partial temps on top of the int8 weight arguments
        L["tpu_decode_w8a8_1chip_bs16"] = run_leg(
            "TPU-AOT decode w8a8 1-chip bs16",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x1", (1, 1),
                                  chips_per_host_bounds=(1, 1, 1)),
                batch_size=16, quantize=True, act_quant="int8")),
        )
        # w8a8 under TP on REAL-TPU lowering: the bit-identity guarantee
        # rides on the prefill partial-sum all-reduces staying s32 (pinned
        # s32 on the CPU lowering, tests/test_multichip_7b_shapes.py); this
        # leg records the dtype the real backend actually emits — if it
        # shows f32 psums, soften the docstring claim in models/decode.py
        L["tpu_decode_w8a8_tp2_bs16"] = run_leg(
            "TPU-AOT decode w8a8 tp2 bs16",
            lambda: tpu_leg(lambda: compile_decode_7b(
                tpu_topology_mesh("v5e:1x2", (1, 2),
                                  chips_per_host_bounds=(1, 2, 1)),
                batch_size=16, quantize=True, act_quant="int8")),
        )

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

        L["tpu_attack_flash_attempt"] = run_leg("TPU-AOT flash attempt", flash_leg)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    log(f"wrote {args.out}")
    ok = sum(1 for v in L.values() if v.get("status") == "ok")
    print(json.dumps({"legs_ok": ok, "legs_total": len(L), "out": args.out}))


if __name__ == "__main__":
    main()
