"""Compiled 7B-SHAPE multi-chip evidence (VERDICT r3 missing #4 / weak #1).

Tiny-config dryruns prove plumbing; GSPMD partitioning is shape-dependent.
These tests lower the dp x tp attack step and the TP serving decode at FULL
OpenVLA-7B shapes with abstract params on the virtual CPU mesh — no weights
materialized — and pin the collective inventory + per-chip argument bytes
that BASELINE.md's scaling section quotes. GSPMD runs before backend codegen,
so the inventory equals what a real TPU slice executes.

Reference capability being scaled: NCCL DDP, UADA_ddp.py:138-221; serving,
modeling_prismatic.py:506-534.
"""

import numpy as np
import jax

from roboticattack_tpu.parallel import make_mesh
from roboticattack_tpu.parallel.evidence import (
    collect_collectives,
    compile_attack_step_7b,
    compile_decode_7b,
    memory_summary,
)

MB = 1 << 20
GB = 1 << 30


def _member_bytes(dtype, dims):
    from roboticattack_tpu.parallel.evidence import _HLO_BYTES

    return int(np.prod(dims, dtype=np.int64)) * _HLO_BYTES.get(dtype, 4)


def test_collect_collectives_parses_real_tpu_hlo_forms():
    """Literal HLO lines captured from a real v5e topology-AOT compile
    (round 4): tuple results carry nested parens in layout annotations
    (`T(8,128)`), and collective-permutes lower as async start/done pairs.
    The parser must see the tuple-fused patch-grad psum, count `-done` ops
    (true result shape), and skip `-start` ops (tuple aliases the input)."""
    hlo = "\n".join([
        '%all-reduce.60 = bf16[4,288,4096]{2,1,0:T(8,128)(2,1)S(1)} '
        'all-reduce(%fusion.2641), channel_id=3, replica_groups=[2,2]<=[4]',
        '%all-reduce.57 = (f32[50,50,3]{1,0,2:T(8,128)S(1)}, f32[]{:T(128)}, '
        'f32[]{:T(128)}, f32[]{:T(128)}) all-reduce(%get-tuple-element.6484)',
        '%collective-permute-start = (f32[4,32,128]{2,1,0:T(8,128)}, '
        'f32[4,32,128]{2,1,0:T(8,128)}, u32[]{:S(2)}, u32[]{:S(2)}) '
        'collective-permute-start(%get-tuple-element.6390), channel_id=10',
        '%collective-permute-done = f32[4,32,128]{2,1,0:T(8,128)} '
        'collective-permute-done(%collective-permute-start)',
        '%all-gather.5 = s32[4,31,2]{1,0,2:T(4,128)S(1)} '
        'all-gather(%bitcast.2283), channel_id=12, dimensions={2}',
    ])
    colls = collect_collectives(hlo)
    by_op = {}
    for c in colls:
        by_op.setdefault(c.op, []).append(c)
    assert len(by_op["all-reduce"]) == 2
    tuple_ar = by_op["all-reduce"][1]
    assert ("f32", (50, 50, 3)) in tuple_ar.members, tuple_ar
    assert tuple_ar.nbytes == 50 * 50 * 3 * 4 + 3 * 4
    # exactly ONE permute: the -done (result shape), not the -start alias
    assert len(by_op["collective-permute"]) == 1
    assert by_op["collective-permute"][0].members == (("f32", (4, 32, 128)),)
    assert len(by_op["all-gather"]) == 1


def test_attack_step_dp4_tp2_7b_inventory_and_memory():
    """dp=4 x tp=2, bs=8 global (2/chip), pad 32 (seq 288) — the BASELINE
    scaling-model layout. Pins:
      * exactly ONE patch-gradient psum (the DP traffic torch DDP does by
        hand) — XLA fuses it with scalar metric reduces into a tuple op
      * every other tensor-sized psum is a [2,288,4096] TP activation
        (post-o_proj/down_proj + their backward/remat duals) or the [2,32,4096]
        vocab-sharded embed lookup — NOTHING weight- or batch-gather-sized
      * no reduce-scatter / all-to-all; gathers and permutes stay sub-MB
        (CE/argmax bookkeeping over the vocab-sharded lm_head)
      * per-chip arguments ~7.7 GB = 13.0 GB LLM / tp=2 + ~1.2 GB replicated
        ViTs/projector (vs 14.9 GB single-chip — the 7.2 GB the tp axis frees
        for pad_to=48 / larger batch)
    """
    mesh = make_mesh(data=4, model=2, devices=jax.devices())
    comp = compile_attack_step_7b(mesh, batch_size=8, pad_to=32)

    mem = memory_summary(comp)
    assert 7.0 < mem["argument_gb"] < 8.5, mem

    local_b = 8 // 4
    activation = (local_b, 288, 4096)
    embed_lookup = (local_b, 32, 4096)
    patch = (50, 50, 3)

    n_patch_psums = 0
    n_activation_psums = 0
    for c in collect_collectives(comp.as_text()):
        assert c.op not in ("reduce-scatter", "all-to-all"), c.describe()
        if c.op in ("all-gather", "collective-permute"):
            assert c.nbytes < MB, c.describe()
            continue
        for dtype, dims in c.members:
            if dims == patch:
                n_patch_psums += 1
            elif dims == activation:
                n_activation_psums += 1
            else:
                assert dims == embed_lookup or _member_bytes(dtype, dims) < MB, (
                    c.describe()
                )
    assert n_patch_psums == 1, f"want exactly one patch-grad psum, got {n_patch_psums}"
    # 2 per layer-pass (o_proj + down_proj), x fwd + bwd + remat re-forward:
    # at least fwd's 2, and all of them inside scan bodies (so single digits)
    assert 2 <= n_activation_psums <= 12, n_activation_psums


def test_attack_step_pure_dp8_7b_single_patch_psum():
    """Pure DP over 8 devices at 7B shapes: gradient traffic is ONE
    patch-shaped psum and scalar metrics — the 30 KB/step that makes DP
    scaling communication-free (BASELINE.md), now pinned at production shape
    (tests/test_data_parallel.py pins the same at tiny shape)."""
    mesh = make_mesh(data=8, model=1, devices=jax.devices())
    comp = compile_attack_step_7b(mesh, batch_size=8, pad_to=32)

    n_patch = 0
    for c in collect_collectives(comp.as_text()):
        assert c.op == "all-reduce", c.describe()
        for dtype, dims in c.members:
            if dims == (50, 50, 3):
                n_patch += 1
            else:
                assert _member_bytes(dtype, dims) < 1024, c.describe()
    assert n_patch == 1


def test_decode_tp2_7b_inventory_and_memory():
    """TP=2 serving decode at bs=8 (one chip caps at bs<=4): per-chip args
    ~7.8 GB; per decode step only two [8,1,4096] row-parallel psums + the
    prefill's [8,320,4096] duals + sub-MB argmax gathers. Nothing weight- or
    KV-cache-sized crosses ICI."""
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    comp = compile_decode_7b(mesh, batch_size=8, prompt_pad=64)

    mem = memory_summary(comp)
    assert 7.0 < mem["argument_gb"] < 8.5, mem

    allowed_psums = {(8, 1, 4096), (8, 320, 4096)}
    colls = collect_collectives(comp.as_text())
    assert colls, "expected row-parallel psums"
    for c in colls:
        assert c.op in ("all-reduce", "all-gather"), c.describe()
        if c.op == "all-reduce":
            for _, dims in c.members:
                assert dims in allowed_psums, c.describe()
        else:
            assert c.nbytes < MB, c.describe()


def test_decode_int8_single_chip_bs8_memory():
    """Int8 weight-only serving (models/quant.py) at bs=8 on ONE chip — the
    configuration bf16 cannot compile at all (bs>=6 OOMs in 15.75 GB HBM,
    BASELINE.md): per-chip weight arguments drop to ~7.7 GB and no
    collectives exist (single device). Measured on the real v5e: 19.4
    actions/s (vs 12.9 at the bf16 bs=4 ceiling)."""
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    comp = compile_decode_7b(mesh, batch_size=8, quantize=True)

    mem = memory_summary(comp)
    assert 7.5 < mem["argument_gb"] < 7.9, mem
    assert not collect_collectives(comp.as_text())


def test_decode_int4_single_chip_bs16_memory():
    """Grouped int4 weight-only serving (models/quant.py mode='int4') at
    bs=16 on ONE chip: per-chip weight arguments drop to ~5.0 GB (int8:
    ~7.7, bf16: 13.5 — which caps at bs<=4), leaving HBM headroom for
    twice the int8 ceiling's KV cache. No collectives (single device)."""
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    comp = compile_decode_7b(mesh, batch_size=16, quantize="int4")

    mem = memory_summary(comp)
    assert 4.6 < mem["argument_gb"] < 5.2, mem
    assert not collect_collectives(comp.as_text())


def test_decode_int4_tp2_no_weight_gather():
    """int4 + tp=2: grouped scales shard with their stacks (column-parallel
    OUT / row-parallel contraction GROUPS, parallel/sharding.py _scale_spec);
    the compiled program moves only [B,1,D]-activation psums and the logit
    gather across ICI — never an int4 stack or the KV cache."""
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    comp = compile_decode_7b(mesh, batch_size=16, quantize="int4")

    mem = memory_summary(comp)
    # ~1.7 GB of int4 stack shards + ~1.3 GB replicated vision/projector/embed
    assert mem["argument_gb"] < 3.4, mem
    # same inventory as the bf16 tp=2 decode (test_decode_tp2_7b...): the
    # row-parallel activation psums per decode step ([16,1,4096]) and per
    # prefill pass ([16,320,4096]) + sub-MB argmax/logit gathers — int4
    # changes the weight bytes, not what crosses ICI
    # (dims compared sorted: the grouped-einsum output psum lowers in an
    # [out, b, s]-major layout, e.g. f32[4096,16,1])
    allowed_psums = {(1, 16, 4096), (16, 320, 4096)}
    colls = collect_collectives(comp.as_text())
    assert colls, "expected row-parallel psums"
    for c in colls:
        assert c.op in ("all-reduce", "all-gather"), c.describe()
        if c.op == "all-reduce":
            for _, dims in c.members:
                assert tuple(sorted(dims)) in allowed_psums, c.describe()
        else:
            assert c.nbytes < MB, c.describe()


def test_decode_jacobi_tp2_inventory_and_memory():
    """The Jacobi self-speculative decode program (models/decode.py
    draft_tokens) under tp=2 at FULL 7B shape: identical argument bytes to
    the sequential program (the draft is 56 ints), and the while_loop's s=7
    verification passes move only activation-sized row-parallel psums
    ([8,7,4096] instead of the sequential tail's [8,1,4096]) plus the
    prefill's [8,320,4096] duals and the [8,7,V] logit gather for the
    all-position argmax (~7 MB f32) — never a weight stack or the KV cache."""
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    comp = compile_decode_7b(mesh, batch_size=8, prompt_pad=64, jacobi=True)

    mem = memory_summary(comp)
    assert 7.0 < mem["argument_gb"] < 8.5, mem

    allowed_psums = {(8, 7, 4096), (8, 320, 4096)}
    colls = collect_collectives(comp.as_text())
    assert colls, "expected row-parallel psums"
    for c in colls:
        assert c.op in ("all-reduce", "all-gather"), c.describe()
        if c.op == "all-reduce":
            for _, dims in c.members:
                assert tuple(sorted(dims)) in {
                    tuple(sorted(p)) for p in allowed_psums
                }, c.describe()
        else:
            # the [8,7,32064] f32 logit gather is ~7.2 MB; everything else
            # (argmax indices, convergence flag) is sub-MB
            assert c.nbytes < 16 * MB, c.describe()


def test_decode_w8a8_tp2_inventory_and_memory():
    """w8a8 (act_quant='int8') under tp=2 at FULL 7B shape, bs=16: identical
    int8 weight arguments to weight-only int8 (~3.9 GB/chip at tp=2 — w8a8
    changes the program, not the stored weights), and the int8 x int8
    prefill's row-parallel partial sums still cross ICI as [16,S,4096]-class
    activations (int32 or f32 — XLA's choice, both exact) plus the
    [16,1,4096] decode-step psums and sub-MB argmax gathers. Nothing weight-
    or cache-sized. (4.63 GB/chip = the ~7.7 GB int8 pytree with LLM stacks
    halved and vision/projector/embed replicated.)"""
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    comp = compile_decode_7b(mesh, batch_size=16, prompt_pad=64,
                             quantize=True, act_quant="int8")

    mem = memory_summary(comp)
    assert 3.5 < mem["argument_gb"] < 5.0, mem

    allowed_psums = {(16, 1, 4096), (16, 320, 4096)}
    colls = collect_collectives(comp.as_text())
    assert colls, "expected row-parallel psums"
    for c in colls:
        assert c.op in ("all-reduce", "all-gather"), c.describe()
        if c.op == "all-reduce":
            # sub-MB all-reduces are the per-token absmax MAX-collectives
            # _quantize_act's docstring promises ([16,320] f32 = 20 KB)
            if c.nbytes < MB:
                continue
            for dt, dims in c.members:
                assert tuple(sorted(dims)) in {
                    tuple(sorted(p)) for p in allowed_psums
                }, c.describe()
                # the w8a8 TP bit-identity guarantee rides on the PREFILL
                # partial sums crossing ICI as integers (s32 addition is
                # exact; an f32 lowering would round partials > 2^24 and
                # break single-chip equality). Pin it here; the topology-AOT
                # evidence leg records the real-TPU dtype via this same
                # parser (CLAUDE.md: real-TPU HLO lowers differently).
                if tuple(sorted(dims)) == (16, 320, 4096):
                    assert dt == "s32", c.describe()
        else:
            assert c.nbytes < MB, c.describe()


def test_decode_pure_dp2_no_collectives():
    """Pure data-parallel serving decode at FULL 7B shape (dp=2, tp=1):
    every batch row is independent, so the compiled program must move ZERO
    bytes across ICI — no all-reduce, no all-gather, nothing. (The cache's
    pinned batch axis makes this hold; an unpinned cache propagating to
    replicated would all-gather it every step.) Linear dp throughput
    scaling is then a compiled fact, not an assumption."""
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    comp = compile_decode_7b(mesh, batch_size=8, prompt_pad=64, quantize=True)
    colls = collect_collectives(comp.as_text())
    assert colls == [], [c.describe() for c in colls]


def test_documented_envelope_matches_artifact():
    """The regression guard the round-4 bs=32 incident lacked: the
    single-chip serving envelope the docs claim (CLAUDE.md, BASELINE.md's
    serving table) must be backed by a green, POSITIVE-headroom topology-AOT
    leg in MULTICHIP_EVIDENCE.json, and no leg may record negative headroom
    without a loud fits=false flag (scripts/multichip_evidence.py). If a
    decode-path change regrows the temp bill, the evidence regen flips
    `fits` and this test names the doc claim that just went stale."""
    import json
    import os

    art_path = os.path.join(os.path.dirname(__file__), "..",
                            "MULTICHIP_EVIDENCE.json")
    with open(art_path) as f:
        legs = json.load(f)["legs"]

    # every leg with a real-TPU headroom estimate: the fits flag, when
    # recorded, must be truthful, and NEGATIVE headroom must never pass
    # silently (fits flag absent was exactly the round-4 failure mode)
    for name, leg in legs.items():
        hr = leg.get("memory", {}).get("headroom_gb")
        if hr is None:
            continue
        if "fits" in leg:
            assert leg["fits"] == (hr >= 0), (name, hr, leg["fits"])
        else:
            assert hr >= 0, (
                f"{name}: headroom {hr} < 0 recorded without fits=false — "
                "regenerate with scripts/multichip_evidence.py"
            )

    # the documented envelope (cache-in-carry decode, round 5): every row
    # cited by CLAUDE.md / BASELINE.md as fitting one 15.75 GB v5e
    documented = [
        "tpu_decode_int8_1chip_bs8",
        "tpu_decode_int8_1chip_bs16",
        "tpu_decode_int8_kv8_1chip_bs32",
        "tpu_decode_int4_1chip_bs32",
        "tpu_decode_int4_kv8_1chip_bs32",
        "tpu_decode_int4_kv4_1chip_bs48",
        "tpu_decode_int4_kv4_1chip_bs64",
    ]
    for name in documented:
        leg = legs.get(name)
        assert leg is not None, f"{name}: documented leg missing from artifact"
        assert leg.get("status") == "ok", (name, leg.get("error", leg))
        assert leg["memory"]["headroom_gb"] >= 0, (name, leg["memory"])
        assert leg.get("fits", True) is True, (name, leg)
