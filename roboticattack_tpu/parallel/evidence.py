"""Compile-time multi-chip evidence tooling.

Lowers FULL-shape programs with abstract (`jax.ShapeDtypeStruct`) parameters
on a dp x tp mesh — no weights materialized; `.lower()` never needs them —
then audits the compiled result: per-chip memory estimates from
`compiled.memory_analysis()` and the cross-device collective inventory parsed
from the optimized HLO.

Why this exists: tiny-config dryruns prove plumbing, not the production
layout — GSPMD's partitioning decisions are shape-dependent (a 4-head tiny
model shards differently than the 32-head 7B; see ops/flash_attention.py
head-axis caveat). This module makes the 7B-shape layout itself a compiled,
testable artifact (tests/test_multichip_7b_shapes.py), replacing the
arithmetic-only scaling model that backed BASELINE.md through round 3.

Backend notes:
- GSPMD partitioning runs before backend codegen, so the collective
  inventory from a virtual CPU mesh is the same one a real TPU slice
  executes; per-chip ARGUMENT bytes are exact sharded buffer sizes either
  way.
- CPU-backend TEMP estimates are junk for TPU claims: CPU codegen inserts
  f32 copies of every bf16 matmul operand (~2x the weight bytes). Real TPU
  temp/HBM numbers come from the relay's topology-AOT path
  (`jax.experimental.topologies.get_topology_desc(platform='tpu',
  topology_name='v5e:2x2')` works on this box) — see
  scripts/multichip_evidence.py.
- The Pallas flash kernel's `custom_partitioning` has no emitter in
  topology-AOT compiles (INVALID_ARGUMENT: Custom emitter for
  CustomSPMDPartitioning not found — measured round 4); evidence programs
  substitute `attn_impl='chunked'`, which partitions on batch/head with zero
  collectives just like flash (tests/test_flash_attention_tp.py), so the
  inventory is unaffected; chunked temps upper-bound flash temps (it
  materializes chunked score blocks).

Reference capability being scaled: NCCL DDP at
/root/reference/VLAAttacker/white_patch/UADA_ddp.py:138-221.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import VLAConfig


_HLO_BYTES = {"f64": 8, "f32": 4, "f16": 2, "bf16": 2, "s64": 8, "s32": 4,
              "u64": 8, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
              "pred": 1}

# The result capture is LAZY up to the op name: TPU layout annotations nest
# parens inside tuple results — `(f32[50,50,3]{1,0,2:T(8,128)S(1)}, ...)` —
# which a `\([^)]*\)` alternative truncates at the first `)`, silently
# dropping the tuple-fused patch-grad psum from TPU inventories (caught by
# round-4 review against real v5e topology-AOT HLO). Async pairs: `-done`
# ops carry the true result shape and are counted; `-start` ops are skipped
# (their tuple result aliases the input, which would double-count bytes).
_COLLECTIVE_RE = re.compile(
    r"= (.+?) "
    r"(all-reduce|all-gather|all-to-all|collective-permute|reduce-scatter)"
    r"(?:-done)?\("
)
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


class CollectiveOp(NamedTuple):
    op: str                                  # e.g. 'all-reduce'
    members: Tuple[Tuple[str, Tuple[int, ...]], ...]  # (dtype, dims) per tuple member
    nbytes: int                              # summed over members (per chip)

    def describe(self) -> str:
        parts = ", ".join(f"{d}[{','.join(map(str, s))}]" for d, s in self.members)
        return f"{self.op}({parts}) {self.nbytes}B"


def collect_collectives(hlo_text: str) -> List[CollectiveOp]:
    """Every cross-device collective op definition in optimized HLO,
    including variadic (tuple-result) all-reduces — XLA fuses the patch-grad
    psum with scalar metric reduces into one tuple op, which a naive
    single-shape regex misses."""
    out: List[CollectiveOp] = []
    for line in hlo_text.splitlines():
        m = _COLLECTIVE_RE.search(line)
        if not m:
            continue
        result, op = m.groups()
        members = []
        nbytes = 0
        for dtype, dims_s in _SHAPE_RE.findall(result):
            dims = tuple(int(d) for d in dims_s.split(",")) if dims_s else ()
            members.append((dtype, dims))
            nbytes += int(np.prod(dims, dtype=np.int64)) * _HLO_BYTES.get(dtype, 4)
        out.append(CollectiveOp(op=op, members=tuple(members), nbytes=nbytes))
    return out


def evidence_7b_config(name: str = "openvla-7b") -> VLAConfig:
    """The production config with chunked attention substituted (see module
    docstring: flash's custom_partitioning can't topology-AOT-compile, and
    CPU has no Pallas; the collective inventory is identical)."""
    from ..models import get_config

    cfg = get_config(name)
    return dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, attn_impl="chunked")
    )


def abstract_params(cfg: VLAConfig, mesh: Mesh, specs: Optional[Dict] = None,
                    cooked: bool = False, quantize=False) -> Dict:
    """ShapeDtypeStruct pytree of the model params with shardings attached.
    `cooked=True` builds the decode layout (decode_layout_params shapes) and
    defaults to serving TP specs; otherwise storage layout + training specs.
    `quantize` (cooked only): True/'int8' or 'int4' applies the weight-only
    shape transform (models/quant.py quantize_decode_shapes)."""
    from ..models import init_vla_params
    from .sharding import decode_param_specs, vla_param_specs

    shapes = jax.eval_shape(lambda k: init_vla_params(k, cfg), jax.random.key(0))
    if cooked:
        from ..models.decode import decode_layout_shapes

        shapes = decode_layout_shapes(shapes)
        if quantize:
            from ..models.quant import quantize_decode_shapes

            mode = "int8" if quantize is True else quantize
            shapes = quantize_decode_shapes(shapes, mode=mode)
        specs = specs or decode_param_specs(shapes)
    else:
        specs = specs or vla_param_specs(shapes)
    return jax.tree.map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)
        ),
        shapes, specs,
    )


def abstract_attack_inputs(mesh: Mesh, batch_size: int, pad_to: int,
                           image_size: int = 224,
                           patch_hw: Tuple[int, int] = (50, 50)):
    """(state, batch, lr, apply_update, rng) ShapeDtypeStructs for
    make_attack_step's signature: batch sharded over 'data', attack state
    (patch + AdamW moments) replicated — the production layout the attacker
    runner places (attacks/attacker.py)."""
    from ..attacks.engine import AttackBatch, AttackState
    from ..attacks.optimizer import AdamState

    def sds(shape, dtype, spec):
        return jax.ShapeDtypeStruct(
            shape, dtype, sharding=NamedSharding(mesh, spec)
        )

    batch = AttackBatch(
        images=sds((batch_size, image_size, image_size, 3), jnp.float32, P("data")),
        input_ids=sds((batch_size, pad_to), jnp.int32, P("data")),
        attention_mask=sds((batch_size, pad_to), jnp.int32, P("data")),
        labels=sds((batch_size, pad_to), jnp.int32, P("data")),
    )
    patch = sds((*patch_hw, 3), jnp.float32, P())
    state = AttackState(
        patch=patch,
        opt=AdamState(m=patch, v=patch, count=sds((), jnp.int32, P())),
        grad_acc=patch,
    )
    key_dtype = jax.eval_shape(lambda: jax.random.key(0)).dtype
    lr = sds((), jnp.float32, P())
    apply_update = sds((), jnp.bool_, P())
    rng = sds((), key_dtype, P())
    return state, batch, lr, apply_update, rng


def compile_attack_step_7b(mesh: Mesh, batch_size: int = 8, pad_to: int = 32,
                           objective: str = "uada", inner_loop: int = 2):
    """Lower + compile the FULL 7B attack step at production shapes with
    abstract params on `mesh`. Returns the jax.stages.Compiled."""
    from ..attacks import AttackSpec, make_attack_step
    from ..utils.labels import build_tma_target_tokens

    cfg = evidence_7b_config()
    maskidx = [0, 1, 2, 3, 4, 5, 6]
    target = (build_tma_target_tokens(np.zeros(7), maskidx)
              if objective == "tma" else None)
    step = make_attack_step(
        AttackSpec(objective=objective, geometry=True, inner_loop=inner_loop),
        cfg, target, maskidx,
    )
    p_abs = abstract_params(cfg, mesh)
    state, batch, lr, apply_update, rng = abstract_attack_inputs(
        mesh, batch_size, pad_to, image_size=cfg.dino.image_size
    )
    return step.lower(p_abs, state, batch, lr, apply_update, rng).compile()


def compile_decode_7b(mesh: Mesh, batch_size: int = 8, prompt_pad: int = 64,
                      quantize=False, kv_cache=None, jacobi: bool = False,
                      visual_tokens=None, act_quant=None):
    """Lower + compile the FULL 7B TP serving decode (cooked layout) with
    abstract params on `mesh`. `quantize`: True/'int8' or 'int4' weight-only
    stacks (models/quant.py) — the single-chip bs>=8 (int8) / bs>=16 (int4)
    serving configurations. `kv_cache='int8'` additionally halves the cache
    temps (models/decode.py _attend_kv8). `jacobi=True` compiles the
    draft-token self-speculative program (the decode tail as a while_loop of
    s=7 verification passes) — its TP inventory must match the sequential
    program's shape class ([B,7,D] psums instead of [B,1,D]; still nothing
    weight- or cache-sized, tests/test_multichip_7b_shapes.py).
    `act_quant='int8'` (with quantize int8): the w8a8 prefill — same weight
    arguments, int8 x int8 -> int32 prefill contractions; under TP the
    row-parallel partial sums cross ICI as the same [B,S,D]-class
    activations (int32/f32), still nothing tensor-sized."""
    from ..models.decode import greedy_decode_actions

    cfg = evidence_7b_config()
    p_abs = abstract_params(cfg, mesh, cooked=True, quantize=quantize)
    rep = NamedSharding(mesh, P())
    ids = jax.ShapeDtypeStruct((batch_size, prompt_pad), jnp.int32, sharding=rep)
    msk = jax.ShapeDtypeStruct((batch_size, prompt_pad), jnp.int32, sharding=rep)
    px = jax.ShapeDtypeStruct(
        (batch_size, 2, cfg.dino.image_size, cfg.dino.image_size, 3),
        jnp.dtype(cfg.dtype), sharding=rep,
    )
    if jacobi:
        draft = jax.ShapeDtypeStruct((batch_size, 7), jnp.int32, sharding=rep)
        fn = jax.jit(
            lambda p, i, m, x, d: greedy_decode_actions(
                p, cfg, i, m, x, cooked_weights=True, mesh=mesh,
                kv_cache=kv_cache, draft_tokens=d,
                visual_tokens=visual_tokens, act_quant=act_quant,
            )
        )
        return fn.lower(p_abs, ids, msk, px, draft).compile()
    fn = jax.jit(
        lambda p, i, m, x: greedy_decode_actions(
            p, cfg, i, m, x, cooked_weights=True, mesh=mesh,
            kv_cache=kv_cache, visual_tokens=visual_tokens,
            act_quant=act_quant,
        )
    )
    return fn.lower(p_abs, ids, msk, px).compile()


def memory_summary(compiled) -> Dict[str, float]:
    ma = compiled.memory_analysis()
    GB = 1024 ** 3
    return {
        "argument_gb": round(ma.argument_size_in_bytes / GB, 3),
        "temp_gb": round(ma.temp_size_in_bytes / GB, 3),
        "output_mb": round(ma.output_size_in_bytes / 1e6, 2),
        "total_gb": round(
            (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / GB, 3
        ),
    }


def collective_summary(compiled) -> List[Dict]:
    """JSON-friendly grouped inventory: [{op, members, count, nbytes}]."""
    from collections import Counter

    counts = Counter(collect_collectives(compiled.as_text()))
    return [
        {
            "op": c.op,
            "members": [f"{d}[{','.join(map(str, s))}]" for d, s in c.members],
            "nbytes_per_chip": c.nbytes,
            "count": n,
        }
        for c, n in sorted(counts.items(), key=lambda kv: -kv[0].nbytes)
    ]


def tpu_topology_mesh(topology_name: str = "v5e:2x2",
                      shape: Tuple[int, int] = (2, 2),
                      **topo_kwargs) -> Mesh:
    """A ('data','model') mesh over an UNATTACHED TPU topology — compiles
    through the relay produce real TPU HBM estimates without multi-chip
    hardware. Raises whatever the plugin raises if topologies are
    unsupported; callers record the outcome either way.

    Sub-default-host topologies need explicit bounds, e.g. a 2-chip slice:
    tpu_topology_mesh('v5e:1x2', (1, 2), chips_per_host_bounds=(1, 2, 1))
    (the default 2x2x1 bounds reject '1x2' as non-divisible)."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=topology_name, **topo_kwargs
    )
    devices = np.asarray(topo.devices).reshape(shape)
    return Mesh(devices, axis_names=("data", "model"))
