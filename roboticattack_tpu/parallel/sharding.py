"""Tensor-parallel PartitionSpecs for the VLA parameter pytree.

Single-chip v5e HBM (16 GB) barely holds the bf16 7B weights; real multi-chip
deployments shard them over a 'model' mesh axis (Megatron-style column/row
splits) while batches shard over 'data'. We only annotate parameter shardings —
XLA GSPMD propagates activation shardings and inserts the psum/all-gather
collectives over ICI (the scaling-book recipe; replaces any hand-written
NCCL plumbing).

Layout (Llama block):
  q/k/v:   [L, D, H*hd]   split on heads (last dim)   — column parallel
  o:       [L, H*hd, D]   split on heads (dim 1)      — row parallel (psum after)
  gate/up: [L, D, I]      split on I                  — column parallel
  down:    [L, I, D]      split on I (dim 1)          — row parallel
  embed:   [V, D]         split on V (gather + psum)
  lm_head: [D, V]         split on V (logits vocab-sharded; CE reduces fine)
ViTs + projector are <2 GB total and stay replicated by default (sharding the
projector's 4x blow-up is available via `shard_projector`).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_specs(model_axis: str = "model") -> Dict:
    m = model_axis
    return {
        "embed": P(m, None),
        "layers": {
            "attn_norm": P(),
            "q_w": P(None, None, m),
            "k_w": P(None, None, m),
            "v_w": P(None, None, m),
            "o_w": P(None, m, None),
            "mlp_norm": P(),
            "gate_w": P(None, None, m),
            "up_w": P(None, None, m),
            "down_w": P(None, m, None),
        },
        "norm": P(),
        "lm_head": P(None, m),
    }


def phi_param_specs(model_axis: str = "model") -> Dict:
    """Megatron-style TP for the Phi-2 block (models/phi.py layout): q/k/v and
    fc1 column-split with their biases, o/fc2 row-split (psum after), norms +
    post-psum biases replicated."""
    m = model_axis
    return {
        "ln_scale": P(), "ln_bias": P(),
        "q_w": P(None, None, m), "q_b": P(None, m),
        "k_w": P(None, None, m), "k_b": P(None, m),
        "v_w": P(None, None, m), "v_b": P(None, m),
        "o_w": P(None, m, None), "o_b": P(),
        "fc1_w": P(None, None, m), "fc1_b": P(None, m),
        "fc2_w": P(None, m, None), "fc2_b": P(),
    }


def _decoder_layer_specs(layer_keys: set, model_axis: str) -> Dict:
    """Spec dict for a stacked decoder-layer pytree, strict about unknown
    keys: a renamed Llama param must fail loudly here, not silently lose its
    TP sharding (replicating a 7B weight on a 16 GB chip = far-away OOM)."""
    llama = llama_param_specs(model_axis)["layers"]
    if layer_keys <= set(llama):
        return {k: llama[k] for k in layer_keys}
    phi = phi_param_specs(model_axis)
    if layer_keys <= set(phi):
        return {k: phi[k] for k in layer_keys}
    unknown = layer_keys - set(llama) - set(phi)
    raise KeyError(
        f"decoder layer keys {sorted(unknown)} have no TP PartitionSpec; "
        f"add them to llama_param_specs/phi_param_specs"
    )


def vit_param_specs() -> Dict:
    """Replicated (ViTs are ~1.5 GB bf16 combined)."""
    return None  # sentinel: replicate whole subtree


def vla_param_specs(params: Dict, model_axis: str = "model",
                    shard_projector: bool = False) -> Dict:
    """Full spec pytree matching `params`' structure."""
    def replicate_like(tree):
        return jax.tree.map(lambda _: P(), tree)

    specs = {
        "vision": replicate_like(params["vision"]),
        "projector": replicate_like(params["projector"]),
        "llm": {
            "embed": P(model_axis, None),
            "layers": _decoder_layer_specs(set(params["llm"]["layers"]), model_axis),
            "norm": jax.tree.map(lambda _: P(), params["llm"]["norm"]),
            "lm_head": jax.tree.map(
                lambda _: P(None, model_axis) if _.ndim == 2 else P(model_axis),
                params["llm"]["lm_head"],
            ) if isinstance(params["llm"]["lm_head"], dict) else P(None, model_axis),
        },
    }
    if shard_projector:
        specs["projector"] = {
            "fc1_w": P(None, model_axis), "fc1_b": P(model_axis),
            "fc2_w": P(model_axis, None), "fc2_b": P(),
        }
        if "fc3_w" in params["projector"]:  # fused 3-layer variant
            specs["projector"].update({"fc3_w": P(), "fc3_b": P()})
    return specs


def shard_params(params: Dict, mesh: Mesh, model_axis: str = "model",
                 shard_projector: bool = False) -> Dict:
    """Place a parameter pytree with TP shardings over `mesh`."""
    specs = vla_param_specs(params, model_axis, shard_projector)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


# ------------------------------------------------------------- decode (serving)

def _scale_spec(params: Dict, key: str, col: bool, m: str) -> P:
    """PartitionSpec for a quantization-scale leaf, by its rank (int8
    [L, out] vs int4 grouped [L, out, G] — see decode_param_specs body)."""
    leaf = params["llm"]["layers"].get(key)
    grouped = leaf is not None and getattr(leaf, "ndim", 2) == 3
    if col:
        return P(None, m, None) if grouped else P(None, m)
    return P(None, None, m) if grouped else P()


def decode_param_specs(params: Dict, model_axis: str = "model") -> Dict:
    """TP PartitionSpecs for the COOKED decode pytree (models/decode.py
    decode_layout_params output: projection stacks are [L, out, in], the
    transpose of the storage layout the training specs above annotate).

    Megatron split, serving flavor:
      q/k/v cooked [L, H*hd, D]  split on heads (dim 1)  — column parallel
      o     cooked [L, D, H*hd]  split on heads (dim 2)  — row parallel (psum)
      gate/up [L, I, D]          split on I (dim 1)      — column parallel
      down    [L, D, I]          split on I (dim 2)      — row parallel (psum)
      lm_head [D, V]             split on V — the per-step argmax gathers one
                                 [B, 1, V] f32 logit row (~1 MB at bs=8)
      embed                      REPLICATED (262 MB bf16): the decode hot loop
                                 gathers one row per step; a vocab-sharded
                                 embed would turn that into a collective per
                                 token for a 131 MB/chip saving at tp=2 —
                                 wrong trade for serving
      vision/projector/norms     replicated (<2 GB combined)

    Raises KeyError on non-Llama layer keys: `greedy_decode_actions` is the
    OpenVLA action head (Phi zoo VLMs are forward/CE models, decode.py:105).
    """
    m = model_axis
    cooked = {
        "attn_norm": P(), "mlp_norm": P(),
        "q_w": P(None, m, None), "k_w": P(None, m, None), "v_w": P(None, m, None),
        "o_w": P(None, None, m),
        "gate_w": P(None, m, None), "up_w": P(None, m, None),
        "down_w": P(None, None, m),
        # quantization scales (models/quant.py). int8: [L, out] follows the
        # OUT dim of its stack — column-parallel stacks shard out; the
        # row-parallel o/down stacks shard the CONTRACTION, so their scales
        # (full model-dim out) replicate — dequantization is linear, so
        # scaling partial products before the psum is exact. int4 grouped
        # scales are [L, out, G] with G tiling the contraction: column-
        # parallel shards out (dim 1), row-parallel shards the GROUPS (dim 2)
        # so each chip scales the partial sums of exactly its contraction
        # slice before the psum (exact for the same linearity reason).
        "q_w_scale": _scale_spec(params, "q_w_scale", col=True, m=m),
        "k_w_scale": _scale_spec(params, "k_w_scale", col=True, m=m),
        "v_w_scale": _scale_spec(params, "v_w_scale", col=True, m=m),
        "o_w_scale": _scale_spec(params, "o_w_scale", col=False, m=m),
        "gate_w_scale": _scale_spec(params, "gate_w_scale", col=True, m=m),
        "up_w_scale": _scale_spec(params, "up_w_scale", col=True, m=m),
        "down_w_scale": _scale_spec(params, "down_w_scale", col=False, m=m),
    }
    layer_keys = set(params["llm"]["layers"])
    if not layer_keys <= set(cooked):
        raise KeyError(
            f"decode TP supports the Llama-family layer layout only; "
            f"unknown keys {sorted(layer_keys - set(cooked))}"
        )
    def replicate_like(tree):
        return jax.tree.map(lambda _: P(), tree)

    llm_keys = set(params["llm"])
    llm = {
        "embed": P(),
        "layers": {k: cooked[k] for k in layer_keys},
        "norm": jax.tree.map(lambda _: P(), params["llm"]["norm"]),
        "lm_head": P(None, m),
    }
    if "lm_head_scale" in llm_keys:
        # int8 [V] / int4 grouped [V, G] — follows the vocab split either way
        # (the int4 groups tile the REPLICATED hidden contraction)
        sc = params["llm"]["lm_head_scale"]
        llm["lm_head_scale"] = P(m, None) if getattr(sc, "ndim", 1) == 2 else P(m)
    if "embed_scale" in llm_keys:    # [V] f32, 128 KB — replicated like embed
        llm["embed_scale"] = P()
    return {
        "vision": replicate_like(params["vision"]),
        "projector": replicate_like(params["projector"]),
        "llm": llm,
    }


def shard_decode_params(params: Dict, mesh: Mesh, model_axis: str = "model") -> Dict:
    """Place a COOKED decode pytree with serving TP shardings over `mesh`."""
    specs = decode_param_specs(params, model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
