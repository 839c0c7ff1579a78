"""TPU-side VLA policy for closed-loop evaluation.

`VLAPolicy.get_action` is the `get_model`/`get_action`/`get_vla_action` stack
of the reference (experiments/robot/robot_utils.py:40-74,
openvla_utils.py:31-170) collapsed into one object: frame -> prompt ->
processor -> jitted greedy decode on TPU -> unnormalized 7-DoF action.

The decode compiles once (fixed prompt pad length) and serves every task
instruction; the env-side gripper sign conventions stay with the caller
(utils/gripper.py).
"""

from __future__ import annotations

import sys
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.config import VLAConfig
from ..models.decode import (
    decode_layout_params,
    ensure_trailing_empty_token,
    greedy_decode_actions,
    unnormalize_actions,
)
from ..utils.constants import PAD_TOKEN_ID
from ..utils.normalization import dual_normalize
from ..utils.prompting import TextTokenizer
from .processing import center_crop_resize_tf, eval_prompt, resize_bicubic_pil

PROMPT_PAD = 64


# the shared --quantize grammar lives in the jax-free utils.quant_args (the
# CLIs validate at parse time without importing this module); re-exported
# here for established importers
from ..utils.quant_args import (  # noqa: E402,F401
    parse_quantize as _parse_quantize,
    quantize_arg,
    resolve_quantize,
)


class VLAPolicy:
    def __init__(
        self,
        params,
        cfg: VLAConfig,
        tokenizer: TextTokenizer,
        norm_stats: Dict,
        unnorm_key: Optional[str] = None,
        center_crop: bool = False,
        prompt_pad: int = PROMPT_PAD,
        cooked_weights: bool = False,
        mesh=None,
        quantize: Optional[str] = None,
        kv_cache: Optional[str] = None,
        visual_tokens: Optional[int] = None,
        int4_kernel: Optional[bool] = None,
    ) -> None:
        """`cooked_weights=True`: params already went through
        decode_layout_params (the decode always runs the cooked math — an
        uncooked 7B cannot even compile in 15.75 GB HBM). Default False cooks
        here: HOST-side when the pytree is numpy (the checkpoint-load path)
        or lives on the CPU backend; an on-ACCELERATOR transpose of a large
        model would need 2x HBM and raises with guidance instead.

        `mesh`: a jax.sharding.Mesh with a 'model' axis enables
        tensor-parallel serving — weights Megatron-split per
        parallel.sharding.decode_param_specs, KV cache head-sharded
        (models/decode.py). One 15.75 GB v5e caps batched decode at bs<=4;
        tp=2 halves the per-chip weight bytes and bs=8 fits
        (tests/test_decode_tp.py pins the compiled per-chip numbers).

        `quantize='int8'`: weight-only per-channel int8 on the LLM stack +
        lm_head/embed (models/quant.py) — ~7 GB of weight arguments instead
        of 13.5, so bs=8..16 batched serving fits on a SINGLE chip, and each
        decode step streams half the bytes. `quantize='int4'` (or
        'int4:<group_size>'; default auto — the largest standard size
        dividing every contraction dim, models.quant.int4_group_size_for):
        grouped-scale int4 stacks — ~5 GB
        total pytree, packed s4 streaming in the decode hot loop. All modes
        compose with `mesh` (the scale leaves have TP specs). Host-side,
        like cooking. `quantize='w8a8'`: int8 weights PLUS dynamic per-token
        int8 prefill activations — the batched-serving FLOP bill runs the
        MXU's double-rate integer path (LOSSY: activation rounding; the
        decode tail stays weight-only int8).

        `kv_cache='int8'`: int8 KV cache with exact per-position
        dequantization around both attention matmuls (models/decode.py
        _attend_kv8) — halves the cache's HBM bill, the next ceiling after
        weight quantization at large serving batches. `kv_cache='int4'`:
        packed-s4 cache (grouped K scales / per-position V scales,
        _attend_kv4) — quarters it; both keep the first generated token
        bit-identical (prefill attends full-precision)."""
        # 'w8a8' resolves to int8 weights + dynamic int8 PREFILL activations
        # on the MXU's double-rate integer path (models/decode.py act_quant).
        # The decode tail stays weight-only int8; LOSSY like visual_tokens —
        # validate on real weights via the acceptance gate's w8a8 mode.
        quant_mode, act_quant, quant_gs = resolve_quantize(quantize)
        # fused Pallas dequant-matmul decode tail (ops/q4_matmul.py):
        # None = auto — engage for single-device int4 serving on a TPU
        # backend (the kernel has no GSPMD partitioning rules; off-TPU it
        # would run interpreted, i.e. only useful to tests)
        if int4_kernel is None:
            int4_kernel = (
                quant_mode == "int4"
                and mesh is None
                and jax.default_backend() == "tpu"
            )
        self.int4_kernel = bool(int4_kernel)

        def _host_xp(what):
            # host-side transforms only: an on-ACCELERATOR pass over a large
            # model would transiently need 2x HBM for the weight bytes
            leaves = jax.tree.leaves(params)
            on_host = isinstance(leaves[0], np.ndarray)
            if not on_host and leaves[0].devices().pop().platform != "cpu" \
                    and sum(x.nbytes for x in leaves) > 4e9:
                raise ValueError(
                    f"params for a large model live on the accelerator; "
                    f"{what} there would need 2x HBM. Pass HOST (numpy or "
                    f"CPU-backend) params — load_policy does this — or "
                    f"pre-cook with models.decode.decode_layout_params and "
                    f"pass cooked_weights=True"
                )
            return np if on_host else jnp

        if not cooked_weights:
            params = decode_layout_params(
                params, xp=_host_xp("cooking the decode weight layout")
            )
        if quant_mode is not None:
            from ..models.quant import (
                int4_group_size_for,
                quantize_decode_params,
            )

            if quant_gs is None:
                # with a TP mesh in hand, pick a group size whose groups
                # never straddle a row-parallel shard boundary
                tp = (mesh.shape.get("model", 1) if mesh is not None else 1)
                quant_gs = int4_group_size_for(cfg, tp=tp)
            params = quantize_decode_params(
                params,
                xp=_host_xp(f"{quant_mode} quantization"),
                mode=quant_mode,
                group_size=quant_gs,
            )
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import shard_decode_params

            # feed the HOST pytree straight to device_put-with-sharding: a
            # jnp.asarray pass first would commit the FULL model to chip 0
            # and only then reshard — transiently full-model + shard HBM on
            # one chip, an OOM at tp=2 on the 7B (the very configuration TP
            # exists for). device_put shards host->chips directly.
            self.params = shard_decode_params(params, mesh)
        else:
            # place on the default backend device (host/CPU-cooked pytrees
            # would otherwise stay — and decode — on the CPU even with a TPU
            # attached)
            self.params = jax.device_put(
                jax.tree.map(jnp.asarray, params), jax.devices()[0]
            )
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.norm_stats = norm_stats
        self.unnorm_key = unnorm_key
        self.center_crop = center_crop
        self.prompt_pad = prompt_pad
        self._decode = jax.jit(
            lambda p, ids, mask, px: greedy_decode_actions(
                p, cfg, ids, mask, px, cooked_weights=True, mesh=mesh,
                kv_cache=kv_cache, visual_tokens=visual_tokens,
                act_quant=act_quant, int4_kernel=self.int4_kernel,
            )
        )
        # Jacobi variant (separate program: the draft arg changes the tail's
        # control flow — models/decode.py); compiled on first drafted call
        self._decode_draft = jax.jit(
            lambda p, ids, mask, px, d: greedy_decode_actions(
                p, cfg, ids, mask, px, cooked_weights=True, mesh=mesh,
                kv_cache=kv_cache, draft_tokens=d, visual_tokens=visual_tokens,
                act_quant=act_quant, int4_kernel=self.int4_kernel,
            )
        )
        self._prompt_cache: Dict[str, np.ndarray] = {}
        self._dp_warned: set = set()
        # [N, 7] token ids of the most recent get_action_multi call — the
        # natural draft for the NEXT control step (consecutive robot actions
        # mostly repeat tokens); callers opt in with draft_tokens="last"
        self.last_tokens: Optional[np.ndarray] = None
        # verification passes the most recent drafted decode ran (1 = draft
        # accepted whole); serving observability for draft quality
        self.last_verify_passes: Optional[int] = None

    def _place(self, arr: jnp.ndarray) -> jnp.ndarray:
        """Input placement: batch dim split over 'data' when the mesh has one
        and it divides the batch; otherwise replicated (pure-TP serving) —
        with a once-per-batch-size warning, because a dp mesh silently
        serving every batch replicated is paid-for hardware doing nothing."""
        if self.mesh is None:
            return arr
        from jax.sharding import NamedSharding, PartitionSpec as P

        d = self.mesh.shape.get("data", 1)
        divisible = arr.shape[0] % d == 0
        if d > 1 and not divisible and arr.shape[0] not in self._dp_warned:
            self._dp_warned.add(arr.shape[0])
            print(
                f"WARNING: batch {arr.shape[0]} not divisible by the mesh's "
                f"data axis ({d}); serving this batch size replicated "
                f"(no dp speedup)",
                file=sys.stderr, flush=True,
            )
        spec = P("data") if d > 1 and divisible else P()
        return jax.device_put(arr, NamedSharding(self.mesh, spec))

    def _tokenize(self, task_label: str):
        key = task_label
        if key not in self._prompt_cache:
            ids = np.asarray(self.tokenizer.encode(eval_prompt(task_label), add_bos=True), np.int32)
            row = np.full((1, self.prompt_pad), PAD_TOKEN_ID, np.int32)
            mask = np.zeros((1, self.prompt_pad), np.int32)
            row[0, : len(ids)] = ids
            mask[0, : len(ids)] = 1
            row, mask = ensure_trailing_empty_token(row, mask)
            # ensure() grows the row by one; drop the excess column(s) only if
            # they're padding — a prompt that exactly fills prompt_pad would
            # otherwise silently lose the required 29871
            if mask[:, self.prompt_pad :].any():
                raise ValueError(
                    f"prompt for task '{task_label}' needs "
                    f"{int(mask.sum())} tokens (incl. trailing 29871) but "
                    f"prompt_pad={self.prompt_pad}; raise prompt_pad"
                )
            row, mask = row[:, : self.prompt_pad], mask[:, : self.prompt_pad]
            self._prompt_cache[key] = (row, mask)
        return self._prompt_cache[key]

    def get_action(self, image_u8: np.ndarray, task_label: str,
                   draft_tokens=None) -> np.ndarray:
        """image_u8: model-ready uint8 [224, 224, 3] frame (already patched if
        attacking). Returns the unnormalized 7-DoF action. draft_tokens="last"
        Jacobi-drafts with the previous call's tokens (exact greedy; one
        weight stream when the action repeats — the control-loop steady
        state)."""
        if draft_tokens is not None and not isinstance(draft_tokens, str):
            draft_tokens = np.asarray(draft_tokens, np.int32).reshape(1, -1)
        return self.get_action_multi(
            image_u8[None], [task_label], draft_tokens=draft_tokens
        )[0]

    def get_action_batch(self, images_u8: np.ndarray, task_label: str,
                         draft_tokens=None) -> np.ndarray:
        """Batched inference for lockstep multi-environment rollouts:
        images_u8 [N, H, W, 3] uint8 (one frame per live env, already patched)
        -> [N, 7] unnormalized actions from ONE decode call (the serving win
        the reference's bs=1 `generate` path can't express,
        modeling_prismatic.py:325-341). draft_tokens="last": per-env Jacobi
        drafts from the previous lockstep step (rows keep their env across
        steps, so the previous action is the natural draft)."""
        return self.get_action_multi(
            images_u8, [task_label] * len(images_u8), draft_tokens=draft_tokens
        )

    def get_action_multi(
        self,
        images_u8: np.ndarray,
        task_labels: Sequence[str],
        draft_tokens=None,
    ) -> np.ndarray:
        """Mixed-task batched inference: images_u8 [N, H, W, 3] uint8 with a
        task label PER ROW -> [N, 7] unnormalized actions from ONE decode.

        `draft_tokens`: [N, 7] token ids (or the string "last" for the
        previous call's tokens, batch widths permitting) switch the decode
        tail to Jacobi verification passes (models/decode.py) — exact greedy,
        and a correct draft runs the 6-step tail in ONE weight stream. In a
        control loop the previous action IS such a draft; pass "last" from
        the second step on.

        greedy_decode_actions handles per-row prompts natively (right-padded
        ids + per-row true lengths, models/decode.py), so N requests for
        DIFFERENT instructions share one weight-streaming pass — the
        coalescing primitive serving.DynamicBatcher builds on. On TPU the
        7B's decode cost is weight-streaming-bound, so N requests cost ~the
        same wall-clock as one. One compile per distinct N: keep the batch
        width fixed (serving pads to buckets; lockstep eval pads the last
        partial trial group) to avoid minutes-long recompiles."""
        if len(task_labels) != len(images_u8):
            raise ValueError(
                f"{len(images_u8)} images vs {len(task_labels)} task labels"
            )
        frames = []
        for img in images_u8:
            if self.center_crop:
                img = center_crop_resize_tf(img, crop_scale=0.9)
            if img.shape[:2] != (self.cfg.dino.image_size,) * 2:
                img = resize_bicubic_pil(img, self.cfg.dino.image_size)
            frames.append(img)
        pixels = dual_normalize(jnp.asarray(np.stack(frames), jnp.float32) / 255.0)
        pixels = pixels.astype(jnp.dtype(self.cfg.dtype))

        rows = [self._tokenize(t) for t in task_labels]
        ids = jnp.asarray(np.concatenate([r[0] for r in rows], axis=0))
        mask = jnp.asarray(np.concatenate([r[1] for r in rows], axis=0))
        if isinstance(draft_tokens, str):
            if draft_tokens != "last":
                raise ValueError(f"draft_tokens={draft_tokens!r}; use 'last' "
                                 "or an [N, 7] token array")
            # cold start / batch-width change: a ZERO draft, not the plain
            # decode — zeros are bounded by the sequential tail, and a
            # "last"-driven control loop then compiles exactly ONE program
            # (a 7B compile through the relay is minutes)
            draft_tokens = (
                self.last_tokens
                if self.last_tokens is not None
                and self.last_tokens.shape[0] == len(images_u8)
                else np.zeros((len(images_u8), 7), np.int32)
            )
        if draft_tokens is not None:
            res = self._decode_draft(
                self.params, self._place(ids), self._place(mask),
                self._place(pixels),
                self._place(jnp.asarray(draft_tokens, jnp.int32)),
            )
        else:
            res = self._decode(
                self.params, self._place(ids), self._place(mask),
                self._place(pixels)
            )
        # ONE host transfer for everything the caller and the draft loop
        # need — each extra fetch is a full relay round-trip on the serving
        # hot path (~ms against a 131 ms decode)
        tokens, actions, passes = jax.device_get(
            (res.tokens, res.actions, res.verify_passes)
        )
        self.last_verify_passes = None if passes is None else int(passes)
        self.last_tokens = np.asarray(tokens)
        normalized = np.asarray(actions, np.float64)
        return np.stack([
            unnormalize_actions(a, self.norm_stats, self.unnorm_key) for a in normalized
        ])


def load_policy(
    checkpoint: Optional[str],
    model_name: str = "openvla-7b",
    unnorm_key: Optional[str] = None,
    center_crop: bool = False,
    seed: int = 42,
    mesh=None,
    quantize: Optional[str] = None,
    kv_cache: Optional[str] = None,
    visual_tokens: Optional[int] = None,
    int4_kernel: Optional[bool] = None,
) -> VLAPolicy:
    """Build a policy from a local HF checkpoint dir (or random weights for
    smoke tests when checkpoint is None)."""
    _parse_quantize(quantize)  # reject a typo'd mode BEFORE the 15 GB load
    from ..models import get_config, init_vla_params
    from ..models.convert import load_checkpoint_dir, load_norm_stats
    from ..data.rlds import _tokenizer_from_checkpoint

    cfg = get_config(model_name)
    tokenizer = _tokenizer_from_checkpoint(checkpoint)
    if checkpoint:
        params = load_checkpoint_dir(checkpoint, cfg)
        # stay on HOST numpy: VLAPolicy cooks the decode weight layout there
        # (an on-device transpose of the 7B would need 2x HBM); cast host-side
        tgt = np.dtype(cfg.dtype)  # ml_dtypes registers 'bfloat16' with numpy
        params = jax.tree.map(lambda x: np.asarray(x).astype(tgt, copy=False), params)
        norm_stats = load_norm_stats(checkpoint)
    else:
        # random-weights smoke: init on the CPU backend so VLAPolicy can cook
        # the decode layout without needing 2x accelerator HBM (slow for the
        # 7B — minutes of single-core init — but the only path that works at
        # all: the uncooked 7B decode does not compile in 15.75 GB)
        with jax.default_device(jax.devices("cpu")[0]):
            params = init_vla_params(jax.random.key(seed), cfg)
            params = jax.block_until_ready(params)
        norm_stats = {
            "synthetic": {"action": {"q01": [-1.0] * 7, "q99": [1.0] * 7,
                                      "mask": [True] * 6 + [False]}}
        }
        unnorm_key = unnorm_key or "synthetic"
    return VLAPolicy(params, cfg, tokenizer, norm_stats, unnorm_key, center_crop,
                     mesh=mesh, quantize=quantize, kv_cache=kv_cache,
                     visual_tokens=visual_tokens, int4_kernel=int4_kernel)


# --- reference dispatch shims (experiments/robot/robot_utils.py:40-74) --------

def get_model(cfg_or_checkpoint, model_family: str = "openvla", **kwargs) -> VLAPolicy:
    """`get_model` equivalent: accepts a checkpoint path (or config object with
    .pretrained_checkpoint) and returns a loaded policy."""
    checkpoint = getattr(cfg_or_checkpoint, "pretrained_checkpoint", cfg_or_checkpoint)
    assert model_family == "openvla", f"unsupported model family {model_family}"
    return load_policy(checkpoint, **kwargs)


def get_action(policy: VLAPolicy, obs: Dict, task_label: str,
               model_family: str = "openvla") -> np.ndarray:
    """`get_action` equivalent: obs dict with 'full_image' -> 7-DoF action."""
    assert model_family == "openvla", f"unsupported model family {model_family}"
    return policy.get_action(obs["full_image"], task_label)


def set_seed_everywhere(seed: int) -> None:
    """robot_utils.py:29-37 equivalent; JAX randomness is key-threaded, so only
    host-side RNGs need seeding."""
    import random

    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
