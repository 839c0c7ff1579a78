"""VLA finetuning trainer: the TPU-native equivalent of the reference's
`TrainingStrategy` hierarchy (prismatic/training/strategies/, SURVEY.md §2.5).

The torch strategy zoo (DDPStrategy / FSDPStrategy with hybrid-shard variants,
auto-wrap policies, CPU-offloaded full-state-dict saves) collapses into ONE
jitted train step + a sharding choice, because on TPU the parallelism is a
data layout, not a wrapper class:

  strategy "ddp"       -> params replicated, batch sharded on 'data'
                          (XLA inserts the gradient all-reduce)
  strategy "fsdp"      -> params AND optimizer state sharded on 'data'
                          (ZeRO-3 style; XLA inserts all-gather/reduce-scatter)
  grad checkpointing   -> cfg.remat (jax.checkpoint per block)
  mixed precision      -> bf16 params + fp32 optimizer state (optax)
  grad accumulation    -> optax.MultiSteps, matching `grad_accumulation_steps`

Freeze flags mirror the reference's stage contract (base_strategy.py /
conf/vla.py): full finetune, or freeze vision / freeze LLM subsets.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..attacks.engine import AttackBatch
from ..models.config import VLAConfig
from ..models.vlm import vla_forward
from ..parallel.mesh import batch_sharding, make_mesh, replicated
from ..utils.normalization import dual_normalize
from .metrics import VLAMetrics


@dataclass
class TrainConfig:
    """conf/vla.py:21-57 equivalent (the knobs the VLA trainer exposes)."""

    strategy: str = "fsdp"           # ddp | fsdp
    learning_rate: float = 2e-5
    weight_decay: float = 0.0
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.0
    max_steps: int = 1000
    grad_accumulation_steps: int = 1
    freeze_vision_backbone: bool = False
    freeze_llm_backbone: bool = False
    seed: int = 7


def trainable_mask(params: Dict, cfg: TrainConfig) -> Dict:
    """Pytree of bools: which leaves receive updates (freeze-stage contract)."""
    def mask_subtree(tree, flag):
        return jax.tree.map(lambda _: flag, tree)

    return {
        "vision": mask_subtree(params["vision"], not cfg.freeze_vision_backbone),
        "projector": mask_subtree(params["projector"], True),
        "llm": mask_subtree(params["llm"], not cfg.freeze_llm_backbone),
    }


def make_optimizer(cfg: TrainConfig, params: Dict) -> optax.GradientTransformation:
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=cfg.learning_rate,
        warmup_steps=max(1, int(cfg.warmup_ratio * cfg.max_steps)),
        decay_steps=cfg.max_steps,
    )
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(schedule, weight_decay=cfg.weight_decay, eps=1e-8,
                    mu_dtype=jnp.float32),
    )
    # frozen leaves get zero updates (optax.masked would pass raw grads through)
    labels = jax.tree.map(
        lambda trainable: "train" if trainable else "freeze",
        trainable_mask(params, cfg),
    )
    tx = optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)
    if cfg.grad_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.grad_accumulation_steps)
    return tx


def fsdp_shardings(params: Dict, mesh) -> Dict:
    """ZeRO-3-style layout: shard every weight's LARGEST dim over 'data' when
    divisible; small leaves stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = mesh.shape["data"]

    def spec(x):
        if x.ndim == 0:
            return NamedSharding(mesh, P())
        dims = list(np.argsort(x.shape)[::-1])
        for d in dims:
            if x.shape[d] % n == 0 and x.shape[d] >= n:
                parts = [None] * x.ndim
                parts[d] = "data"
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


class VLATrainer:
    """run_vla_training equivalent (base_strategy.py:106+): next-token CE over
    action tokens through the full multimodal model."""

    def __init__(
        self,
        params: Dict,
        model_cfg: VLAConfig,
        train_cfg: TrainConfig,
        mesh=None,
        metrics: Optional[VLAMetrics] = None,
    ) -> None:
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.mesh = mesh if mesh is not None else make_mesh(model=1)
        self.metrics = metrics

        if train_cfg.strategy == "fsdp":
            self.param_sharding = fsdp_shardings(params, self.mesh)
        elif train_cfg.strategy == "ddp":
            self.param_sharding = jax.tree.map(
                lambda _: replicated(self.mesh), params
            )
        else:
            raise ValueError(f"unknown strategy {train_cfg.strategy}")
        self.params = jax.tree.map(jax.device_put, params, self.param_sharding)

        self.tx = make_optimizer(train_cfg, params)
        opt_state = self.tx.init(self.params)
        # optimizer state inherits the param sharding layout via jit placement
        self.opt_state = opt_state

        mcfg = self.model_cfg

        def train_step(params, opt_state, batch: AttackBatch):
            def loss_fn(p):
                pixels = dual_normalize(batch.images).astype(jnp.dtype(mcfg.dtype))
                out = vla_forward(
                    p, mcfg, batch.input_ids, batch.attention_mask, pixels, batch.labels
                )
                return out.loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(train_step, donate_argnums=(0, 1))
        self._bs = batch_sharding(self.mesh)

    def run_training(self, batches: Iterator[AttackBatch], num_steps: Optional[int] = None):
        steps = num_steps or self.cfg.max_steps
        last_loss = None
        for i in range(steps):
            batch = next(batches)
            batch = jax.tree.map(lambda x: jax.device_put(np.asarray(x), self._bs), batch)
            self.params, self.opt_state, loss = self._step(self.params, self.opt_state, batch)
            last_loss = float(loss)
            if self.metrics is not None:
                self.metrics.commit(loss=last_loss, update_step_time=True)
                self.metrics.push()
        return last_loss
