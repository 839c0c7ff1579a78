"""Host-side attack runner: the orchestration layer around the fused step.

Capability-equivalent to the reference `OpenVLAAttacker` classes
(TMA.py:28-483, UADA.py, UPA.py), restructured for TPU: the host loop only
feeds batches, advances the LR schedule, gates grad-accumulation boundaries,
and handles artifacts — all compute (inner loop included) lives in the jitted
step. Data parallelism is a constructor argument (a Mesh), not a separate
`_ddp` subclass: the same runner shards batches over the 'data' axis and XLA
supplies the gradient all-reduce (replacing UADA_ddp.py's DDP machinery).

Aggregation note: the reference divides sums of per-*batch* mean metrics by
the number of *examples* (e.g. TMA.py:315-316) — a scaling quirk that only
rescales logged values and never changes which checkpoint wins. We aggregate
per-example metrics properly (mean over selected examples); checkpoint
selection criteria are unchanged (TMA: val L1, UADA: val MSE-distance,
UPA: val reverse loss).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.prefetch import host_prefetch
from ..models.config import VLAConfig
from ..parallel.mesh import process_zero, replicate, shard_batch
from ..utils.constants import ACTION_DIM
from ..utils.labels import build_tma_target_tokens
from ..utils.profiling import StepTimer, maybe_trace
from ..utils.tracking import Tracker
from .artifacts import plot_loss_curve, save_checkpoint, save_history_pickles
from .engine import (
    AttackBatch,
    AttackSpec,
    AttackState,
    init_attack_state,
    make_attack_step,
    make_clean_filter_step,
    make_val_step,
)
from .optimizer import cosine_schedule_with_warmup


def filter_gripper_open(batch: AttackBatch, rng: np.random.Generator) -> AttackBatch:
    """--filterGripTrainTo1 (TMA.py:422-452): train only on gripper-open
    examples. The reference shrinks the batch (1<n<8 keeps n rows; n>8 samples
    8; otherwise unchanged); we keep static shapes by resampling the open rows
    up to the full batch size — same training distribution, no retraces."""
    from ..utils.labels import gripper_open_rows

    open_rows = np.asarray(gripper_open_rows(jnp.asarray(batch.labels)))
    idx = np.nonzero(open_rows)[0]
    if idx.size <= 1:  # mirror the reference's fall-through (incl. its n==0 quirk)
        return batch
    chosen = rng.choice(idx, size=batch.labels.shape[0], replace=True)
    return AttackBatch(*(np.asarray(a)[chosen] for a in batch))


@dataclass
class AttackConfig:
    """The reference CLI flag surface (TMA_wrapper.py:88-110 + UADA/UPA extras)."""

    objective: str = "tma"                 # tma | uada | upa | upa_guide | upa_negce
    maskidx: Sequence[int] = (0,)
    lr: float = 2e-3
    num_iter: int = 2000
    accumulate_steps: int = 1
    batch_size: int = 8
    warmup: int = 20
    filter_grip_train_to_1: bool = False
    geometry: bool = True
    patch_size: Sequence[int] = (3, 50, 50)   # reference CHW order
    inner_loop: int = 50
    resize_patch: bool = False
    target_action: float = 0.0                # TMA: target = targetAction * ones(7)
    optimizer: str = "adamW"
    mse_weight: float = 5.0                   # UADA / --MSE_weights
    add_inverse_ce: bool = True               # UADA single-device +1/CE term
    upa_alpha: float = 0.8
    upa_beta: float = 0.2
    eval_every: int = 100
    eval_batches: int = 100                   # 1000 for UADA (UADA.py:202)
    seed: int = 42
    # gradient-sync semantics under a data mesh:
    #   'gspmd' — global-mean loss, XLA inserts collectives (default path)
    #   'exact' — average-of-per-rank-gradients via shard_map, byte-matching
    #             torch DDP's bucket all-reduce (UADA_ddp.py:144-221); the
    #             reference's rank-MAX on the logged patch grad is a no-op
    #             (DDP syncs .grad before the log), so grad_mean needs no
    #             extra reduction
    ddp_semantics: str = "gspmd"

    @property
    def patch_hw(self):
        c, h, w = self.patch_size
        assert c == 3, f"patch_size is CHW like the reference; got {self.patch_size}"
        return (h, w)

    def spec(self) -> AttackSpec:
        return AttackSpec(
            objective=self.objective,
            geometry=self.geometry,
            resize_patch=self.resize_patch,
            inner_loop=self.inner_loop,
            accumulate_steps=self.accumulate_steps,
            optimizer=self.optimizer,
            pgd_alpha=self.lr,
            mse_weight=self.mse_weight,
            add_inverse_ce=self.add_inverse_ce,
            upa_alpha=self.upa_alpha,
            upa_beta=self.upa_beta,
            # UPA.py:155-158: the L1 clip sits in the shared adamW branch and
            # applies to guide / negce variants as well
            grad_clip_l1=(
                1e-3
                if self.objective.startswith("upa") and self.optimizer == "adamW"
                else None
            ),
        )


@dataclass
class AttackResult:
    patch: np.ndarray                      # [H, W, 3] float32
    best_metric: float
    histories: Dict[str, List[float]] = field(default_factory=dict)


# objective -> (val metric key, sign) where sign=+1 minimizes, -1 maximizes
_BEST_KEY = {
    "tma": ("val_l1", 1.0),
    "uada": ("val_mse_distance", 1.0),
    "upa": ("val_loss", 1.0),
    "upa_guide": ("val_ce", 1.0),
    "upa_negce": ("val_ce", -1.0),  # negce maximizes CE: best = highest val CE
}


class OpenVLAAttacker:
    def __init__(
        self,
        params,
        cfg: VLAConfig,
        save_dir: str,
        attack: AttackConfig,
        mesh=None,
        tracker: Optional[Tracker] = None,
        data_counters: Optional[Dict] = None,
    ) -> None:
        self.cfg = cfg
        self.attack = attack
        self.save_dir = save_dir
        self.mesh = mesh
        self.tracker = tracker or Tracker(save_dir, quiet=False)
        # live skip-rate counters from the data pipeline (rlds.py
        # frames_to_attack_batches); reported at every eval cadence so a
        # long-instruction dataset being filtered by pad_to is visible
        self.data_counters = data_counters
        os.makedirs(save_dir, exist_ok=True)

        target = None
        if attack.objective == "tma":
            target = build_tma_target_tokens(
                attack.target_action * np.ones(ACTION_DIM), attack.maskidx
            )
        self._target = target
        spec = attack.spec()
        if attack.ddp_semantics == "exact":
            if mesh is None:
                raise ValueError("ddp_semantics='exact' needs a data mesh "
                                 "(--data_parallel true)")
            from .ddp import make_ddp_attack_step

            exact = make_ddp_attack_step(spec, cfg, target, attack.maskidx, mesh)

            # exact DDP has no accumulation (guarded inside), so apply_update
            # is always True — adapt to the (params, state, batch, lr,
            # apply_update, rng) calling convention of the default step
            def step(params, state, batch, lr, apply_update, rng):
                del apply_update
                return exact(params, state, batch, lr, rng)

            self._step = step
        else:
            self._step = make_attack_step(spec, cfg, target, attack.maskidx)
        self._val = make_val_step(spec, cfg, target, attack.maskidx)
        # the maskidx==[6] clean-image pre-filter runs as its OWN program —
        # fused into the val it pushes the 7B compile over HBM (engine.py note)
        self._clean_val = (
            make_clean_filter_step(cfg)
            if list(attack.maskidx) == [6] else None
        )

        self.params = replicate(params, mesh) if mesh is not None else params
        self.histories: Dict[str, List[float]] = {}
        self.best = float("inf")

    def _record(self, name: str, value: float) -> None:
        self.histories.setdefault(name, []).append(float(value))

    def _place(self, batch: AttackBatch) -> AttackBatch:
        return shard_batch(batch, self.mesh) if self.mesh is not None else batch

    def save_state(self, state: AttackState, iteration: int) -> None:
        """Full resumable attack state (patch + AdamW moments + grad buffer) —
        the reference has no optimizer-state resume (SURVEY.md §5); we do."""
        from ..training.checkpointing import save_checkpoint as orbax_save

        host_state = jax.device_get(state)
        payload = dict(
            host_state._asdict(),
            _best=np.float64(self.best),
            _histories={k: np.asarray(v, np.float64) for k, v in self.histories.items()},
        )
        orbax_save(
            os.path.join(self.save_dir, "attack_state"), step=iteration,
            params=payload, keep_latest_copy=True,
        )

    def load_state(self, resume_dir: str) -> tuple:
        from ..training.checkpointing import latest_checkpoint, restore_checkpoint

        path = latest_checkpoint(os.path.join(resume_dir, "attack_state"))
        if path is None:
            raise FileNotFoundError(f"no attack_state checkpoints under {resume_dir}")
        payload = restore_checkpoint(path)["params"]
        import re

        step = int(re.search(r"step-(\d+)", os.path.basename(path)).group(1))
        from .optimizer import AdamState

        state = AttackState(
            patch=jnp.asarray(payload["patch"]),
            opt=AdamState(*[jnp.asarray(payload["opt"][k]) for k in ("m", "v", "count")]),
            grad_acc=jnp.asarray(payload["grad_acc"]),
        )
        if "_best" in payload:
            self.best = float(payload["_best"])
        for k, v in payload.get("_histories", {}).items():
            self.histories[k] = list(np.asarray(v))
        # the state was saved AFTER completing `step`; resume at the next one
        return state, step + 1

    def run(
        self,
        train_batches: Iterator[AttackBatch],
        val_batches: Iterator[AttackBatch],
        profile_dir: Optional[str] = None,
        profile_steps: int = 3,
        resume_from: Optional[str] = None,
    ) -> AttackResult:
        a = self.attack
        timer = StepTimer()
        rng_np = np.random.default_rng(a.seed)
        start_iter = 0
        if resume_from is not None:
            state, start_iter = self.load_state(resume_from)
            print(f"resumed attack state from {resume_from} at iter {start_iter}")
        else:
            state = init_attack_state(jax.random.key(a.seed), a.patch_hw)
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        sched_total = int(a.num_iter / a.accumulate_steps)
        grip_filter = (
            a.filter_grip_train_to_1 and len(a.maskidx) == 1 and a.maskidx[0] == 6
        )

        # NOTE on data/prefetch.py: device_prefetch (device_put on a daemon
        # thread) deadlocks through the axon TPU relay after the first step
        # (concurrent device_put vs the main thread's execution RPCs —
        # measured round 2). host_prefetch sidesteps it: the daemon thread
        # assembles numpy batches only (tf.data + tokenize + pad, the actual
        # ~0.1 s of host work), and the main thread keeps doing its own cheap
        # device transfer — relay-safe because all jax calls stay here.
        train_batches = host_prefetch(train_batches, depth=2)

        def next_placed():
            nb = next(train_batches)
            if grip_filter:
                nb = filter_gripper_open(nb, rng_np)
            return self._place(nb)

        # guard the initial fetch: a fully-complete resume (start_iter >=
        # num_iter) must finish cleanly, not raise StopIteration on an
        # exhausted iterator (or waste a batch of an infinite one)
        if start_iter < a.num_iter:
            staged = next_placed()
        for i in range(start_iter, a.num_iter):
            batch = staged

            lr = cosine_schedule_with_warmup(i // a.accumulate_steps, a.lr, a.warmup, sched_total)
            apply_update = (i + 1) % a.accumulate_steps == 0
            trace_now = profile_dir is not None and i == 1  # skip compile step
            with maybe_trace(profile_dir if trace_now else None):
                with timer:
                    state, metrics = self._step(
                        self.params, state, batch,
                        jnp.float32(lr), jnp.bool_(apply_update),
                        jax.random.key(a.seed * 1000003 + i),
                    )
                    # stage the NEXT batch's device transfer while the step
                    # executes: dispatch above is async, and keeping the
                    # device_put on THIS thread avoids the round-2 relay
                    # deadlock that a transfer thread (device_prefetch) hits
                    if i + 1 < a.num_iter:
                        staged = next_placed()
                    jax.block_until_ready(state.patch)

            last = {k: float(np.asarray(v)[-1]) for k, v in metrics.items() if not k.startswith("ex_")}
            mean_loss = float(np.asarray(metrics["loss"]).mean())
            self._record("train_CE_loss", last.get("ce", last["loss"]))
            self._record("train_inner_avg_loss", mean_loss)
            log = {f"TRAIN_{k}": v for k, v in last.items()}
            log["TRAIN_LR"] = lr
            log["TRAIN_inner_avg_loss"] = mean_loss
            self.tracker.log(log, step=i)

            if i % a.eval_every == 0:
                if self.data_counters and self.data_counters.get("frames_seen"):
                    seen = self.data_counters["frames_seen"]
                    skipped = self.data_counters.get("frames_skipped_pad_to", 0)
                    self.tracker.log(
                        {"DATA_frames_seen": seen,
                         "DATA_frames_skipped_pad_to": skipped,
                         "DATA_pad_to_skip_rate": skipped / seen},
                        step=i,
                    )
                self._validate(state, val_batches, i)
                if process_zero():
                    self.save_state(state, i)

        patch = np.asarray(jax.device_get(state.patch))
        save_checkpoint(self.save_dir, "final", patch)
        save_history_pickles(self.save_dir, self.histories)
        summary = timer.summary()
        if summary:
            self.tracker.log({f"TIMING_{k}": v for k, v in summary.items()},
                             step=a.num_iter)
        return AttackResult(patch=patch, best_metric=self.best, histories=self.histories)

    def _validate(self, state: AttackState, val_batches: Iterator[AttackBatch], step: int) -> None:
        a = self.attack
        is_grip_target = len(a.maskidx) == 1 and a.maskidx[0] == 6
        sums: Dict[str, float] = {}
        count = 0.0
        batch_loss_sum, batch_count = 0.0, 0
        grip = {k: 0.0 for k in (
            "zero_flipped", "zero_total", "one_flipped", "one_total",
            "other_to_zero", "other_total",
        )}
        adv_images = None
        from ..utils.constants import ACTION_TOKEN_MIN, ACTION_TOKEN_ZERO

        for j in range(a.eval_batches):
            batch = self._place(next(val_batches))
            m = self._val(
                self.params, state.patch, batch, jax.random.key(a.seed * 7 + step * 131 + j)
            )
            if self._clean_val is not None:
                m["clean_gripper_correct"] = self._clean_val(self.params, batch)
            # keep the (large) patched images on device; fetch only the last batch
            patched_dev = m.pop("_patched_images")
            m = jax.device_get(m)
            # example selector: the clean-gripper-correct filter for maskidx=[6]
            # (TMA.py:223-250), else all examples
            sel = (
                np.asarray(m["clean_gripper_correct"])
                if (a.objective == "tma" and is_grip_target)
                else np.ones(batch.images.shape[0], bool)
            )
            n = float(sel.sum())
            if n == 0:
                continue
            count += n
            for k, v in m.items():
                if k.startswith("ex_"):
                    sums[k[3:]] = sums.get(k[3:], 0.0) + float(np.asarray(v)[sel].sum())
            batch_loss_sum += float(np.asarray(m["loss"]))
            batch_count += 1
            # gripper flip counts over the SELECTED examples only, classified
            # by the original gripper label (calculate_01_ASR semantics)
            gp = np.asarray(m["gripper_pred_token"])[sel]
            gg = np.asarray(m["gripper_gt_token"])[sel]
            is_zero, is_one = gg == ACTION_TOKEN_ZERO, gg == ACTION_TOKEN_MIN
            is_other = ~is_zero & ~is_one
            grip["zero_total"] += float(is_zero.sum())
            grip["zero_flipped"] += float((is_zero & (gp != ACTION_TOKEN_ZERO)).sum())
            grip["one_total"] += float(is_one.sum())
            grip["one_flipped"] += float((is_one & (gp != ACTION_TOKEN_MIN)).sum())
            grip["other_total"] += float(is_other.sum())
            grip["other_to_zero"] += float((is_other & (gp == ACTION_TOKEN_ZERO)).sum())
            if j == a.eval_batches - 1:
                adv_images = np.asarray(jax.device_get(patched_dev))
        if count == 0:
            return
        avg = {f"val_{k}": v / count for k, v in sums.items()}
        # UPA's reverse loss is BATCH-level (1/(mean dist) per batch, then
        # averaged over batches, UPA.py:230-238) — recomposing it from
        # example averages would introduce a Jensen gap on the 1/x term
        if a.objective == "upa" and batch_count:
            avg["val_loss"] = batch_loss_sum / batch_count
        if is_grip_target:
            for num, den, name in (
                ("zero_flipped", "zero_total", "ASR_02other"),
                ("one_flipped", "one_total", "ASR_12other"),
                ("other_to_zero", "other_total", "ASR_other20"),
            ):
                avg[name] = grip[num] / grip[den] if grip[den] else 0.0
            tot = grip["zero_total"] + grip["one_total"]
            avg["ALL_ASR_6"] = (
                (grip["zero_flipped"] + grip["one_flipped"]) / tot if tot else 0.0
            )

        self.tracker.log({f"VAL_{k}": v for k, v in avg.items()}, step=step)
        for k, v in avg.items():
            self._record(k, v)

        best_key, best_sign = _BEST_KEY[a.objective]
        patch = np.asarray(jax.device_get(state.patch))
        if best_key in avg and best_sign * avg[best_key] < self.best:
            self.best = best_sign * avg[best_key]
            if process_zero():
                save_checkpoint(self.save_dir, str(step), patch, adv_images=adv_images)
        if process_zero():
            save_checkpoint(self.save_dir, "last", patch, adv_images=adv_images)
            plot_loss_curve(self.histories.get("train_CE_loss", []), self.save_dir)
            save_history_pickles(self.save_dir, self.histories)
