"""Offline resume-equivalence: the soak's checks (BASELINE.md:55-61) as a
fast regression test — attack-state round-trip bit-exactness, LR-schedule
continuity across a resume, history-length coherence, and clean completion of
a fully-complete resume (reference has no optimizer-state resume at all;
SURVEY.md §5 checkpoint/resume contract)."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from roboticattack_tpu.attacks import AttackConfig
from roboticattack_tpu.attacks.attacker import OpenVLAAttacker
from roboticattack_tpu.attacks.optimizer import cosine_schedule_with_warmup
from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.utils import WordStubTokenizer


def _data(bs=2, seed=0):
    return batch_iterator(
        dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=seed),
        bs, pad_to=48,
    )


def _cfg(num_iter, eval_every=2):
    return AttackConfig(
        objective="tma", maskidx=[0], lr=1e-2, num_iter=num_iter, batch_size=2,
        warmup=2, inner_loop=1, geometry=False, eval_every=eval_every,
        eval_batches=1, patch_size=(3, 8, 8),
    )


def _params():
    return init_vla_params(jax.random.key(0), VLA_TINY)


def test_state_roundtrip_bit_exact(tmp_path):
    params = _params()
    cfg = _cfg(num_iter=3, eval_every=1)
    a = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "a"), cfg)
    a.run(_data(), _data(seed=1))

    b = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "b"), cfg)
    state, start_iter = b.load_state(str(tmp_path / "a"))
    assert start_iter == 3  # saved after completing iter 2; resume at the next

    # re-save from the restored runner and reload: byte-identical round-trip
    b.save_state(state, start_iter - 1)
    c = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "c"), cfg)
    state2, start2 = c.load_state(str(tmp_path / "b"))
    assert start2 == start_iter
    for got, want in zip(jax.tree.leaves(state2), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert c.best == b.best == a.best
    assert {k: v for k, v in c.histories.items()} == b.histories


def test_resume_continues_schedule_and_history(tmp_path):
    params = _params()
    cfg = _cfg(num_iter=6, eval_every=2)  # saves at i=0,2,4 -> resume at 5
    a = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "a"), cfg)
    a.run(_data(), _data(seed=1))

    b = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "b"), cfg)
    res = b.run(_data(), _data(seed=1), resume_from=str(tmp_path / "a"))

    # LR continuity: the resumed run's first step logs the schedule value at
    # global step 5, not a restart from 0 (the soak's core check)
    lines = [json.loads(l) for l in
             open(tmp_path / "b" / "run-metrics.jsonl").read().splitlines()]
    lrs = {l["step"]: l["TRAIN_LR"] for l in lines if "TRAIN_LR" in l}
    assert list(lrs) == [5]
    want_lr = cosine_schedule_with_warmup(5, cfg.lr, cfg.warmup, cfg.num_iter)
    assert abs(lrs[5] - want_lr) < 1e-12

    # history coherence: 5 restored entries (iters 0-4) + 1 new = 6
    assert len(b.histories["train_CE_loss"]) == 6
    # the restored prefix is bit-identical to the original run's history
    np.testing.assert_array_equal(
        np.asarray(a.histories["train_CE_loss"][:5]),
        np.asarray(b.histories["train_CE_loss"][:5]),
    )
    assert np.isfinite(res.best_metric)


def test_fully_complete_resume_finishes_cleanly(tmp_path):
    """start_iter >= num_iter with an EXHAUSTED finite iterator must complete
    (no StopIteration from an eager batch fetch) and emit the saved patch."""
    params = _params()
    cfg = _cfg(num_iter=2, eval_every=1)  # saves at i=0,1 -> resume at 2
    a = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "a"), cfg)
    res_a = a.run(_data(), _data(seed=1))

    b = OpenVLAAttacker(params, VLA_TINY, str(tmp_path / "b"), cfg)
    res_b = b.run(iter([]), iter([]), resume_from=str(tmp_path / "a"))
    np.testing.assert_array_equal(res_b.patch, res_a.patch)
    assert len(b.histories["train_CE_loss"]) == 2  # restored, nothing appended
