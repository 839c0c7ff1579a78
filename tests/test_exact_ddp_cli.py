"""--ddp_semantics exact: the attacker runner drives the shard_map
average-of-rank-gradients step end-to-end, and on uniform shards its metrics
stay in the same regime as the default GSPMD step (UADA_ddp.py protocol:
eval cadence 200, AVG-reduced metrics, no +1/CE)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.attacks import AttackConfig
from roboticattack_tpu.attacks.attacker import OpenVLAAttacker
from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.parallel import make_mesh
from roboticattack_tpu.utils import WordStubTokenizer


def _data(bs, seed=0):
    return batch_iterator(
        dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=seed),
        bs, pad_to=48,
    )


def _run(tmp_path, semantics, mesh):
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    cfg = AttackConfig(
        objective="uada", maskidx=[0, 1, 2, 3, 4, 5, 6], lr=1e-2, num_iter=3,
        batch_size=8, warmup=0, inner_loop=1, geometry=False,
        add_inverse_ce=False, eval_every=2, eval_batches=1,
        patch_size=(3, 10, 10), ddp_semantics=semantics,
    )
    runner = OpenVLAAttacker(
        params, VLA_TINY, str(tmp_path / semantics), cfg, mesh=mesh
    )
    result = runner.run(_data(8), _data(8, seed=1))
    return result, runner


def test_exact_ddp_runs_and_matches_gspmd_regime(tmp_path):
    mesh = make_mesh(data=8, model=1)
    res_exact, _ = _run(tmp_path, "exact", mesh)
    res_gspmd, _ = _run(tmp_path, "gspmd", mesh)
    assert np.isfinite(res_exact.best_metric)
    # uniform shards: exact (avg-of-rank-grads) and gspmd (global-mean grads)
    # optimize the same objective; metrics agree to a few percent
    assert abs(res_exact.best_metric - res_gspmd.best_metric) / abs(res_gspmd.best_metric) < 0.05


def test_exact_ddp_requires_mesh(tmp_path):
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    cfg = AttackConfig(objective="uada", ddp_semantics="exact")
    with pytest.raises(ValueError, match="data mesh"):
        OpenVLAAttacker(params, VLA_TINY, str(tmp_path), cfg, mesh=None)


def test_cli_flag_maps_to_exact(tmp_path):
    from roboticattack_tpu.cli.attack import build_parser

    args = build_parser().parse_args(
        ["--attack", "uada", "--data_parallel", "true", "--ddp_semantics", "exact"]
    )
    assert args.ddp_semantics == "exact" and args.data_parallel


def test_skip_rate_reported_to_tracker(tmp_path):
    """data_counters flow into run-metrics.jsonl at the eval cadence."""
    import json

    params = init_vla_params(jax.random.key(0), VLA_TINY)
    cfg = AttackConfig(
        objective="tma", maskidx=[0], lr=1e-2, num_iter=2, batch_size=2,
        warmup=0, inner_loop=1, geometry=False, eval_every=1, eval_batches=1,
        patch_size=(3, 8, 8),
    )
    counters = {"frames_seen": 100, "frames_skipped_pad_to": 25}
    runner = OpenVLAAttacker(params, VLA_TINY, str(tmp_path), cfg,
                             data_counters=counters)
    runner.run(_data(2), _data(2, seed=1))
    lines = [json.loads(l) for l in
             open(tmp_path / "run-metrics.jsonl").read().splitlines()]
    rates = [l["DATA_pad_to_skip_rate"] for l in lines if "DATA_pad_to_skip_rate" in l]
    assert rates and abs(rates[0] - 0.25) < 1e-9
