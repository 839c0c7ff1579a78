"""Drive the full eval_libero rollout loop with mocked LIBERO modules:
exercises settle steps, frame extraction + patch paste, the gripper sign
chain, success accounting, and the txt logging — without the sim stack."""

import os
import sys
import types

import numpy as np
import pytest

from roboticattack_tpu.attacks.artifacts import save_patch_pt
from roboticattack_tpu.eval.libero import LiberoEvalConfig, eval_libero
from roboticattack_tpu.eval.policy import load_policy


class FakeTask:
    problem_folder = "fake"
    bddl_file = "fake.bddl"
    language = "press the big red button"
    name = "fake_task"


class FakeSuite:
    n_tasks = 2

    def get_task(self, i):
        return FakeTask()

    def get_task_init_states(self, i):
        return [np.zeros(4), np.ones(4)]


class FakeEnv:
    """Succeeds an episode once it has taken 5 post-settle steps whose gripper
    command is valid (-1/+1) — checks the action post-processing chain."""

    def __init__(self, *a, **k):
        self.t = 0
        self.actions = []

    def seed(self, s):
        pass

    def reset(self):
        self.t = 0
        self.actions = []

    def set_init_state(self, st):
        return self._obs()

    def _obs(self):
        rng = np.random.default_rng(self.t)
        return {"agentview_image": rng.integers(0, 255, (256, 256, 3), dtype=np.uint8)}

    def step(self, action):
        self.t += 1
        self.actions.append(np.asarray(action, np.float64))
        real_steps = [a for a in self.actions if np.any(a != [0, 0, 0, 0, 0, 0, -1])]
        done = len(real_steps) >= 5
        return self._obs(), 0.0, done, {}

    def close(self):
        pass


@pytest.fixture()
def fake_libero(monkeypatch):
    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    bench_mod = types.ModuleType("libero.libero.benchmark")
    envs_mod = types.ModuleType("libero.libero.envs")

    bench_mod.get_benchmark_dict = lambda: {"libero_spatial": FakeSuite}
    envs_mod.OffScreenRenderEnv = FakeEnv
    libero_sub.get_libero_path = lambda kind: "/tmp/fake_bddl"
    libero_sub.benchmark = bench_mod
    libero_sub.envs = envs_mod
    libero_pkg.libero = libero_sub

    for name, mod in [
        ("libero", libero_pkg), ("libero.libero", libero_sub),
        ("libero.libero.benchmark", bench_mod), ("libero.libero.envs", envs_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    yield


def test_eval_libero_rollout_with_patch(fake_libero, tmp_path):
    patch = np.random.default_rng(0).uniform(0, 1, (20, 20, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)

    policy = load_policy(None, model_name="vla-tiny")
    cfg = LiberoEvalConfig(
        task_suite_name="libero_spatial",
        num_trials_per_task=2,
        patchroot=patch_path,
        x=120, y=160,
        output_dir=str(tmp_path / "logs"),
    )
    successes, episodes = eval_libero(cfg, policy)
    assert episodes == 4  # 2 tasks x 2 trials
    assert successes == 4  # FakeEnv succeeds every episode

    # suite summary line written (run_libero_eval_args_geo_batch.py:296-298)
    summary = open(tmp_path / "logs" / "libero_spatial.txt").read()
    assert "success_rate=1.0000" in summary and "pos=(120,160)" in summary
    log_files = os.listdir(tmp_path / "logs")
    assert any(f.startswith("EVAL-libero_spatial") for f in log_files)


def test_eval_libero_clean_uses_clean_max_steps(fake_libero, tmp_path):
    policy = load_policy(None, model_name="vla-tiny")
    cfg = LiberoEvalConfig(
        task_suite_name="libero_spatial", num_trials_per_task=1,
        patchroot=None, output_dir=str(tmp_path / "logs2"),
    )
    successes, episodes = eval_libero(cfg, policy)
    assert episodes == 2 and successes == 2
