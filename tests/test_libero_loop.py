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

    # suite summary line BYTE-matches the reference's
    # (run_libero_eval_args_geo_batch.py:297-298, incl. trailing space)
    summary = open(tmp_path / "logs" / "libero_spatial.txt").read()
    assert summary == (
        "success_rate/total:1.0, num_episodes/total:4 "
        "position_info:0.0_0.0_0.0_120_160 \n"
    ), repr(summary)
    # episode log uses the reference's run-id marker filename (int-formatted
    # note, the queue's x_y_angle_shx_shy string)
    assert os.path.exists(tmp_path / "logs" / "EVAL-libero_spatial--120_160_0_0_0.txt")


def test_eval_libero_rollout_quantized_policy(fake_libero, tmp_path):
    """The int8 weight-only serving policy (models/quant.py — the single-chip
    bs>=8 lever) drives the same closed loop end-to-end."""
    policy = load_policy(None, model_name="vla-tiny", quantize="int8")
    cfg = LiberoEvalConfig(
        task_suite_name="libero_spatial", num_trials_per_task=1,
        patchroot=None, output_dir=str(tmp_path / "logs_q"),
        batch_trials=2,
    )
    successes, episodes = eval_libero(cfg, policy)
    assert episodes == 2 and successes == 2


def test_eval_libero_clean_uses_clean_max_steps(fake_libero, tmp_path):
    policy = load_policy(None, model_name="vla-tiny")
    cfg = LiberoEvalConfig(
        task_suite_name="libero_spatial", num_trials_per_task=1,
        patchroot=None, output_dir=str(tmp_path / "logs2"),
    )
    successes, episodes = eval_libero(cfg, policy)
    assert episodes == 2 and successes == 2


# --- golden-episode replay (VERDICT r2 item 7) ---------------------------------
#
# Until LIBERO/robosuite installs, replace env.step's observation source with a
# RECORDED frame sequence and drive the REAL policy + patch paste + gripper
# chain + success accounting for a full episode per suite. This removes
# everything except robosuite itself from the untested set of the closed loop
# (reference loop: run_libero_eval_args_geo_batch.py:158-298).

GOLDEN_T = 12  # post-settle steps per golden episode


_SUITE_SEEDS = {"libero_spatial": 101, "libero_object": 202,
                "libero_goal": 303, "libero_10": 404}


def _golden_frames(suite, n=64):
    """The recorded observation sequence: deterministic per suite. Seeded from
    a FIXED table — Python's str hash is randomized per process, so hash()
    seeding would re-roll the 'recording' every pytest invocation."""
    rng = np.random.default_rng(_SUITE_SEEDS[suite])
    return [rng.integers(0, 255, (256, 256, 3), dtype=np.uint8) for _ in range(n)]


class ReplayEnv:
    """Serves the recorded frames in order; succeeds after GOLDEN_T real
    (post-settle) steps unless `never_done`. Records every action it is
    stepped with so tests can assert on the command chain."""

    frames = None           # set per-test via class attribute
    never_done = False
    action_log = None       # shared list, set per-test

    def __init__(self, *a, **k):
        self.t = 0
        self.real_steps = 0

    def seed(self, s):
        pass

    def reset(self):
        self.t = 0
        self.real_steps = 0

    def set_init_state(self, st):
        return self._obs()

    def _obs(self):
        return {"agentview_image": type(self).frames[min(self.t, len(type(self).frames) - 1)]}

    def step(self, action):
        action = np.asarray(action, np.float64)
        type(self).action_log.append(action)
        self.t += 1
        if np.any(action != [0, 0, 0, 0, 0, 0, -1]):
            self.real_steps += 1
        done = (not type(self).never_done) and self.real_steps >= GOLDEN_T
        return self._obs(), 0.0, done, {}

    def close(self):
        pass


class _OneTaskSuite:
    n_tasks = 1

    def get_task(self, i):
        return FakeTask()

    def get_task_init_states(self, i):
        return [np.zeros(4)]


def _install_fake_libero(monkeypatch, suites):
    libero_pkg = types.ModuleType("libero")
    libero_sub = types.ModuleType("libero.libero")
    bench_mod = types.ModuleType("libero.libero.benchmark")
    envs_mod = types.ModuleType("libero.libero.envs")
    bench_mod.get_benchmark_dict = lambda: dict(suites)
    envs_mod.OffScreenRenderEnv = ReplayEnv
    libero_sub.get_libero_path = lambda kind: "/tmp/fake_bddl"
    libero_sub.benchmark = bench_mod
    libero_sub.envs = envs_mod
    libero_pkg.libero = libero_sub
    for name, mod in [
        ("libero", libero_pkg), ("libero.libero", libero_sub),
        ("libero.libero.benchmark", bench_mod), ("libero.libero.envs", envs_mod),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


ALL_SUITES = ("libero_spatial", "libero_object", "libero_goal", "libero_10")
# the eval queue's fixed per-suite placements (eval_queue_single_four_spec.py:22-29)
PLACEMENTS = {"libero_10": (5, 160), "libero_object": (30, 150),
              "libero_goal": (15, 158), "libero_spatial": (120, 160)}


def _run_suite(suite, tmp_path, policy, patch_path, tag=""):
    x, y = PLACEMENTS[suite]
    cfg = LiberoEvalConfig(
        task_suite_name=suite, num_trials_per_task=1, patchroot=patch_path,
        x=x, y=y, output_dir=str(tmp_path / f"golden{tag}" / suite),
    )
    ReplayEnv.action_log = []
    successes, episodes = eval_libero(cfg, policy)
    return successes, episodes, [a.copy() for a in ReplayEnv.action_log]


def test_golden_episode_replay_all_suites(monkeypatch, tmp_path):
    """One full recorded episode per suite through the REAL policy: success
    accounting, the gripper normalize+binarize+invert chain, the reference
    marker filename, and the byte-exact summary line — all four suites."""
    _install_fake_libero(monkeypatch, {s: _OneTaskSuite for s in ALL_SUITES})
    patch = np.random.default_rng(3).uniform(0, 1, (20, 20, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)
    policy = load_policy(None, model_name="vla-tiny")

    for suite in ALL_SUITES:
        ReplayEnv.frames = _golden_frames(suite)
        ReplayEnv.never_done = False
        successes, episodes, actions = _run_suite(suite, tmp_path, policy, patch_path)
        assert (successes, episodes) == (1, 1), suite

        # 10 settle steps of the dummy action precede the policy's commands
        # (run_libero_eval_args_geo_batch.py:199-201)
        for a in actions[:10]:
            np.testing.assert_array_equal(a, [0, 0, 0, 0, 0, 0, -1])
        real = actions[10:]
        assert len(real) == GOLDEN_T
        # gripper chain: [0,1]->[-1,1] binarized then sign-inverted -> always
        # exactly +/-1 (robot_utils.py:75-102)
        assert all(a[-1] in (-1.0, 1.0) for a in real), suite
        assert any(np.any(a[:6] != 0) for a in real), "policy emitted no motion"

        x, y = PLACEMENTS[suite]
        out = tmp_path / "golden" / suite
        assert (out / f"EVAL-{suite}--{x}_{y}_0_0_0.txt").exists()
        summary = (out / f"{suite}.txt").read_text()
        assert summary == (
            f"success_rate/total:1.0, num_episodes/total:1 "
            f"position_info:0.0_0.0_0.0_{x}_{y} \n"
        ), (suite, repr(summary))


def test_golden_replay_is_deterministic_and_patch_reaches_policy(monkeypatch, tmp_path):
    """Replaying the same recorded episode twice reproduces the action
    sequence bit-for-bit, and the frames the policy actually consumes carry
    the quantized patch at the configured placement (clean frames don't).

    The paste-reaches-policy check instruments the observation path rather
    than comparing decoded actions: a RANDOM tiny policy's argmax is
    near-tied, so action-level differences are at the mercy of CPU matmul
    thread-scheduling noise (observed flaky under the full suite). The
    action-level flip evidence on a TRAINED policy lives in
    test_integration_attack.py."""
    _install_fake_libero(monkeypatch, {"libero_spatial": _OneTaskSuite})
    patch = np.random.default_rng(4).uniform(0, 1, (40, 40, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)
    policy = load_policy(None, model_name="vla-tiny")
    ReplayEnv.frames = _golden_frames("libero_spatial")
    ReplayEnv.never_done = False

    seen_frames = []
    orig_get_action = policy.get_action

    def recording_get_action(frame, task_label):
        seen_frames.append(frame.copy())
        return orig_get_action(frame, task_label)

    monkeypatch.setattr(policy, "get_action", recording_get_action)

    _, _, run1 = _run_suite("libero_spatial", tmp_path, policy, patch_path, tag="1")
    patched_seen = list(seen_frames)
    seen_frames.clear()
    _, _, run2 = _run_suite("libero_spatial", tmp_path, policy, patch_path, tag="2")
    assert len(run1) == len(run2)
    for a, b in zip(run1, run2):
        np.testing.assert_array_equal(a, b)
    # the policy saw the identical frame sequence both times
    assert len(patched_seen) == len(seen_frames)
    for a, b in zip(patched_seen, seen_frames):
        np.testing.assert_array_equal(a, b)

    seen_frames.clear()
    _run_suite("libero_spatial", tmp_path, policy, None, tag="3")
    clean_seen = list(seen_frames)

    # patched frames differ from clean exactly (and only) at the paste site:
    # the quantized patch occupies [y:y+40, x:x+40] at the queue placement
    x, y = PLACEMENTS["libero_spatial"]
    from roboticattack_tpu.ops.patch_ops import quantize_patch_u8

    expected = quantize_patch_u8(patch)
    for pf, cf in zip(patched_seen, clean_seen):
        region = pf[y : y + 40, x : x + 40]
        np.testing.assert_array_equal(region, expected)
        outside = pf.copy()
        outside[y : y + 40, x : x + 40] = cf[y : y + 40, x : x + 40]
        np.testing.assert_array_equal(outside, cf)


def test_golden_replay_failure_episode_runs_to_max_steps(monkeypatch, tmp_path):
    """A never-succeeding episode terminates at the suite's patched max_steps
    budget (+settle) and is accounted as a failure
    (max_steps table, run_libero_eval_args_geo_batch.py:183-192)."""
    from roboticattack_tpu.eval.libero import MAX_STEPS_PATCHED, NUM_SETTLE_STEPS

    _install_fake_libero(monkeypatch, {"libero_spatial": _OneTaskSuite})
    patch = np.random.default_rng(5).uniform(0, 1, (20, 20, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)
    policy = load_policy(None, model_name="vla-tiny")
    ReplayEnv.frames = _golden_frames("libero_spatial")
    ReplayEnv.never_done = True

    successes, episodes, actions = _run_suite(
        "libero_spatial", tmp_path, policy, patch_path, tag="f"
    )
    assert (successes, episodes) == (0, 1)
    assert len(actions) == MAX_STEPS_PATCHED["libero_spatial"] + NUM_SETTLE_STEPS
    summary = (tmp_path / "goldenf" / "libero_spatial" / "libero_spatial.txt").read_text()
    assert summary.startswith("success_rate/total:0.0, num_episodes/total:1 ")


def test_batched_lockstep_matches_sequential_accounting(monkeypatch, tmp_path):
    """batch_trials>1 runs trials as lockstep simultaneous envs with ONE
    batched policy call per step; success accounting, per-episode log lines,
    and the summary line must match the sequential path on the same recorded
    episodes (incl. a partial last group, which pads frames to the lockstep
    width instead of recompiling)."""
    _install_fake_libero(monkeypatch, {"libero_spatial": _OneTaskSuite})
    patch = np.random.default_rng(6).uniform(0, 1, (20, 20, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)
    policy = load_policy(None, model_name="vla-tiny")
    ReplayEnv.frames = _golden_frames("libero_spatial")
    ReplayEnv.never_done = False

    def run(batch_trials, tag):
        x, y = PLACEMENTS["libero_spatial"]
        cfg = LiberoEvalConfig(
            task_suite_name="libero_spatial", num_trials_per_task=3,
            patchroot=patch_path, x=x, y=y, batch_trials=batch_trials,
            output_dir=str(tmp_path / f"bt{tag}"),
        )
        ReplayEnv.action_log = []
        return eval_libero(cfg, policy), (tmp_path / f"bt{tag}")

    (seq, seq_dir) = run(1, "seq")
    (bat, bat_dir) = run(2, "bat")  # 3 trials at width 2 -> one padded group
    assert bat == seq == (3, 3)
    # identical byte-exact summary lines
    assert (bat_dir / "libero_spatial.txt").read_text() == \
        (seq_dir / "libero_spatial.txt").read_text()
    # per-episode lines cover the same episodes with the same successes
    seq_log = (seq_dir / "EVAL-libero_spatial--120_160_0_0_0.txt").read_text()
    bat_log = (bat_dir / "EVAL-libero_spatial--120_160_0_0_0.txt").read_text()
    assert seq_log.count("success=True") == bat_log.count("success=True") == 3


def test_get_action_batch_matches_single(monkeypatch):
    """The batched policy call returns exactly the per-frame single-call
    actions (same decode program at batch N)."""
    policy = load_policy(None, model_name="vla-tiny")
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 255, (3, 256, 256, 3), dtype=np.uint8)
    batch = policy.get_action_batch(frames, "press the big red button")
    singles = np.stack([
        policy.get_action(f, "press the big red button") for f in frames
    ])
    np.testing.assert_allclose(batch, singles, rtol=0, atol=0)


# --- Jacobi draft quality on temporally-COHERENT episodes (VERDICT r4 item 3) --


def _coherent_frames(seed, n=64, walk=6):
    """A recorded episode whose frames evolve as a bounded random walk —
    the temporal coherence a real robot camera has (consecutive LIBERO
    frames are ~95% correlated), which the i.i.d. _golden_frames lack. The
    Jacobi lever's entire value lives in this regime: the previous step's
    tokens are a mostly-correct draft."""
    rng = np.random.default_rng(seed)
    f = rng.integers(0, 256, (256, 256, 3)).astype(np.int16)
    frames = []
    for _ in range(n):
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
        f = np.clip(f + rng.integers(-walk, walk + 1, f.shape), 0, 255)
    return frames


def test_jacobi_pass_distribution_on_coherent_episodes(monkeypatch, tmp_path):
    """Drive one coherent recorded episode per suite through the REAL policy
    with cfg.jacobi=True (draft = previous step's tokens, eval/libero.py) and
    record the verify-pass distribution. On coherent frames the steady state
    must beat the sequential tail's 6 passes by a wide margin — the middle
    ground the warm (1 pass) / cold (6 passes) unit pins only bracket.
    The measured distribution is recorded in BASELINE.md's Jacobi section."""
    _install_fake_libero(monkeypatch, {s: _OneTaskSuite for s in ALL_SUITES})
    patch = np.random.default_rng(7).uniform(0, 1, (20, 20, 3)).astype(np.float32)
    patch_path = str(tmp_path / "patch.pt")
    save_patch_pt(patch, patch_path)
    policy = load_policy(None, model_name="vla-tiny")

    per_suite = {}
    for i, suite in enumerate(ALL_SUITES):
        ReplayEnv.frames = _coherent_frames(1000 + i)
        ReplayEnv.never_done = False
        ReplayEnv.action_log = []
        passes = []
        orig = policy.get_action

        def rec(*a, **k):
            out = orig(*a, **k)
            assert k.get("draft_tokens") == "last", "jacobi mode must draft"
            assert policy.last_verify_passes is not None
            passes.append(policy.last_verify_passes)
            return out

        monkeypatch.setattr(policy, "get_action", rec)
        x, y = PLACEMENTS[suite]
        cfg = LiberoEvalConfig(
            task_suite_name=suite, num_trials_per_task=1, patchroot=patch_path,
            x=x, y=y, jacobi=True,
            output_dir=str(tmp_path / "coherent" / suite),
        )
        successes, episodes = eval_libero(cfg, policy)
        monkeypatch.setattr(policy, "get_action", orig)
        assert (successes, episodes) == (1, 1), suite
        assert len(passes) == GOLDEN_T, suite
        per_suite[suite] = passes

    all_passes = [p for ps in per_suite.values() for p in ps]
    # exactness bound: never more passes than the sequential tail's 6
    assert all(1 <= p <= 6 for p in all_passes), per_suite
    # draft quality on coherent frames: after the cold first step, the
    # steady state must average well under the sequential tail (the lever's
    # claim); <= 3 is a loose bound — measured ~1.0-1.3 on the tiny model
    steady = [p for ps in per_suite.values() for p in ps[1:]]
    assert float(np.mean(steady)) <= 3.0, per_suite
    hist = {p: all_passes.count(p) for p in sorted(set(all_passes))}
    print(f"coherent-episode verify-pass hist (4 suites x {GOLDEN_T} steps): {hist}")
