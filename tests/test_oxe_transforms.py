"""Every OXE standardization transform runs on a schema-matched synthetic
trajectory and produces the standardized layout (action [T', 7] EEF + absolute
gripper in [0,1], or the documented joint-space exceptions). Value-level spot
checks per combinator family, incl. quaternion conversion vs scipy."""

import zlib

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from roboticattack_tpu.data.oxe_registry import (
    ActionEncoding,
    OXE_DATASET_CONFIGS,
)
from roboticattack_tpu.data.oxe_transforms import (
    OXE_TRANSFORMS,
    droid_zero_action_filter,
    quat_xyzw_to_euler,
)

T = 5
_RNG = np.random.default_rng(0)


def _f(*shape):
    return tf.constant(_RNG.standard_normal(shape), tf.float32)


def _unit(*shape):
    return tf.constant(_RNG.uniform(0, 1, shape), tf.float32)


def _nli():
    return tf.constant(["do the thing"] * T)


def _quats(n):
    q = _RNG.standard_normal((n, 4))
    return tf.constant(q / np.linalg.norm(q, axis=-1, keepdims=True), tf.float32)


def _dict_act(gripper_key="gripper_closedness_action", gripper=None, extra=None):
    act = {
        "world_vector": _f(T, 3),
        "rotation_delta": _f(T, 3),
    }
    if gripper is not None:
        act[gripper_key] = gripper
    if extra:
        act.update(extra)
    return act


def _zlib_col(width):
    rows = [zlib.compress(_RNG.standard_normal(width).astype(np.float32).tobytes()) for _ in range(T)]
    return tf.constant(rows)


# dataset -> synthetic raw trajectory matching its TFDS schema
SCHEMAS = {
    "fractal20220817_data": lambda: {
        "action": _dict_act(gripper=_f(T, 1)),
        "observation": {"natural_language_instruction": _nli()},
    },
    "kuka": lambda: {
        "action": _dict_act(gripper=_f(T, 1)),
        "observation": {
            "natural_language_instruction": _nli(),
            "clip_function_input/base_pose_tool_reached": _zlib_col(7),
            "gripper_closed": _zlib_col(1),
        },
    },
    "bridge_oxe": lambda: {
        "action": _dict_act(gripper_key="open_gripper", gripper=tf.constant([True] * T)),
        "observation": {"natural_language_instruction": _nli(), "state": _f(T, 7)},
    },
    "bridge_orig": lambda: {"action": _unit(T, 7), "observation": {"state": _f(T, 7)}},
    "bridge_dataset": lambda: {"action": _unit(T, 7), "observation": {"state": _f(T, 7)}},
    "ppgm": lambda: {
        "action": _unit(T, 7),
        "observation": {"cartesian_position": _f(T, 6), "gripper_position": _f(T, 1)},
    },
    "taco_play": lambda: {
        "action": {"rel_actions_world": _f(T, 7)},
        "observation": {"robot_obs": _f(T, 15), "natural_language_instruction": _nli()},
    },
    "jaco_play": lambda: {
        "action": {"world_vector": _f(T, 3), "gripper_closedness_action": _f(T, 1)},
        "observation": {
            "end_effector_cartesian_pos": _f(T, 7),
            "natural_language_instruction": _nli(),
        },
    },
    "berkeley_cable_routing": lambda: {
        "action": _dict_act(),
        "observation": {"natural_language_instruction": _nli()},
    },
    "roboturk": lambda: {
        "action": _dict_act(gripper=_unit(T, 1)),
        "observation": {"natural_language_instruction": _nli()},
    },
    "viola": lambda: {
        "action": _dict_act(gripper=tf.constant(_RNG.uniform(-1, 1, T), tf.float32)),
        "observation": {"natural_language_instruction": _nli()},
    },
    "berkeley_autolab_ur5": lambda: {
        "action": _dict_act(gripper=tf.constant(_RNG.uniform(-1, 1, T), tf.float32)),
        "observation": {
            "robot_state": _f(T, 15),
            "image_with_depth": _unit(T, 4, 4, 1),
            "natural_language_instruction": _nli(),
        },
    },
    "toto": lambda: {
        "action": _dict_act(gripper_key="open_gripper", gripper=tf.constant([False] * T)),
        "observation": {"natural_language_instruction": _nli()},
    },
    "language_table": lambda: {
        "action": _f(T, 2),
        "observation": {
            "instruction": tf.constant(
                [[ord(c) for c in "push block"] + [0] * 5] * T, tf.int32
            )
        },
    },
    "columbia_cairlab_pusht_real": lambda: {
        "action": _dict_act(gripper=tf.constant(_RNG.uniform(0, 1, T), tf.float32)),
        "observation": {"natural_language_instruction": _nli()},
    },
    "stanford_kuka_multimodal_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 4),
        "observation": {"depth_image": _unit(T, 4, 4, 1)},
    },
    "nyu_rot_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7),
        "observation": {"state": _f(T, 7)},
    },
    "stanford_hydra_dataset_converted_externally_to_rlds": lambda: {
        "action": _unit(T, 7),
        "observation": {"state": _f(T, 13)},
    },
    "austin_buds_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7),
        "observation": {"state": _f(T, 24)},
    },
    "nyu_franka_play_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 15),
        "observation": {
            "state": _f(T, 13),
            "depth": tf.cast(_unit(T, 4, 4, 1) * 100, tf.int32),
            "depth_additional_view": tf.cast(_unit(T, 4, 4, 1) * 100, tf.int32),
        },
    },
    "maniskill_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7),
        "observation": {"state": _f(T, 9)},
    },
    "furniture_bench_dataset_converted_externally_to_rlds": lambda: {
        "action": tf.concat([_f(T, 3), _quats(T), _unit(T, 1)], axis=-1),
        "observation": {"state": _f(T, 10)},
    },
    "cmu_franka_exploration_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {},
    },
    "ucsd_kitchen_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {"state": _f(T, 21)},
    },
    "ucsd_pick_and_place_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 4), "observation": {"state": _f(T, 7)},
    },
    "austin_sailor_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {},
    },
    "austin_sirius_dataset_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {},
    },
    "bc_z": lambda: {
        "action": {
            "future/xyz_residual": _f(T, 3),
            "future/axis_angle_residual": _f(T, 3),
            "future/target_close": tf.constant(_RNG.integers(0, 2, (T, 1)), tf.int32),
        },
        "observation": {"natural_language_instruction": _nli()},
    },
    "utokyo_pr2_opening_fridge_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {"state": _f(T, 7)},
    },
    "utokyo_pr2_tabletop_manipulation_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {"state": _f(T, 7)},
    },
    "utokyo_xarm_pick_and_place_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {},
    },
    "utokyo_xarm_bimanual_converted_externally_to_rlds": lambda: {
        "action": _f(T, 14), "observation": {},
    },
    "robo_net": lambda: {"action": _f(T, 5), "observation": {"state": _f(T, 5)}},
    "berkeley_mvp_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {},
    },
    "berkeley_rpt_converted_externally_to_rlds": lambda: {
        "action": _f(T, 8), "observation": {},
    },
    "kaist_nonprehensile_converted_externally_to_rlds": lambda: {
        "action": _f(T, 20), "observation": {"state": _f(T, 14)},
    },
    "stanford_mask_vit_converted_externally_to_rlds": lambda: {
        "action": _f(T, 5), "observation": {"end_effector_pose": _f(T, 5)},
    },
    "tokyo_u_lsmo_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {"state": _f(T, 7)},
    },
    "dlr_sara_pour_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {},
    },
    "dlr_sara_grid_clamp_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {"state": _f(T, 8)},
    },
    "dlr_edan_shared_control_converted_externally_to_rlds": lambda: {
        "action": _unit(T, 7), "observation": {},
    },
    "asu_table_top_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7),
        "observation": {"state": _f(T, 7)},
        "ground_truth_states": {"EE": _f(T, 6)},
    },
    "stanford_robocook_converted_externally_to_rlds": lambda: {
        "action": _f(T, 7), "observation": {"state": _f(T, 7)},
    },
    "imperialcollege_sawyer_wrist_cam": lambda: {"action": _f(T, 8), "observation": {}},
    "iamlab_cmu_pickup_insert_converted_externally_to_rlds": lambda: {
        "action": tf.concat([_f(T, 3), _quats(T), _unit(T, 1)], axis=-1),
        "observation": {"state": _f(T, 10)},
    },
    "uiuc_d3field": lambda: {"action": _f(T, 3), "observation": {}},
    "utaustin_mutex": lambda: {"action": _f(T, 7), "observation": {"state": _f(T, 24)}},
    "berkeley_fanuc_manipulation": lambda: {
        "action": _f(T, 6), "observation": {"state": _unit(T, 13)},
    },
    "cmu_playing_with_food": lambda: {
        "action": tf.concat([_f(T, 3), _quats(T), _unit(T, 1)], axis=-1),
        "observation": {},
    },
    "cmu_play_fusion": lambda: {"action": _f(T, 9), "observation": {"state": _f(T, 8)}},
    "cmu_stretch": lambda: {"action": _f(T, 8), "observation": {"state": _f(T, 7)}},
    "berkeley_gnm_recon": lambda: {
        "action": _f(T, 2),
        "observation": {"position": _f(T, 2), "yaw": _f(T, 1), "state": _f(T, 3)},
    },
    "droid": lambda: {
        "action_dict": {"cartesian_velocity": _f(T, 6), "gripper_position": _unit(T, 1)},
        "action": _f(T, 7),
        "observation": {
            "cartesian_position": _f(T, 6),
            "gripper_position": _unit(T, 1),
            "exterior_image_1_left": _unit(T, 4, 4, 3),
            "exterior_image_2_left": _unit(T, 4, 4, 3),
        },
    },
    "fmb_dataset": lambda: {
        "action": _f(T, 7),
        "observation": {"eef_pose": _f(T, 6), "state_gripper_pose": _unit(T)},
    },
    "dobbe": lambda: {"action": _f(T, 7), "observation": {"state": _f(T, 7)}},
    "roboset": lambda: {"action": _f(T, 8), "observation": {"state": _f(T, 8)}},
    "rh20t": lambda: {
        "action": {"tcp_base": _f(T, 6), "gripper": tf.constant(_RNG.integers(0, 2, T), tf.int64)},
        "observation": {"tcp_base": _f(T, 6), "gripper_width": _unit(T)},
    },
    "tdroid_carrot_in_bowl": lambda: {
        "action": _unit(T, 7),
        "observation": {"cartesian_position": _f(T, 6), "gripper_position": _f(T, 1)},
    },
    "droid_wipe": lambda: {
        "action_dict": {"cartesian_velocity": _f(T, 6), "gripper_position": _unit(T, 1)},
        "action": _f(T, 7),
        "observation": {"cartesian_position": _f(T, 6), "gripper_position": _unit(T, 1)},
    },
    "libero_spatial_no_noops": lambda: {
        "action": tf.concat([_f(T, 6), tf.constant(_RNG.uniform(-1, 1, (T, 1)), tf.float32)], -1),
        "observation": {"state": _f(T, 8)},
    },
}
# families sharing one schema
for name in ("ppgm_static", "ppgm_wrist", "tdroid_pour_corn_in_pot",
             "tdroid_flip_pot_upright", "tdroid_move_object_onto_plate",
             "tdroid_knock_object_over", "tdroid_cover_object_with_towel"):
    SCHEMAS[name] = SCHEMAS["ppgm"]
for name in ("berkeley_gnm_cory_hall", "berkeley_gnm_sac_son"):
    SCHEMAS[name] = SCHEMAS["berkeley_gnm_recon"]
for name in ("libero_object_no_noops", "libero_goal_no_noops", "libero_10_no_noops"):
    SCHEMAS[name] = SCHEMAS["libero_spatial_no_noops"]
for name in ("nyu_door_opening_surprising_effectiveness",):
    SCHEMAS[name] = SCHEMAS["fractal20220817_data"]

# expected output action widths where not the EEF 7
JOINT_WIDTH = {
    "berkeley_mvp_converted_externally_to_rlds": 8,
    "berkeley_rpt_converted_externally_to_rlds": 8,
    "roboset": 8,
}
# transforms that shorten the trajectory (bridge first-step drop + relabel)
SHORTENED = {"bridge_oxe", "bridge_orig", "bridge_dataset"}


@pytest.mark.parametrize("name", sorted(OXE_TRANSFORMS))
def test_transform_standardizes(name):
    traj = SCHEMAS[name]()
    out = OXE_TRANSFORMS[name](traj)
    action = np.asarray(out["action"])
    want_t = T - 2 if name in SHORTENED else T
    want_w = JOINT_WIDTH.get(name, 7)
    assert action.shape == (want_t, want_w), (name, action.shape)
    assert action.dtype == np.float32
    assert np.isfinite(action).all()
    # state keys the transform CREATES (aliases) must exist; keys that come
    # straight from the raw TFDS schema are not the transform's job
    cfg = OXE_DATASET_CONFIGS.get(name)
    if cfg is not None:
        created = set(out["observation"]) - set(SCHEMAS[name]()["observation"])
        for key in created & {k for k in cfg.state_obs_keys if k}:
            assert np.asarray(out["observation"][key]).shape[0] == want_t, (name, key)


def test_quat_to_euler_matches_scipy():
    from scipy.spatial.transform import Rotation

    q = np.asarray(_quats(32))
    got = np.asarray(quat_xyzw_to_euler(tf.constant(q, tf.float32)))
    want = Rotation.from_quat(q).as_euler("xyz")  # extrinsic xyz == R = Rz Ry Rx
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_droid_zero_action_filter():
    q01 = np.array([-0.7776297926902771, -0.5803514122962952, -0.5795090794563293,
                    -0.6464047729969025, -0.7041108310222626, -0.8895104378461838])
    q99 = np.array([0.7597932070493698, 0.5726242214441299, 0.7351000607013702,
                    0.6705610305070877, 0.6464948207139969, 0.8897542208433151])
    norm_zero = 2 * (0 - q01) / (q99 - q01 + 1e-8) - 1
    zero = np.concatenate([np.tile(norm_zero, (3, 1)), np.zeros((3, 1))], axis=1)
    assert not bool(droid_zero_action_filter({"action": tf.constant(zero, tf.float32)}))
    moving = zero.copy()
    moving[1, 0] += 0.5
    assert bool(droid_zero_action_filter({"action": tf.constant(moving, tf.float32)}))


def test_gripper_conventions():
    """Value-level family checks: the standardized gripper column."""
    # invert+clip family: raw -1..1 -> 1 - clip01
    raw = tf.constant([[-1.0], [0.0], [0.3], [1.0]] + [[0.0]] * (T - 4), tf.float32)
    traj = {"action": tf.concat([_f(T, 6), raw], -1), "observation": {"state": _f(T, 8)}}
    out = OXE_TRANSFORMS["libero_spatial_no_noops"](traj)
    np.testing.assert_allclose(np.asarray(out["action"])[:4, 6], [1.0, 1.0, 0.7, 0.0], atol=1e-6)

    # fanuc: gripper action derived from inverted gripper STATE
    state = _unit(T, 13)
    out = OXE_TRANSFORMS["berkeley_fanuc_manipulation"](
        {"action": _f(T, 6), "observation": {"state": state}}
    )
    np.testing.assert_allclose(
        np.asarray(out["action"])[:, 6], 1 - np.asarray(state)[:, 6], atol=1e-6
    )

    # droid: 1 - gripper_position
    traj = SCHEMAS["droid_wipe"]()
    grip = np.asarray(traj["action_dict"]["gripper_position"])[:, 0]
    out = OXE_TRANSFORMS["droid_wipe"](traj)
    np.testing.assert_allclose(np.asarray(out["action"])[:, 6], 1 - grip, atol=1e-6)


def test_kuka_zlib_state_decode():
    traj = SCHEMAS["kuka"]()
    raw = [np.frombuffer(zlib.decompress(b), np.float32)
           for b in traj["observation"]["clip_function_input/base_pose_tool_reached"].numpy()]
    out = OXE_TRANSFORMS["kuka"](traj)
    decoded = np.asarray(out["observation"]["clip_function_input/base_pose_tool_reached"])
    assert decoded.shape == (T, 7)
    np.testing.assert_allclose(decoded, np.stack(raw), atol=0)


def test_language_table_instruction_decode():
    out = OXE_TRANSFORMS["language_table"](SCHEMAS["language_table"]())
    inst = [s.decode() for s in out["language_instruction"].numpy()]
    assert inst == ["push block"] * T
    a = np.asarray(out["action"])
    np.testing.assert_allclose(a[:, 6], 1.0)  # gripper defaults open
    np.testing.assert_allclose(a[:, 2:6], 0.0)


def test_bridge_orig_drops_and_relabels():
    # decisive gripper column: binarize carries the final value backward
    # through in-between readings, so end on a firmly-open gripper
    grip = tf.constant([[0.0], [0.02], [0.5], [0.98], [1.0]], tf.float32)
    traj = {
        "action": tf.concat([_f(T, 6), grip], -1),
        "observation": {"state": _f(T, 7)},
    }
    state = np.asarray(traj["observation"]["state"])
    out = OXE_TRANSFORMS["bridge_orig"](traj)
    a = np.asarray(out["action"])
    # first step dropped, then relabel drops the last: T-2 steps whose
    # movement dims are reached-state deltas
    np.testing.assert_allclose(a[:, :6], state[2:, :6] - state[1:-1, :6], atol=1e-6)
    assert set(np.unique(a[:, 6])) <= {0.0, 1.0}
    assert out["observation"]["EEF_state"].shape == (T - 2, 6)
