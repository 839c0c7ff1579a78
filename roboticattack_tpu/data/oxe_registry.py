"""Open-X-Embodiment dataset registry: per-dataset keys/encodings + mixtures.

Structural equivalent of prismatic/vla/datasets/rlds/oxe/{configs,mixtures,
materialize}.py. The reference ships ~70 OXE entries; the attack framework
exercises exactly five (bridge_orig + 4 LIBERO suites, openvla_dataloader.py:
85-100), which ship here, together with the registration machinery for adding
the rest. `make_oxe_dataset_kwargs` reproduces the normalization contract:
EEF_POS actions normalize dims 0-5 and keep the gripper absolute
(oxe/materialize.py:37-42).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from .rlds import STANDARDIZATION_TRANSFORMS


class StateEncoding:
    NONE = -1
    POS_EULER = 1
    POS_QUAT = 2
    JOINT = 3


class ActionEncoding:
    EEF_POS = 1      # [dx, dy, dz, droll, dpitch, dyaw, gripper-abs]
    JOINT_POS = 2
    EEF_R6 = 5


@dataclass(frozen=True)
class OXEDatasetConfig:
    image_obs_keys: Dict[str, Optional[str]]
    state_obs_keys: List[Optional[str]]
    state_encoding: int = StateEncoding.POS_EULER
    action_encoding: int = ActionEncoding.EEF_POS
    depth_obs_keys: Dict[str, Optional[str]] = field(
        default_factory=lambda: {"primary": None, "secondary": None, "wrist": None}
    )


OXE_DATASET_CONFIGS: Dict[str, OXEDatasetConfig] = {}


def register_oxe_dataset(name: str, config: OXEDatasetConfig,
                         transform: Optional[Callable] = None) -> None:
    OXE_DATASET_CONFIGS[name] = config
    if transform is not None:
        STANDARDIZATION_TRANSFORMS[name] = transform


_LIBERO_CONFIG = OXEDatasetConfig(
    image_obs_keys={"primary": "image", "secondary": None, "wrist": "wrist_image"},
    state_obs_keys=["EEF_state", None, "gripper_state"],
)

register_oxe_dataset(
    "bridge_orig",
    OXEDatasetConfig(
        image_obs_keys={"primary": "image_0", "secondary": "image_1", "wrist": None},
        state_obs_keys=["EEF_state", None, "gripper_state"],
    ),
)
for _suite in ("libero_spatial", "libero_object", "libero_goal", "libero_10"):
    register_oxe_dataset(f"{_suite}_no_noops", _LIBERO_CONFIG)

# Named mixtures (oxe/mixtures.py shape): list of (dataset, sampling weight).
OXE_NAMED_MIXTURES: Dict[str, List[Tuple[str, float]]] = {
    "bridge": [("bridge_orig", 1.0)],
    "libero_all": [
        ("libero_spatial_no_noops", 1.0),
        ("libero_object_no_noops", 1.0),
        ("libero_goal_no_noops", 1.0),
        ("libero_10_no_noops", 1.0),
    ],
}


def make_oxe_dataset_kwargs(
    dataset_name: str,
    data_dir: Optional[str] = None,
    load_camera_views: Sequence[str] = ("primary",),
) -> Dict:
    """Per-dataset pipeline kwargs incl. the EEF_POS normalization contract."""
    if dataset_name not in OXE_DATASET_CONFIGS:
        raise KeyError(
            f"unregistered OXE dataset '{dataset_name}'; "
            f"register it via register_oxe_dataset(). Known: {sorted(OXE_DATASET_CONFIGS)}"
        )
    cfg = OXE_DATASET_CONFIGS[dataset_name]
    if cfg.action_encoding == ActionEncoding.EEF_POS:
        absolute_action_mask = [False] * 6 + [True]
        action_normalization_mask = [True] * 6 + [False]
    elif cfg.action_encoding == ActionEncoding.EEF_R6:
        absolute_action_mask = [False] * 9 + [True]
        action_normalization_mask = [True] * 9 + [False]
    else:
        raise ValueError(f"only EEF_POS / EEF_R6 actions supported, got {cfg.action_encoding}")
    missing = set(load_camera_views) - set(cfg.image_obs_keys)
    if missing:
        raise ValueError(f"cannot load {dataset_name}: missing camera views {missing}")
    return dict(
        name=dataset_name,
        data_dir=data_dir,
        image_obs_keys={k: v for k, v in cfg.image_obs_keys.items() if k in load_camera_views},
        state_obs_keys=cfg.state_obs_keys,
        absolute_action_mask=absolute_action_mask,
        action_normalization_mask=action_normalization_mask,
        standardize_fn=STANDARDIZATION_TRANSFORMS.get(dataset_name),
    )


def make_interleaved_mixture_kwargs(mixture_name: str, **kwargs) -> List[Dict]:
    """Expand a named mixture into per-dataset kwargs + weights
    (mixtures.py + make_interleaved_dataset contract)."""
    if mixture_name not in OXE_NAMED_MIXTURES:
        raise KeyError(f"unknown mixture '{mixture_name}'; known: {sorted(OXE_NAMED_MIXTURES)}")
    out = []
    for name, weight in OXE_NAMED_MIXTURES[mixture_name]:
        entry = make_oxe_dataset_kwargs(name, **kwargs)
        entry["sample_weight"] = weight
        out.append(entry)
    return out


# --- additional OXE families (beyond the five the attacks exercise) -----------
# Standardization transforms are written against the tf.data trajectory dicts
# these TFDS builders emit; datasets whose raw schema we cannot validate here
# register config-only (transform=None -> identity) and can be completed via
# register_oxe_dataset at use time.

def _tf():
    from .rlds import _tf as inner

    return inner()


def rt1_style_transform(traj):
    """fractal20220817_data / kuka: dict actions {world_vector, rotation_delta,
    gripper_closedness_action} with relative gripper -> 7-dof EEF_POS + abs
    gripper (oxe/transforms.py rt1/kuka transforms)."""
    from .rlds import rel2abs_gripper_actions

    tf = _tf()
    gripper = rel2abs_gripper_actions(traj["action"]["gripper_closedness_action"][:, 0])
    traj["action"] = tf.concat(
        [
            traj["action"]["world_vector"],
            traj["action"]["rotation_delta"],
            gripper[:, None],
        ],
        axis=-1,
    )
    return traj


def taco_play_transform(traj):
    """taco_play: rel_actions_world with gripper clipped to [0, 1]."""
    tf = _tf()
    action = traj["action"]["rel_actions_world"]
    traj["observation"]["state_eef"] = traj["observation"]["robot_obs"][:, :6]
    traj["observation"]["state_gripper"] = traj["observation"]["robot_obs"][:, 7:8]
    traj["action"] = tf.concat(
        [action[:, :6], tf.clip_by_value(action[:, -1:], 0, 1)], axis=-1
    )
    return traj


register_oxe_dataset(
    "fractal20220817_data",
    OXEDatasetConfig(
        image_obs_keys={"primary": "image", "secondary": None, "wrist": None},
        state_obs_keys=["base_pose_tool_reached", "gripper_closed"],
        state_encoding=StateEncoding.POS_QUAT,
    ),
    transform=rt1_style_transform,
)
register_oxe_dataset(
    "kuka",
    OXEDatasetConfig(
        image_obs_keys={"primary": "image", "secondary": None, "wrist": None},
        state_obs_keys=["clip_function_input/base_pose_tool_reached", "gripper_closed"],
        state_encoding=StateEncoding.POS_QUAT,
    ),
    transform=rt1_style_transform,
)
register_oxe_dataset(
    "bridge_oxe",
    OXEDatasetConfig(
        image_obs_keys={"primary": "image", "secondary": "image_1", "wrist": None},
        state_obs_keys=["EEF_state", None, "gripper_state"],
    ),
)
register_oxe_dataset(
    "taco_play",
    OXEDatasetConfig(
        image_obs_keys={"primary": "rgb_static", "secondary": None, "wrist": "rgb_gripper"},
        state_obs_keys=["state_eef", None, "state_gripper"],
    ),
    transform=taco_play_transform,
)
register_oxe_dataset(
    "jaco_play",
    OXEDatasetConfig(
        image_obs_keys={"primary": "image", "secondary": None, "wrist": "image_wrist"},
        state_obs_keys=["state_eef", None, "state_gripper"],
    ),
)

OXE_NAMED_MIXTURES["oxe_magic_soup_lite"] = [
    ("fractal20220817_data", 1.0),
    ("kuka", 0.8),
    ("bridge_orig", 1.0),
    ("taco_play", 2.0),
]
