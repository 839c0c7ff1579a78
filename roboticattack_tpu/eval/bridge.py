"""WidowX / BridgeData V2 real-robot evaluation (API-shape parity).

Mirrors /root/reference/experiments/robot/bridge/ (widowx_env.py,
run_bridgev2_eval.py, bridgev2_utils.py): a gym-style wrapper around the
`widowx_envs` WidowX client, a rollout driver, and obs/save utilities. The
hardware stack (widowx_envs + ROS camera) is physical-robot-only; everything
here degrades to informative ImportErrors off-robot, while the policy side
(TPU inference, gripper conventions, image preprocessing) is the same code
used by the LIBERO path.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

from ..utils.gripper import invert_gripper_action, normalize_gripper_action
from .policy import VLAPolicy
from .processing import resize_bicubic_pil


@dataclass
class BridgeEvalConfig:
    """run_bridgev2_eval.py:37-81 flag surface."""

    host_ip: str = "localhost"
    port: int = 5556
    initial_eep: Tuple[float, float, float] = (0.3, 0.0, 0.15)
    blocking: bool = False
    max_episodes: int = 50
    max_steps: int = 60
    control_frequency: float = 5.0
    resize_size: int = 224
    unnorm_key: str = "bridge_orig"
    save_dir: str = "./bridge_rollouts"


class WidowXGym:
    """Gym-style wrapper over the WidowX client (widowx_env.py:17-60)."""

    def __init__(self, cfg: BridgeEvalConfig):
        try:
            from widowx_envs.widowx_env_service import WidowXClient, WidowXConfigs
        except ImportError as e:
            raise ImportError(
                "bridge evaluation requires `widowx_envs` (physical WidowX "
                "robot + ROS camera stack); see the reference README for setup"
            ) from e
        env_params = WidowXConfigs.DefaultEnvParams.copy()
        env_params["start_state"] = list(cfg.initial_eep) + [0, 0, 0, 1]
        self.client = WidowXClient(host=cfg.host_ip, port=cfg.port)
        self.client.init(env_params)
        self.cfg = cfg

    def reset(self) -> Dict:
        self.client.reset()
        return self.get_observation()

    def get_observation(self) -> Dict:
        obs = self.client.get_observation()
        img = obs["image"]
        if img.ndim == 1:  # flattened stream format
            side = int(np.sqrt(img.shape[0] / 3))
            img = img.reshape(3, side, side).transpose(1, 2, 0) * 255
            img = img.astype(np.uint8)
        return {"full_image": img, "proprio": obs.get("state")}

    def step(self, action: np.ndarray) -> Dict:
        self.client.step_action(action, blocking=self.cfg.blocking)
        return self.get_observation()


def run_bridge_eval(cfg: BridgeEvalConfig, policy: VLAPolicy, task_label: str):
    """Rollout driver (run_bridgev2_eval.py): human-in-the-loop episodes."""
    env = WidowXGym(cfg)
    os.makedirs(cfg.save_dir, exist_ok=True)
    dt = 1.0 / cfg.control_frequency
    for episode in range(cfg.max_episodes):
        obs = env.reset()
        frames = []
        for t in range(cfg.max_steps):
            start = time.time()
            frame = resize_bicubic_pil(obs["full_image"], cfg.resize_size)
            frames.append(frame)
            action = policy.get_action(frame, task_label)
            action = invert_gripper_action(normalize_gripper_action(action, binarize=True))
            obs = env.step(action)
            elapsed = time.time() - start
            if elapsed < dt:
                time.sleep(dt - elapsed)
        np.save(os.path.join(cfg.save_dir, f"episode_{episode}_frames.npy"), np.stack(frames))
        cont = input("episode done; continue? [y/n] ")
        if cont.strip().lower() != "y":
            break
