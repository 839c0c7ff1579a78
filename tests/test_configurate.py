"""Draccus-equivalent config system: choice registries, YAML/JSON round-trip,
CLI-over-file-over-defaults precedence, the registered VLA run variants, and
the eval CLI's --config_path plumbing."""

import dataclasses
import json

import pytest

from roboticattack_tpu.training.conf import VLARunConfig
from roboticattack_tpu.utils.configurate import (
    ChoiceRegistry,
    config_to_dict,
    dump_config,
    load_config,
    parse_config,
)

REFERENCE_VLA_IDS = [
    "siglip-224px+mx-bridge",
    "siglip-224px-icy+mx-bridge",
    "prism-dinosiglip-224px+mx-bridge",
    "siglip-224px+mx-oxe-magic-soup",
    "prism-dinosiglip-224px+mx-oxe-magic-soup-plus",
    "siglip-224px+mx-tdroid_carrot_in_bowl",
    "siglip-224px+mx-tdroid_pour_corn_in_pot",
    "siglip-224px-icy+mx-tdroid_carrot_in_bowl",
    "siglip-224px-last_layer+mx-tdroid_carrot_in_bowl",
    "siglip-224px-sandwich+mx-tdroid_carrot_in_bowl",
    "siglip-224px+mx-droid_wipe",
]


def test_reference_variant_registry():
    choices = VLARunConfig.registered_choices()
    for vla_id in REFERENCE_VLA_IDS:
        assert vla_id in choices, vla_id
    soup = VLARunConfig.get_choice_class(
        "prism-dinosiglip-224px+mx-oxe-magic-soup-plus")()
    assert soup.base_vlm == "prism-dinosiglip-224px+7b"
    assert soup.data_mix == "oxe_magic_soup_plus_minus"
    assert soup.expected_world_size == 64 and soup.global_batch_size == 2048
    sandwich = VLARunConfig.get_choice_class(
        "siglip-224px-sandwich+mx-tdroid_carrot_in_bowl")()
    assert sandwich.freeze_llm_backbone and sandwich.unfreeze_last_llm_layer
    assert not sandwich.freeze_vision_backbone
    with pytest.raises(KeyError, match="unknown"):
        VLARunConfig.get_choice_class("nope")


def test_grad_accumulation_autocompute():
    cfg = VLARunConfig(global_batch_size=2048, per_device_batch_size=32,
                       expected_world_size=8)
    assert cfg.grad_accumulation_steps == 8  # 2048 / (32*8)
    tc = cfg.to_train_config(max_steps=10)
    assert tc.grad_accumulation_steps == 8 and tc.max_steps == 10


@pytest.mark.parametrize("ext", ["yaml", "json"])
def test_config_file_roundtrip(tmp_path, ext):
    cfg = parse_config(VLARunConfig, ["--type", REFERENCE_VLA_IDS[4],
                                      "--learning_rate", "1e-4"])
    path = str(tmp_path / f"run.{ext}")
    dump_config(cfg, path)
    loaded = load_config(VLARunConfig, path)
    assert config_to_dict(loaded) == config_to_dict(cfg)
    assert loaded.vla_id == REFERENCE_VLA_IDS[4]
    assert loaded.learning_rate == 1e-4


def test_cli_overrides_file_overrides_defaults(tmp_path):
    path = str(tmp_path / "run.yaml")
    dump_config(parse_config(VLARunConfig, ["--type", REFERENCE_VLA_IDS[0],
                                            "--weight_decay", "0.1"]), path)
    cfg = parse_config(VLARunConfig, ["--config_path", path,
                                      "--max_grad_norm", "2.5"])
    assert cfg.weight_decay == 0.1      # from file
    assert cfg.max_grad_norm == 2.5     # CLI wins
    assert cfg.vla_id == REFERENCE_VLA_IDS[0]  # variant default via file type tag


def test_unknown_field_rejected(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"not_a_field": 1}))
    with pytest.raises(KeyError, match="no field"):
        load_config(VLARunConfig, str(path))


def test_custom_registry_and_nesting(tmp_path):
    @dataclasses.dataclass
    class Inner:
        width: int = 4

    @dataclasses.dataclass
    class Outer(ChoiceRegistry):
        name: str = "o"
        inner: Inner = dataclasses.field(default_factory=Inner)
        sizes: tuple = (1, 2)

    path = tmp_path / "o.json"
    path.write_text(json.dumps({"name": "x", "inner": {"width": 9}, "sizes": [3, 4]}))
    cfg = load_config(Outer, str(path))
    assert cfg.inner.width == 9 and cfg.sizes == (3, 4)
    # CLI list coercion
    cfg2 = parse_config(Outer, ["--sizes", "5,6"])
    assert cfg2.sizes == (5, 6)


def test_eval_libero_config_path(tmp_path):
    from roboticattack_tpu.cli.eval_libero import apply_config_file, build_parser
    from roboticattack_tpu.eval.libero import LiberoEvalConfig

    cfg = LiberoEvalConfig(task_suite_name="libero_goal", x=15, y=158,
                           num_trials_per_task=3)
    path = str(tmp_path / "eval.yaml")
    dump_config(cfg, path)
    parser = build_parser()
    argv = ["--config_path", path, "--y", "99"]
    apply_config_file(parser, argv)
    args = parser.parse_args(argv)
    assert args.task_suite_name == "libero_goal"
    assert args.x == 15                 # from file
    assert args.y == 99                 # CLI wins
    assert args.num_trials_per_task == 3


def test_eval_bridge_cli_config_path(tmp_path):
    from roboticattack_tpu.cli.eval_bridge import (
        apply_config_file,
        build_parser,
        config_from_args,
    )
    from roboticattack_tpu.eval.bridge import BridgeEvalConfig

    dump_config(BridgeEvalConfig(host_ip="10.0.0.7", max_steps=33,
                                 initial_eep=(0.1, 0.2, 0.3)),
                str(tmp_path / "bridge.yaml"))
    parser = build_parser()
    argv = ["--config_path", str(tmp_path / "bridge.yaml"), "--port", "7777"]
    apply_config_file(parser, argv)
    cfg = config_from_args(parser.parse_args(argv))
    assert cfg.host_ip == "10.0.0.7" and cfg.max_steps == 33
    assert cfg.port == 7777                      # CLI wins
    assert cfg.initial_eep == (0.1, 0.2, 0.3)


def test_bridge_rollout_save_utils(tmp_path, monkeypatch):
    """save_rollout_video/data write replayable episode artifacts
    (bridgev2_utils.py:67-98); get_next_task_label keeps on blank input."""
    import numpy as np

    from roboticattack_tpu.eval.bridge import (
        get_next_task_label,
        save_rollout_data,
        save_rollout_video,
    )

    frames = [np.zeros((32, 32, 3), np.uint8) for _ in range(4)]
    # mp4 with an ffmpeg backend, .frames.npy fallback without one
    path = save_rollout_video(frames, 0, str(tmp_path))
    import os

    assert os.path.getsize(path) > 0 and "rollout-1" in path
    npz = save_rollout_data(frames, frames, [np.zeros(7)] * 4,
                            [np.ones(7)] * 4, 1, str(tmp_path))
    blob = np.load(npz)
    assert blob["actions"].shape == (4, 7) and blob["images"].shape[0] == 4

    monkeypatch.setattr("builtins.input", lambda *_: "")
    assert get_next_task_label("wipe the table") == "wipe the table"
    monkeypatch.setattr("builtins.input", lambda *_: "new task")
    assert get_next_task_label("wipe the table") == "new task"
