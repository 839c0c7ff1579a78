"""API-surface parity: prompt builder variants, processor, OXE registry,
bridge module gating."""

import numpy as np
import pytest

from roboticattack_tpu.data.oxe_registry import (
    OXE_DATASET_CONFIGS,
    OXE_NAMED_MIXTURES,
    make_interleaved_mixture_kwargs,
    make_oxe_dataset_kwargs,
    register_oxe_dataset,
    OXEDatasetConfig,
)
from roboticattack_tpu.models.processing import PrismaticImageProcessor, PrismaticProcessor
from roboticattack_tpu.utils.prompting import (
    LLaMa2ChatPromptBuilder,
    MistralInstructPromptBuilder,
    PhiPromptBuilder,
    PROMPT_BUILDERS,
    PurePromptBuilder,
    VicunaV15ChatPromptBuilder,
    WordStubTokenizer,
)


def test_prompt_builder_variants():
    v = VicunaV15ChatPromptBuilder("openvla")
    v.add_turn("human", "what is this?")
    assert v.prompt.startswith("A chat between a curious user")
    assert "USER: what is this? ASSISTANT: " in v.prompt

    l2 = LLaMa2ChatPromptBuilder("openvla")
    l2.add_turn("human", "do the thing")
    assert l2.prompt.startswith("[INST] <<SYS>\n")
    assert l2.prompt.endswith("do the thing [/INST] ")

    m = MistralInstructPromptBuilder("openvla")
    m.add_turn("human", "go")
    assert m.prompt == "[INST] go [/INST] "

    p = PhiPromptBuilder("openvla")
    p.add_turn("human", "go")
    p.add_turn("gpt", "done")
    assert p.prompt == "<|endoftext|>Input: go\nOutput: done\n<|endoftext|>"

    assert PROMPT_BUILDERS["llama2-7b-pure"] is PurePromptBuilder
    assert PROMPT_BUILDERS["vicuna-v15-7b"] is VicunaV15ChatPromptBuilder


def test_image_processor_and_processor():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (256, 320, 3), dtype=np.uint8)
    proc = PrismaticImageProcessor()
    px = proc.apply_transform(img)
    assert px.shape == (2, 224, 224, 3)
    # siglip half uses 0.5/0.5 stats
    raw = (px[1] * 0.5) + 0.5
    assert raw.min() >= -1e-5 and raw.max() <= 1 + 1e-5

    letterbox = PrismaticImageProcessor(image_resize_strategy="letterbox")
    px2 = letterbox.apply_transform(img)
    assert px2.shape == (2, 224, 224, 3)

    full = PrismaticProcessor(WordStubTokenizer())
    out = full("In: What action should the robot take to stir the pot?\nOut:", img)
    assert set(out) == {"input_ids", "attention_mask", "pixel_values"}
    assert out["pixel_values"].shape == (1, 2, 224, 224, 3)
    assert out["input_ids"][0, 0] == 1
    nchw6 = PrismaticProcessor.as_nchw6(out["pixel_values"])
    assert nchw6.shape == (1, 6, 224, 224)
    np.testing.assert_allclose(
        nchw6[0, 0], out["pixel_values"][0, 0, :, :, 0], rtol=1e-6
    )


def test_oxe_registry():
    assert "bridge_orig" in OXE_DATASET_CONFIGS
    kw = make_oxe_dataset_kwargs("bridge_orig")
    assert kw["absolute_action_mask"] == [False] * 6 + [True]
    assert kw["action_normalization_mask"] == [True] * 6 + [False]
    assert callable(kw["standardize_fn"])

    mix = make_interleaved_mixture_kwargs("libero_all")
    assert len(mix) == 4 and all(m["sample_weight"] == 1.0 for m in mix)

    with pytest.raises(KeyError):
        make_oxe_dataset_kwargs("not_a_dataset")

    register_oxe_dataset(
        "my_custom", OXEDatasetConfig(
            image_obs_keys={"primary": "rgb"}, state_obs_keys=["state"])
    )
    assert make_oxe_dataset_kwargs("my_custom")["image_obs_keys"] == {"primary": "rgb"}


def test_bridge_module_gated():
    from roboticattack_tpu.eval.bridge import BridgeEvalConfig, WidowXGym

    cfg = BridgeEvalConfig()
    assert cfg.unnorm_key == "bridge_orig"
    with pytest.raises(ImportError, match="widowx_envs"):
        WidowXGym(cfg)


def test_rt1_style_transform():
    import tensorflow as tf
    from roboticattack_tpu.data.oxe_registry import rt1_style_transform

    traj = {
        "action": {
            "world_vector": tf.constant(np.random.randn(4, 3), tf.float32),
            "rotation_delta": tf.constant(np.random.randn(4, 3), tf.float32),
            # relative gripper: close at t=1, open at t=3
            "gripper_closedness_action": tf.constant([[0.0], [1.0], [0.0], [-1.0]], tf.float32),
        },
        "observation": {"natural_language_instruction": tf.constant(["pick"] * 4)},
    }
    out = rt1_style_transform(traj)
    a = out["action"].numpy()
    assert a.shape == (4, 7)
    np.testing.assert_allclose(a[:, 6], [1, 0, 0, 1])  # abs gripper, +1=open


def test_extended_registry_entries():
    from roboticattack_tpu.data.oxe_registry import make_oxe_dataset_kwargs

    for name in ("fractal20220817_data", "kuka", "taco_play", "jaco_play", "bridge_oxe"):
        kw = make_oxe_dataset_kwargs(name)
        assert kw["action_normalization_mask"] == [True] * 6 + [False]


def test_oxe_transforms_registered_on_package_import():
    """make_frame_dataset must find every OXE standardization transform after
    a plain `import roboticattack_tpu.data` (side-effect registration)."""
    import roboticattack_tpu.data  # noqa: F401
    from roboticattack_tpu.data.rlds import STANDARDIZATION_TRANSFORMS

    assert len(STANDARDIZATION_TRANSFORMS) >= 73
    for name in ("taco_play", "droid", "bc_z", "libero_10_no_noops"):
        assert callable(STANDARDIZATION_TRANSFORMS[name]), name
