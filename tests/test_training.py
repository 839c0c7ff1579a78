"""Trainer: loss decreases under both strategies on the 8-device CPU mesh;
freeze masks hold; orbax checkpoint round-trips."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from roboticattack_tpu.data import batch_iterator, dummy_frame_iterator
from roboticattack_tpu.models import VLA_TINY, init_vla_params
from roboticattack_tpu.parallel import make_mesh
from roboticattack_tpu.training import (
    TrainConfig,
    VLATrainer,
    restore_checkpoint,
    save_checkpoint,
    trainable_mask,
)
from roboticattack_tpu.utils import WordStubTokenizer


def _batches(bs=4):
    frames = dummy_frame_iterator(WordStubTokenizer(), image_size=56, seed=0)
    return batch_iterator(frames, batch_size=bs, pad_to=48)


@pytest.mark.parametrize("strategy", ["ddp", "fsdp"])
def test_training_reduces_loss(strategy):
    params = init_vla_params(jax.random.key(0), VLA_TINY)
    cfg = TrainConfig(strategy=strategy, learning_rate=5e-3, max_steps=12,
                      warmup_ratio=0.0, seed=0)
    mesh = make_mesh(data=8, model=1)
    trainer = VLATrainer(params, VLA_TINY, cfg, mesh=mesh)
    batches = _batches(bs=8)
    first = trainer.run_training(batches, num_steps=1)
    last = trainer.run_training(batches, num_steps=11)
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first, (first, last)


def test_freeze_masks():
    params = init_vla_params(jax.random.key(1), VLA_TINY)
    cfg = TrainConfig(freeze_vision_backbone=True, freeze_llm_backbone=False)
    mask = trainable_mask(params, cfg)
    assert not any(jax.tree.leaves(mask["vision"]))
    assert all(jax.tree.leaves(mask["llm"]))
    assert all(jax.tree.leaves(mask["projector"]))


def test_frozen_params_do_not_move():
    params = init_vla_params(jax.random.key(2), VLA_TINY)
    cfg = TrainConfig(strategy="ddp", learning_rate=5e-3, max_steps=3,
                      freeze_vision_backbone=True)
    trainer = VLATrainer(params, VLA_TINY, cfg, mesh=make_mesh(data=8, model=1))
    before = jax.tree.map(np.asarray, jax.device_get(trainer.params["vision"]))
    trainer.run_training(_batches(bs=8), num_steps=3)
    after = jax.device_get(trainer.params["vision"])
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path):
    params = init_vla_params(jax.random.key(3), VLA_TINY)
    path = save_checkpoint(str(tmp_path), step=42, epoch=1,
                           params=jax.device_get(params), loss=1.234)
    assert "step-000042-epoch-01" in path
    restored = restore_checkpoint(str(tmp_path) + "/latest-checkpoint")
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conversation_dataset_and_sampler(tmp_path):
    import json as _json
    from PIL import Image
    from roboticattack_tpu.training.preprocessing import (
        ConversationDataset,
        SplitModalitySampler,
    )
    from roboticattack_tpu.utils import WordStubTokenizer
    from roboticattack_tpu.utils.constants import IGNORE_INDEX

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 40, 3), np.uint8)).save(img_dir / "a.jpg")
    records = [
        {"id": 0, "image": "a.jpg", "conversations": [
            {"from": "human", "value": "<image>\nwhat is shown?"},
            {"from": "gpt", "value": "a black square"},
            {"from": "human", "value": "and its color?"},
            {"from": "gpt", "value": "black"},
        ]},
        {"id": 1, "conversations": [
            {"from": "human", "value": "say hi"},
            {"from": "gpt", "value": "hi"},
        ]},
    ]
    jpath = tmp_path / "data.json"
    jpath.write_text(_json.dumps(records))

    ds = ConversationDataset(str(jpath), str(img_dir), WordStubTokenizer())
    ex = ds[0]
    assert ex["image"].shape == (224, 224, 3)
    assert (ex["labels"] != IGNORE_INDEX).sum() > 0      # gpt turns supervised
    assert ex["labels"][0] == IGNORE_INDEX               # human prefix ignored
    assert len(ds) == 2 and "image" not in ds[1]

    align = ConversationDataset(str(jpath), str(img_dir), WordStubTokenizer(), align=True)
    ex_a = align[0]
    assert len(ex_a["input_ids"]) < len(ex["input_ids"])  # caption-only

    lengths = ds.get_modality_lengths()
    assert lengths[0][0] is True and lengths[1][0] is False
    sampler = SplitModalitySampler(lengths * 4, batch_size=2, seed=0)
    batches = list(sampler)
    assert len(batches) == len(sampler) == 4
    for b in batches:  # single-modality batches
        mods = {(lengths * 4)[i][0] for i in b}
        assert len(mods) == 1
