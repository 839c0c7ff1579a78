"""Batch collation: frame dicts -> dense AttackBatch arrays.

Equivalent of `PaddedCollatorForActionPrediction`
(prismatic/util/data_utils.py:95-144): right-pad ids with the PAD token and
labels with IGNORE, truncate to max length, attention mask = (ids != pad).
Images stay raw uint8 and are scaled to [0, 1] float here (the reference keeps
PIL images through the collator and ToTensor-scales inside the patch
transform; patching happens before normalization in both).

For TPU feeding, `pad_to` fixes the sequence length across batches so the
jitted step compiles once (the reference pads per-batch to the longest row —
variable shapes would retrace XLA every step).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from ..attacks.engine import AttackBatch
from ..utils.constants import IGNORE_INDEX, PAD_TOKEN_ID
from ..utils.prompting import pad_batch


def collate(
    frames: List[Dict],
    pad_to: Optional[int] = None,
    model_max_length: int = 2048,
) -> AttackBatch:
    ids = [f["input_ids"] for f in frames]
    labels = [f["labels"] for f in frames]
    if pad_to is not None:
        longest = max(len(s) for s in ids)
        assert longest <= pad_to, f"sequence {longest} exceeds pad_to={pad_to}"
        ids = [np.concatenate([s, np.full(pad_to - len(s), PAD_TOKEN_ID, np.int32)]) for s in ids]
        labels = [
            np.concatenate([s, np.full(pad_to - len(s), IGNORE_INDEX, np.int32)]) for s in labels
        ]
    input_ids = pad_batch(ids, PAD_TOKEN_ID, max_length=model_max_length)
    label_arr = pad_batch(labels, IGNORE_INDEX, max_length=model_max_length)
    attention_mask = (input_ids != PAD_TOKEN_ID).astype(np.int32)
    images = np.stack([f["image"] for f in frames]).astype(np.float32) / 255.0
    return AttackBatch(
        images=images,
        input_ids=input_ids,
        attention_mask=attention_mask,
        labels=label_arr,
    )


def batch_iterator(
    frame_iter: Iterator[Dict],
    batch_size: int,
    pad_to: Optional[int] = 64,
) -> Iterator[AttackBatch]:
    while True:
        yield collate([next(frame_iter) for _ in range(batch_size)], pad_to=pad_to)
