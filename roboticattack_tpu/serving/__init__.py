"""Serving layer: dynamic request batching over the batch-native decode.

The reference's serving surface is bs=1 `predict_action`
(modeling_prismatic.py:506-534); this package adds what a production robot
fleet needs on TPU: request coalescing into bucketed batch shapes
(DynamicBatcher) over VLAPolicy.get_action_multi's mixed-task batches, and
Jacobi self-speculative drafts (drafts=True / submit_full): clients send the
previous step's tokens back and a correct draft runs the 6-step decode tail
in ONE weight stream (models/decode.py draft_tokens).

Deliberately NOT here — continuous batching / paged KV (vLLM-style): those
exist to fill bubbles left by VARIABLE-length generation. `predict_action`
is a fixed 7-token decode over a fixed-pad prompt, so every request in a
batch finishes on the same step and a static bucketed batch IS the optimal
schedule; slot-level scheduling would add bookkeeping for zero reclaimed
compute. If a future model family generates variable-length outputs,
revisit.
"""

from .batcher import ActResult, DynamicBatcher, default_buckets
from .http import ActionServer, make_server

__all__ = ["ActResult", "ActionServer", "DynamicBatcher", "default_buckets",
           "make_server"]
