"""Serving layer: dynamic request batching over the batch-native decode.

The reference's serving surface is bs=1 `predict_action`
(modeling_prismatic.py:506-534); this package adds what a production robot
fleet needs on TPU: request coalescing into bucketed batch shapes
(DynamicBatcher) over VLAPolicy.get_action_multi's mixed-task batches.
"""

from .batcher import DynamicBatcher, default_buckets
from .http import ActionServer, make_server

__all__ = ["ActionServer", "DynamicBatcher", "default_buckets", "make_server"]
