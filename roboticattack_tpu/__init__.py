"""roboticattack_tpu: TPU-native adversarial-patch attack framework for
vision-language-action policies (OpenVLA), built on JAX/XLA/Pallas/pjit.

Capability-equivalent rebuild of `William-wAng618/roboticAttack` (ICCV 2025),
re-architected TPU-first: the whole attack step — differentiable patch
compositing + geometric augmentation + dual normalization + frozen-VLM fwd/bwd
+ AdamW update + metrics — compiles into a single XLA program, with data
parallelism expressed as sharded batches over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
