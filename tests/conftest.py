"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session so that
multi-device sharding tests (DP psum equivalence etc.) work without TPU
hardware. Mirrors the strategy in SURVEY.md §4(d).
"""

import os
import sys

# Overwrite (not setdefault): the session environment pins JAX_PLATFORMS to the
# TPU plugin (and a sitecustomize imports jax at interpreter start, capturing
# it), but tests must run on the virtual CPU mesh — fp32 matmuls on TPU
# silently run at bf16 precision, breaking parity tolerances. Setting both the
# env var and the already-imported config handles either import order.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
