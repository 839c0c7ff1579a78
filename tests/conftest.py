"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session so that
multi-device sharding tests (DP psum equivalence etc.) work without TPU
hardware. Mirrors the strategy in SURVEY.md §4(d).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
