"""Test harness config: force CPU JAX with 8 virtual devices for mesh tests.

Must run before the first ``import jax`` anywhere in the test session.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The TPU ("axon") PJRT plugin ignores JAX_PLATFORMS; force the CPU backend
# through the config API before any backend is initialised.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# The reference implementation (read-only) is imported by parity tests as a
# golden oracle; it is NEVER imported by the framework itself.
REFERENCE_ROOT = "/root/reference/LiDARGen"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
