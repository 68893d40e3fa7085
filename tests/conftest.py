"""Test harness config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
xla_force_host_platform_device_count (see SURVEY.md §4); the driver
separately compile-checks the real-device path through __graft_entry__.py.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The environment may register a remote-TPU PJRT plugin ("axon") at
# interpreter startup; initializing it from the test process stalls on the
# device tunnel even when JAX_PLATFORMS=cpu.  Tests are CPU-only by design,
# so drop the factory before any backend is initialized.
import jax  # noqa: E402
from jax._src import xla_bridge  # noqa: E402

jax.config.update("jax_platforms", "cpu")
xla_bridge._backend_factories.pop("axon", None)

