"""Root pytest config: force tests onto a virtual 8-device CPU mesh.

TPU hardware is reserved for benchmarking; unit/integration tests must be
hermetic and exercise multi-chip sharding logic without real chips, which JAX
supports via XLA's host-platform device-count override.

Note: the ambient environment registers a remote TPU PJRT plugin via
sitecustomize *and* overrides platform selection, so setting JAX_PLATFORMS
alone is not enough — we must also update jax.config after import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
