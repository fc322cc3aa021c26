"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding/collective tests use
XLA's host-platform device-count override (the standard JAX testing recipe).
Benchmarks on the real TPU chip live in bench.py, not in this suite.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU tunnel
# persistent compile cache: repeat suite runs skip XLA:CPU recompiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already in the environment, so the env override above is
# too late for the config default — force it through the config API too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # float64 oracle comparisons
