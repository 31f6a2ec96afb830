"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding paths are validated on virtual CPU devices
(`--xla_force_host_platform_device_count=8`); real-TPU benchmarking happens
in bench.py, not in the test suite.

The container's sitecustomize registers the TPU PJRT plugin before conftest
runs, so we must both (a) append the host-device-count XLA flag before the
CPU client initializes and (b) select the cpu platform via jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent per-machine XLA compile cache (the device-prover suite
# compiles many shape-specialized kernels) + mmap headroom for XLA:CPU.
from leanmultisig_tpu.utils.xla_cache import (configure_persistent_cache,  # noqa: E402
                                              raise_map_count)

configure_persistent_cache()
raise_map_count()
