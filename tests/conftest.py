"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths (data-parallel mesh) are exercised without TPU hardware.

NOTE: in this environment a sitecustomize force-registers the TPU ('axon')
backend in every process and ignores the JAX_PLATFORMS env var, so the env
var alone is NOT enough — jax.config.update('jax_platforms', 'cpu') after
import is what actually pins the CPU backend.  XLA_FLAGS must still be set
before the backend initializes to get the 8 virtual devices.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from depthinspace_tpu.utils.jaxcfg import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
