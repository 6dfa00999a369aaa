"""Test harness: force an 8-device virtual CPU mesh.

The TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md section 4): all tests run on the host CPU backend with 8 virtual
devices so sharding/collective code paths compile and execute without TPU
hardware. Note: the environment presets JAX_PLATFORMS=axon, which the env
var alone does not override — jax.config.update is required.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
