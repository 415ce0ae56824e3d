"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware; set BIGSI_TPU_TEST_REAL_DEVICE=1 to run
on whatever JAX finds (e.g. the real chip).

The harness pre-exports JAX_PLATFORMS=axon (a tunneled TPU) and a
pytest plugin may import jax before this conftest runs, so both the env
var and the live jax config are forced (config update is safe any time
before the backend is first used).
"""

import os

if not os.environ.get("BIGSI_TPU_TEST_REAL_DEVICE"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
