"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/collective paths are
exercised without TPU hardware; set BIGSI_TPU_TEST_REAL_DEVICE=1 to run
on whatever JAX finds (e.g. the real chip).
"""

import os

if not os.environ.get("BIGSI_TPU_TEST_REAL_DEVICE"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
