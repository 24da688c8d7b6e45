import os

# Run the test suite on CPU with 8 virtual devices so sharding tests work
# without TPU hardware.  The environment may pre-register an accelerator
# platform and force-select it via jax.config, so the config update below (not
# just the env var) is required.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("MANSY_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE_DATA = os.environ.get("MANSY_DATA_DIR", "/root/reference/datasets")


def has_reference_data() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DATA, "Jin2022"))


requires_data = pytest.mark.skipif(
    not has_reference_data(), reason="reference dataset tree not available")
