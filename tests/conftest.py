import os
import sys

# Run all tests on a virtual 8-device CPU mesh so sharding tests work
# without TPU hardware. Must happen before any JAX device use.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    config.addinivalue_line("markers", "reference: golden tests against /root/reference code")
