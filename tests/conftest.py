"""Test env: force CPU with 8 virtual devices BEFORE jax import.

SURVEY.md §4.4 — multi-device tests on one host via
--xla_force_host_platform_device_count; also keeps unit tests off the slow
axon simulator (device parity is covered by bench.py / __graft_entry__.py).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
