"""Test env: force CPU with 8 virtual devices (SURVEY.md §4.4).

The session's sitecustomize (PYTHONPATH=/root/.axon_site) imports jax and
registers the axon TPU backend at interpreter startup, BEFORE any conftest
runs — so setting JAX_PLATFORMS here is too late as an env var. What still
works: append --xla_force_host_platform_device_count to XLA_FLAGS before
the CPU backend is first initialised, then flip platforms with
jax.config.update. Unit tests then run on an 8-device CPU mesh instead of
the slow axon simulator; on-device parity is covered by bench.py and
__graft_entry__.py. REPKILLER_TEST_PLATFORM=axon escapes the hatch.
"""

import os

_platform = os.environ.get("REPKILLER_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (sitecustomize has usually imported it already)

jax.config.update("jax_platforms", _platform)
