"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; following the reference's pattern
of exercising the distributed path locally (SURVEY.md §4), we expose 8 virtual
CPU devices so pjit/shard_map paths compile and run.

Gotcha (load-bearing): this environment's ``sitecustomize.py`` imports jax and
registers the remote-TPU PJRT plugin at interpreter startup, *before* conftest
runs — so ``os.environ["JAX_PLATFORMS"]`` here is too late (jax's config
already read the env) and tests would silently compile over the slow remote
relay.  ``jax.config.update`` after import is the reliable override; the
device-count XLA flag must still be injected before backend initialization,
which has not happened yet at conftest import time.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# ICGAN_TPU_TESTS=1 leaves the ambient (real-TPU) backend in place for the
# `-m tpu` hardware-pin suite (tests/test_tpu_hardware.py); everything else
# runs on the virtual CPU mesh.
if os.environ.get("ICGAN_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
