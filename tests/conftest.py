"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without a TPU pod (SURVEY §4 'fake backend' analogue).

The environment's axon TPU plugin registers itself at interpreter startup
(sitecustomize) and overrides JAX_PLATFORMS, so we must both scrub the env
(for subprocesses) and force the platform through jax.config before any
backend is initialized.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""   # stop axon auto-registration
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True)
def _restore_global_jax_config():
    """In-process CLI invocations (cli/train.py:39) set process-global jax
    config (e.g. jax_default_prng_impl=rbg); restore it so later tests see
    the default threefry keys they were written against."""
    impl = jax.config.jax_default_prng_impl
    yield
    if jax.config.jax_default_prng_impl != impl:
        jax.config.update("jax_default_prng_impl", impl)
