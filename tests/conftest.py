"""Test harness: force CPU backend with 8 virtual devices so sharding tests
run without TPU hardware, and enable x64 for high-precision golden checks."""
import os

# The session env sets JAX_PLATFORMS=axon (TPU tunnel); tests must run on the
# host CPU backend with virtual devices, so hard-override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup and forces
# jax_platforms="axon,cpu" (overriding the env var above), so the backend
# must be re-pinned to CPU after import and any initialized backends
# dropped.
if "cpu" != jax.config.jax_platforms:
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass

jax.config.update("jax_enable_x64", True)
# (a persistent XLA:CPU compile cache was tried here and reverted: AOT
# entries are machine-feature-pinned — reloading them on a slightly
# different host risks SIGILL and it bought no wall time on this suite)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
