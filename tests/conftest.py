"""Test configuration: force an 8-device virtual CPU mesh.

JAX multi-device tests use the standard trick of
``--xla_force_host_platform_device_count=8`` on the CPU backend. Some
environments pre-import JAX onto an accelerator platform via
sitecustomize before conftest runs; as long as no backend has been
*initialized* yet, ``jax.config.update("jax_platforms", "cpu")`` still
redirects the process to CPU, and XLA_FLAGS set here is picked up when
the CPU client is created lazily.

Set DQUARTIC_TESTS_ON_DEVICE=1 to run the suite on the real accelerator
instead (single-device tests only).
"""

import os

if not os.environ.get("DQUARTIC_TESTS_ON_DEVICE"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already initialized; tests run where it is
        pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
