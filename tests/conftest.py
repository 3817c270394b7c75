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
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    # Backend opt level 0 skips XLA:CPU's expensive LLVM passes: measured
    # 2.5x faster cold compiles (test_models.py 306 s -> 122 s on the
    # 1-core bench host) and no execution-time regression at the suite's
    # tiny shapes — the tests check numerics/semantics, not CPU codegen.
    # TPU runs (DQUARTIC_TESTS_ON_DEVICE=1) keep full optimization.
    if "xla_backend_optimization_level" not in flags:
        flags = (flags + " --xla_backend_optimization_level=0").strip()
    os.environ["XLA_FLAGS"] = flags
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # backend already initialized; tests run where it is
        pass

import jax  # noqa: E402

# Persistent compilation cache: repeat suite runs skip recompiles entirely
# (first full run pays ~minutes of XLA compiles; later runs are seconds).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_CACHE_DIR", "/tmp/dquartic_jax_cache"),
    )
    # 0.0: cache EVERY compiled program — the suite compiles hundreds of
    # sub-second programs whose recompiles otherwise add up on warm runs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Modules whose tests form the <60 s smoke tier (`pytest -m fast`).
# Everything else (multi-second XLA compiles: full models, trainer E2E,
# sharded meshes, torch compat) is auto-marked `slow`.
_FAST_MODULES = {
    "test_schedules",
    "test_diffusion",
    "test_dataset",
    "test_sqmass_slices",
    "test_native",
    "test_utils",
    "test_ops",
    "test_fourier",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker("fast" if mod in _FAST_MODULES else "slow")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
