"""Test configuration.

Tests run on host CPU with an 8-device virtual mesh so sharding paths are
exercised without TPU hardware (SURVEY.md par. 4: multi-host tests via
xla_force_host_platform_device_count).

The ambient container environment routes *all* JAX compilation through the
axon TPU tunnel (sitecustomize registers a PJRT plugin + remote-compile hook
at interpreter startup, gated on PALLAS_AXON_POOL_IPS), which intermittently
blocks even CPU-only work for minutes. That hook is active before conftest
ever runs, so the only reliable escape is to re-exec the test process with a
cleaned environment. pytest has already fd-captured stdout/stderr by the time
conftest loads, so the capture manager must be torn down first or the child's
output lands in a deleted temp file.

x64 is enabled so float64 reference checks (numeric-diff Jacobians,
dense-vs-Schur solves) are meaningful; engine code uses explicit float32
dtypes throughout, so this only widens test-side reference computations.
"""

import os
import sys

_NEEDS_REEXEC = (
    bool(os.environ.get("PALLAS_AXON_POOL_IPS"))
    and os.environ.get("_SDSO_TEST_REEXEC") != "1"
)

if not _NEEDS_REEXEC:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_enable_x64", True)
    # NOTE: do not enable the persistent compilation cache here — the
    # cache-write path intermittently segfaults the XLA CPU compiler in this
    # jaxlib build (observed under tests/test_long_run.py).

import numpy as np
import pytest

@pytest.hookimpl(tryfirst=True)
def pytest_configure(config):
    if _NEEDS_REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            try:
                capman.stop_global_capturing()
            except Exception:
                pass
        env = dict(os.environ)
        env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize no-ops without this
        env["PALLAS_AXON_REMOTE_COMPILE"] = "0"
        env["JAX_PLATFORMS"] = "cpu"
        env["_SDSO_TEST_REEXEC"] = "1"
        os.execve(
            sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
        )
    config.addinivalue_line(
        "markers",
        "slow: long end-to-end tests; deselect with -m 'not slow' for the "
        "fast tier (full suite stays the CI gate)",
    )


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
