"""Test harness config: force CPU with an 8-device virtual mesh.

Multi-chip sharding logic is tested on a fake-device CPU mesh
(--xla_force_host_platform_device_count), mirroring how the driver
dry-runs the multi-chip path.

The environment may inject a TPU PJRT plugin via a sitecustomize on
PYTHONPATH that imports jax *before* any conftest runs, so an in-process
environ tweak is too late — instead we re-exec pytest once with a clean
CPU environment (marker APF_TESTS_REEXEC guards recursion).
"""

import os
import sys

_MARK = "APF_TESTS_REEXEC"


def _needs_reexec() -> bool:
    if os.environ.get(_MARK):
        return False
    if os.environ.get("JAX_PLATFORMS", "") not in ("", "cpu"):
        return True
    # A sitecustomize-injected PJRT plugin hijacks the backend even when
    # JAX_PLATFORMS is unset.
    return any("axon" in p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep))


if _needs_reexec():
    env = dict(os.environ)
    env[_MARK] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p)
    flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
