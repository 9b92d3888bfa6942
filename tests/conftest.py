"""Test harness: force JAX onto a virtual 8-device CPU platform.

Mirrors how the reference fakes heavy deps via module injection
(reference tests/test_asr_server.py:29-72): no TPU, no network, all
numerics run on CPU-XLA, multi-chip sharding tests run against 8 virtual
CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override ambient axon/tpu setting
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("LIVETALKING_LOG", "/tmp/livetalking_test.log")

import jax  # noqa: E402

# The container's sitecustomize pins the ambient TPU platform regardless of
# the env var, so force the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _stop_device_workers():
    """Deterministically stop scheduler/coalescer worker threads at the
    end of the test session: a daemon worker still blocked inside XLA at
    interpreter teardown crashes the C++ layer AFTER the green pytest
    summary ('terminate called ...' / 'FATAL: exception not rethrown').
    Session scope (not per-test): module-scoped fixtures legitimately
    share a running scheduler across tests. The lifecycle atexit hook is
    the backstop for non-pytest entry points."""
    yield
    from livetalking_tpu.utils.lifecycle import stop_all

    stop_all()
