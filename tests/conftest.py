import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Tests run on the CPU backend with a virtual 8-device mesh so the
# multi-chip sharding path is exercised without TPU hardware, and with
# x64 enabled for the exact integer closed forms in render_jnp.
# jax may already be imported by the environment's sitecustomize, so a
# plain env-var is not enough — use config.update before any backend is
# initialized.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# OSMR_TEST_TPU=1 leaves the environment's real backend (JAX_PLATFORMS)
# in place so the hardware-gated kernel-parity tests (e.g. the Pallas
# RLE emitters in test_rle.py) actually run instead of skipping; the
# default test run forces CPU + x64 for the exact integer closed forms.
if not os.environ.get("OSMR_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

REFERENCE_DIR = os.environ.get("OSMR_REFERENCE_DIR", "/root/reference")


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_DIR, *parts)


def pytest_collection_modifyitems(config, items):
    """Mark the interpret-mode device-parity modules `slow` so the
    per-commit loop can run `pytest -m "not slow"` (~2 min) and leave
    the full parity sweep (~25 min: Mosaic interpret + e2e goldens) to
    pre-merge runs.  No test is skipped by default.

    Under OSMR_TEST_TPU=1 the suite runs on the real backend WITHOUT
    the x64 pin, which silently changes numerics for every test that
    relies on exact x64 integer closed forms — so in that mode only
    tests explicitly marked `tpu_hw` (written for real-TPU numerics)
    are run; everything else is skipped, not silently degraded."""
    import pytest

    slow_modules = {"test_pallas", "test_drawer_e2e", "test_parallel", "test_arena"}
    for item in items:
        if item.module.__name__.split(".")[-1] in slow_modules:
            item.add_marker(pytest.mark.slow)

    if os.environ.get("OSMR_TEST_TPU"):
        skip = pytest.mark.skip(
            reason="OSMR_TEST_TPU=1 drops the CPU+x64 pin; this test's "
            "numerics assume it (only tpu_hw-marked tests run)"
        )
        for item in items:
            if "tpu_hw" not in item.keywords:
                item.add_marker(skip)
