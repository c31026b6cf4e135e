import os
import sys

# Tests run on the CPU backend with a virtual 8-device mesh so that the
# multi-chip sharding path is exercised without TPU hardware.  Real-TPU
# benchmarking goes through bench.py, which does not import this conftest.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_DIR = os.environ.get("OSMR_REFERENCE_DIR", "/root/reference")


def reference_path(*parts: str) -> str:
    return os.path.join(REFERENCE_DIR, *parts)
