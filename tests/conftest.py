"""Test configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that
multi-chip sharding tests get real multi-device semantics without TPU
hardware (same trick the driver uses for dryrun_multichip).  Must run
before jax is imported anywhere.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The reference's gguf-py (pure numpy) serves as the bit-exactness oracle for
# our GGUF/quant codecs when the reference checkout is available.
_ORACLE = "/root/reference/gguf-py"
if os.path.isdir(_ORACLE) and _ORACLE not in sys.path:
    sys.path.append(_ORACLE)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def oracle_gguf():
    """The reference gguf-py package, or skip if unavailable."""
    try:
        import gguf  # type: ignore

        return gguf
    except ImportError:
        pytest.skip("reference gguf-py oracle not available")
