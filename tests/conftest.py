"""Test configuration.

Forces JAX onto the host CPU platform with 8 virtual devices so that
multi-chip sharding tests get real multi-device semantics without TPU
hardware (same trick the driver uses for dryrun_multichip).

This image injects a sitecustomize (via PYTHONPATH -> /root/.axon_site)
that imports jax and registers the TPU 'axon' PJRT plugin in *every*
python process at startup, so merely setting JAX_PLATFORMS here is too
late.  jax is however only *registered*, not initialized, so
jax.config.update() still redirects everything to CPU as long as it runs
before any backend client is created — which this conftest guarantees by
being the first test-session import.
"""

import os
import sys

# must precede backend creation: virtual 8-device CPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# keep subprocesses (and any late transformers import) off TF/TPU paths
os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_FLAX", "0")

import jax  # noqa: E402  (already imported by sitecustomize anyway)

jax.config.update("jax_platforms", "cpu")
# XLA runs f32 matmuls at reduced precision by default (~1e-3 rel err),
# which would mask real bugs in parity tests
jax.config.update("jax_default_matmul_precision", "highest")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The reference's gguf-py (pure numpy) serves as the bit-exactness oracle for
# our GGUF/quant codecs when the reference checkout is available.
_ORACLE = "/root/reference/gguf-py"
if os.path.isdir(_ORACLE) and _ORACLE not in sys.path:
    sys.path.append(_ORACLE)

import pytest  # noqa: E402


def subprocess_env() -> dict:
    """Environment for helper subprocesses: drop the sitecustomize hook so
    they don't import jax / dial the TPU relay at startup."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


@pytest.fixture(scope="session")
def oracle_gguf():
    """The reference gguf-py package, or skip if unavailable."""
    try:
        import gguf  # type: ignore

        return gguf
    except ImportError:
        pytest.skip("reference gguf-py oracle not available")
