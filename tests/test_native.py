"""Native C++ repack engine vs the numpy reference (byte equality)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.quant import blocks as qb
from zllm.quant import repack as rp


@pytest.fixture(scope="module")
def lib():
    from zllm import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable (no g++?)")
    return native


@pytest.mark.parametrize("fmt,n,k", [
    (GGMLType.Q4_K, 256, 512),
    (GGMLType.Q4_K, 384, 1280),
    (GGMLType.Q8_0, 128, 512),
    (GGMLType.Q4_0, 128, 512),
    (GGMLType.Q6_K, 128, 512),
], ids=lambda v: str(v))
def test_native_matches_numpy(lib, fmt, n, k):
    rng = np.random.default_rng(int(fmt) + n)
    x = rng.standard_normal((n, k), dtype=np.float32)
    raw = qb.quantize(x, fmt)
    ref = rp._REPACK[fmt](raw.reshape(n, -1), n, k, rp.choose_fold(k))

    fold = rp.choose_fold(k)
    got = {
        GGMLType.Q4_K: lambda: lib.repack_q4k(raw, n, k, fold),
        GGMLType.Q8_0: lambda: lib.repack_q8_0(raw, n, k),
        GGMLType.Q4_0: lambda: lib.repack_q4_0(raw, n, k, fold),
        GGMLType.Q6_K: lambda: lib.repack_q6k(raw, n, k, fold),
    }[fmt]()

    assert set(got) == set(ref)
    for key in ref:
        r = np.asarray(ref[key])
        g = got[key]
        np.testing.assert_array_equal(
            r.view(np.uint8) if r.dtype.kind == "f" else r,
            g.view(np.uint8) if g.dtype.kind == "f" else g,
            err_msg=f"{fmt.name}.{key}",
        )
