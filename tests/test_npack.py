"""npack (N-major packed-byte) layout: dual-dot decode kernel, prefill
GEMM, dequant fallback, loader integration, and shard_params inversion.
Reference capability being accelerated: ggml-cuda/mmvq.cu decode at memory
bandwidth — here by feeding the MXU packed bytes with no nibble unpack."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zllm.gguf.constants import GGMLType
from zllm.ops import qmatmul as qmm
from zllm.quant import blocks as qb
from zllm.quant.repack import can_npack, from_npack, repack, to_npack

FMTS = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q4_K,
        GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K]
Q5_FMTS = {GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q5_K}
K, N = 512, 512


def _qt(fmt, npack=True, k=K, n=N, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((n, k)).astype(np.float32)
    raw = qb.quantize(w, fmt)
    qt = repack(raw, (n, k), fmt)
    return to_npack(qt) if npack else qt


@pytest.mark.parametrize("fmt", FMTS, ids=lambda t: t.name)
def test_npack_roundtrip(fmt):
    """to_npack/from_npack invert; dequant matches the split-half layout."""
    qt = _qt(fmt, npack=False)
    nqt = to_npack(qt)
    assert nqt.npack and not qt.npack
    np.testing.assert_array_equal(np.asarray(qt.dequant()), np.asarray(nqt.dequant()))
    back = from_npack(nqt)
    np.testing.assert_array_equal(np.asarray(back.planes["qs"]),
                                  np.asarray(qt.planes["qs"]))


@pytest.mark.parametrize("fmt", FMTS, ids=lambda t: t.name)
def test_npack_decode_matvec(fmt):
    """Dual-dot decode == the split-half unpack kernel (same activation
    quantization, same scale algebra -> float-exact), and sane vs the
    continuous dequant oracle (int8-activation error only)."""
    qt = _qt(fmt, npack=False)
    nqt = to_npack(qt)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    a = np.asarray(qmm.qmatmul_w4a8(x, qt, interpret=True))
    b = np.asarray(qmm.qmatmul_w4a8(x, nqt, interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
    want = np.asarray(x @ nqt.dequant())
    np.testing.assert_allclose(b, want, rtol=0.2, atol=0.5)


@pytest.mark.parametrize("fmt", FMTS, ids=lambda t: t.name)
def test_npack_prefill_gemm(fmt):
    nqt = _qt(fmt)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((8, K)).astype(np.float32))
    want = np.asarray(x @ nqt.dequant())
    got = np.asarray(qmm.qmatmul(x, nqt, interpret=True))
    # bf16 MXU dots vs the f32 oracle matmul
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=0.25)


def test_npack_fused_norm_and_glu():
    """Fused prologue variants match the split-half fused kernels (exact:
    identical prologue, quantization, and scale algebra)."""
    qt = _qt(GGMLType.Q4_K, npack=False)
    nqt = to_npack(qt)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((K,)).astype(np.float32))
    eps = 1e-5
    want = np.asarray(qmm.qmatvec_norm(x, wn, eps, qt, interpret=True))
    got = np.asarray(qmm.qmatvec_norm(x, wn, eps, nqt, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    gup = jnp.asarray(rng.standard_normal((1, 2 * K)).astype(np.float32))
    want = np.asarray(qmm.qmatvec_glu(gup, qt, interpret=True))
    got = np.asarray(qmm.qmatvec_glu(gup, nqt, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_can_npack_gates():
    qt = _qt(GGMLType.Q4_K, npack=False)
    assert can_npack(qt)
    assert not can_npack(qt.with_collectives(psum_axis="tp"))
    qt2 = _qt(GGMLType.Q4_K, npack=False, n=384)  # N % 256 != 0
    assert not can_npack(qt2)
    q8 = _qt(GGMLType.Q8_0, npack=False) if False else None
    from zllm.quant.repack import NPACK_FORMATS
    assert GGMLType.Q8_0 not in NPACK_FORMATS


def test_loader_applies_npack_and_model_runs(tmp_path):
    """Model.load converts eligible tensors; greedy output identical with
    and without npack."""
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.quant.repack import QTensor
    from zllm.testing import make_llama_gguf

    path = str(tmp_path / "np.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=512, vocab_size=512, gtype=GGMLType.Q4_K)
    m_np = Model.load(path, quantized=True, dtype=jnp.float32)
    m_sp = Model.load(path, quantized=True, dtype=jnp.float32, npack=False)
    qts = [w for layer in m_np.params["layers"] for w in layer.values()
           if isinstance(w, QTensor)]
    assert any(q.npack for q in qts), "no tensor got the npack layout"

    toks = jnp.asarray(np.random.default_rng(5).integers(0, 512, (1, 8)).astype(np.int32))
    pos = jnp.broadcast_to(jnp.arange(8), (1, 8))
    lg_np = forward(m_np.params, m_np.cfg, toks, pos, None)[0]
    lg_sp = forward(m_sp.params, m_sp.cfg, toks, pos, None)[0]
    np.testing.assert_allclose(np.asarray(lg_np), np.asarray(lg_sp),
                               rtol=2e-4, atol=2e-4)


def test_shard_params_unpacks_npack(tmp_path):
    """TP sharding must not slice a packed plane across the pairing."""
    from zllm.models.loader import Model
    from zllm.parallel import make_mesh, shard_params
    from zllm.quant.repack import QTensor
    from zllm.testing import make_llama_gguf

    path = str(tmp_path / "np2.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=1024, vocab_size=512, gtype=GGMLType.Q4_K)
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    mesh = make_mesh(jax.devices()[:2], dp=1, tp=2)
    params, specs, plan = shard_params(m.params, mesh, m.cfg)
    qts = [w for layer in params["layers"] for w in layer.values()
           if isinstance(w, QTensor)]
    assert qts and all(not q.npack for q in qts)


@pytest.mark.parametrize("fmt", FMTS, ids=lambda t: t.name)
@pytest.mark.parametrize("fuse", ["q", "norm", "glu"])
def test_npack_hbm_kernel_parity(fmt, fuse):
    """The HBM-pinned in-kernel-DMA variant (ZLLM_QMM_HBM=1 experiment)
    is bit-identical to the auto-pipelined npack kernel for every fused
    prologue."""
    if fmt in Q5_FMTS:
        pytest.skip("Q5 bit-plane not wired into the HBM DMA-chain variant")
    nqt = _qt(fmt)
    rng = np.random.default_rng(5)
    names = qmm._plane_names(nqt)
    diet = names is qmm._Q4K_DIET
    pt = tuple(qmm._plane_view(nqt, nm) for nm in names)
    kw = dict(fmt=nqt.fmt, fold=nqt.fold, k=K, n=N, tn=256, tk=256,
              fuse=fuse, diet=diet, interpret=True)
    if fuse == "norm":
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        wn = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        a = qmm._qmm_w4a8np_call(x, wn, pt, eps=1e-5, **kw)
        b = qmm._qmm_w4a8np_hbm_call(x, wn, pt, eps=1e-5, **kw)
    elif fuse == "glu":
        gup = jnp.asarray(rng.standard_normal((1, 2 * K)).astype(np.float32))
        a = qmm._qmm_w4a8np_call(gup, None, pt, **kw)
        b = qmm._qmm_w4a8np_hbm_call(gup, None, pt, **kw)
    else:
        x = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
        a = qmm._qmm_w4a8np_call(x, None, pt, **kw)
        b = qmm._qmm_w4a8np_hbm_call(x, None, pt, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
