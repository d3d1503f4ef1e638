"""Fused dequant-matmul kernel vs reference dequant matmul
(pattern: reference tests/test-backend-ops.cpp MODE_TEST — every format
x shape grid compared against the reference path with NMSE tolerance).

Runs the Pallas kernel in interpreter mode on the CPU test platform; the
same code compiles for TPU (exercised by bench.py / __graft_entry__.py).
"""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.ops import qmatmul as qmm
from zllm.quant import blocks as qb
from zllm.quant import repack as rp

RNG = np.random.default_rng(11)

FORMATS = sorted(qmm._PLANE_ORDER, key=int)


def nmse(a, b):
    d = np.mean((a - b) ** 2)
    s = np.mean(b**2) + 1e-12
    return float(d / s)


@pytest.mark.parametrize("fmt", FORMATS, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [1, 8])
def test_kernel_matches_reference(fmt, m):
    import jax.numpy as jnp

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
    assert qmm.supports(qt), f"{fmt.name} k={k} should be supported"

    x = RNG.standard_normal((m, k)).astype(np.float32)
    ref = np.asarray(x.astype(np.float32) @ np.asarray(qt.dequant(jnp.float32)))
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt, interpret=True))

    assert got.shape == (m, n)
    # kernel computes in bf16; reference in f32 — NMSE bound accounts for it
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


def test_fallback_path_small_k():
    """K not foldable to >=256 -> clean fallback to dequant matmul."""
    import jax.numpy as jnp

    k, n = 64, 128
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    assert not qmm.supports(qt)
    x = RNG.standard_normal((4, k)).astype(np.float32)
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt))
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    assert nmse(got, ref) < 1e-6


def test_kernel_exact_scales():
    """With power-of-two-friendly data the bf16 path should be very close."""
    import jax.numpy as jnp

    k, n = 512, 128
    w = (RNG.integers(-8, 8, (n, k)) * 0.25).astype(np.float32)
    qt = rp.repack(qb.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    x = RNG.standard_normal((2, k)).astype(np.float32)
    got = np.asarray(qmm.qmatmul(jnp.asarray(x), qt, interpret=True))
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    assert nmse(got, ref) < 5e-5


@pytest.mark.parametrize("fmt", [f for f in FORMATS if f in qmm._INT_FMT], ids=lambda t: t.name)
def test_w4a8_matches_bf16_path(fmt):
    """The int8-MXU decode path vs the bf16 dequant path vs f32 reference
    (reference analogue: mmvq.cu int8 GEMV == dequant matmul)."""
    import jax.numpy as jnp

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
    x = RNG.standard_normal((1, k)).astype(np.float32)
    ref = np.asarray(x @ np.asarray(qt.dequant(jnp.float32)))
    got = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    assert got.shape == (1, n)
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


def test_w4a8_integer_products_exact():
    """With activations already on the int8 grid and unit scales, the int
    path must be exact (validates the block-diagonal MXU formulation)."""
    import jax.numpy as jnp

    k, n = 512, 128
    # weights whose dequant is integer-valued: Q8_0 with d=1 blocks
    q = RNG.integers(-100, 100, (n, k)).astype(np.int8)
    import zllm.quant.blocks as qbl
    w = q.astype(np.float32)
    qt = rp.repack(qbl.quantize(w, GGMLType.Q8_0), (n, k), GGMLType.Q8_0)
    # activations exactly representable on the int8 grid: integer values
    # with every group-32 max pinned to 127 so dx == 1.0
    x = RNG.integers(-126, 127, (1, k)).astype(np.float32)
    x[0, ::32] = 127.0
    ref = x @ np.asarray(qt.dequant(jnp.float32))
    got = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    # integer partial products are exact; only f32 summation order differs
    # (tile-dependent: qtune may pick a different TK -> different grouping)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("fmt", sorted(qmm._DUALDOT_FMTS, key=int), ids=lambda t: t.name)
def test_dualdot_matches_plain_w4a8(fmt, monkeypatch):
    """The packed-byte dual-dot kernel must agree with the unpacking int8
    path to summation-order tolerance (both pipelines are integer-exact
    before the f32 epilogue)."""
    import jax.numpy as jnp

    k, n = 512, 256
    w = RNG.standard_normal((n, k)).astype(np.float32)
    qt = rp.repack(qb.quantize(w, fmt), (n, k), fmt)
    x = RNG.standard_normal((1, k)).astype(np.float32)
    monkeypatch.setenv("ZLLM_QMM_DUALDOT", "1")
    y_dd = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    monkeypatch.setenv("ZLLM_QMM_DUALDOT", "0")
    y_std = np.asarray(qmm.qmatmul_w4a8(jnp.asarray(x), qt, interpret=True))
    np.testing.assert_allclose(y_dd, y_std, rtol=1e-5, atol=1e-4)


# ---------------------------------------------------------------------------
# tile selection (zllm/ops/qtune.py)
# ---------------------------------------------------------------------------


def test_qtune_candidates_feasible():
    from zllm.ops import qtune

    for k, n, fold in ((2048, 2560, 256), (5632, 2048, 256), (1024, 4096, 32)):
        cands = qtune.candidates(k, n, fold)
        assert cands, (k, n, fold)
        for tn, tk in cands:
            assert n % tn == 0 and k % tk == 0 and tk % fold == 0


def test_qtune_lookup_table_and_heuristic(tmp_path, monkeypatch):
    from zllm.ops import qtune

    monkeypatch.setenv("ZLLM_QMM_TILES", str(tmp_path / "tiles.json"))
    qtune._table = None
    # builtin table hit
    assert qtune.lookup("Q4_K", 2048, 2048, 256) == (1024, 1024, 1)
    # heuristic fallback: divisibility invariants hold for an unknown shape
    tn, tk, fuse = qtune.lookup("Q4_K", 1792, 896, 256)
    assert 896 % tn == 0 and 1792 % tk == 0 and tk % 256 == 0
    # autotuned entries override the builtin table
    path = qtune.save({("Q4_K", 2048, 2048): (512, 512)})
    assert path == str(tmp_path / "tiles.json")
    assert qtune.lookup("Q4_K", 2048, 2048, 256) == (512, 512, 1)
    qtune._table = None


def test_w4a8_matches_with_tuned_tiles(tmp_path, monkeypatch):
    """qmatmul_w4a8 stays correct when the tile table dictates the tiling."""
    import json

    import jax.numpy as jnp

    from zllm.ops import qmatmul, qtune

    k, n = 512, 256
    monkeypatch.setenv("ZLLM_QMM_TILES", str(tmp_path / "tiles.json"))
    monkeypatch.delenv("ZLLM_QMM_TN", raising=False)
    monkeypatch.delenv("ZLLM_QMM_TK_MULT", raising=False)
    qtune._table = None
    (tmp_path / "tiles.json").write_text(json.dumps({f"Q4_K,{k},{n}": [128, 512]}))
    try:
        rng = np.random.default_rng(7)
        w = rng.standard_normal((n, k)).astype(np.float32)
        raw = qb.quantize(w, GGMLType.Q4_K)
        qt = rp.repack(raw, (n, k), GGMLType.Q4_K)
        x = jnp.asarray(rng.standard_normal((1, k)).astype(np.float32)).astype(jnp.bfloat16)
        got = np.asarray(qmatmul.qmatmul_w4a8(x, qt, interpret=True))
        ref = np.asarray(x.astype(jnp.float32)) @ qb.dequantize(raw, GGMLType.Q4_K).reshape(n, k).T
        rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-6)
        assert rel.max() < 0.05
    finally:
        qtune._table = None


# ---------------------------------------------------------------------------
# decode-path prologue fusions (norm-into-matvec, swiglu-into-matvec)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("fmt", [GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q8_0],
                         ids=lambda t: t.name)
def test_w4a8_norm_fused_matches_oracle(fmt):
    """RMS-norm fused into the matvec prologue == norm-then-matmul."""
    import jax.numpy as jnp

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
    x = RNG.standard_normal((1, k)).astype(np.float32)
    wn = (1.0 + 0.1 * RNG.standard_normal(k)).astype(np.float32)
    eps = 1e-5
    xn = x * (1.0 / np.sqrt(np.mean(x * x) + eps)) * wn
    ref = xn @ np.asarray(qt.dequant(jnp.float32))
    got = np.asarray(
        qmm.qmatvec_norm(jnp.asarray(x), jnp.asarray(wn), eps, qt, interpret=True)
    )
    assert got.shape == (1, n)
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


@pytest.mark.parametrize("fmt", [GGMLType.Q4_K, GGMLType.Q6_K],
                         ids=lambda t: t.name)
def test_w4a8_glu_fused_matches_oracle(fmt):
    """swiglu fused into the down-matvec prologue == silu(g)*u then matmul."""
    import jax.numpy as jnp

    from zllm.testing import make_quantized_raw

    k, n = 512, 256
    qt = rp.repack(make_quantized_raw(fmt, n, k, RNG), (n, k), fmt)
    gup = RNG.standard_normal((1, 2 * k)).astype(np.float32)
    g, u = gup[:, :k], gup[:, k:]
    gu = g * (1.0 / (1.0 + np.exp(-g))) * u
    ref = gu @ np.asarray(qt.dequant(jnp.float32))
    got = np.asarray(qmm.qmatvec_glu(jnp.asarray(gup), qt, interpret=True))
    assert got.shape == (1, n)
    assert nmse(got, ref) < 2e-4, f"{fmt.name}: nmse {nmse(got, ref)}"


def test_fused_decode_forward_parity(tmp_path):
    """A t=1 decode step with the fused-prologue hooks installed (qkv-norm,
    ffn-norm+glu, head-norm fusions in models/llama.py) matches the plain
    path on a loader-built model."""
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.ops import linear as linmod
    from zllm.ops import qmatmul
    from zllm.runtime.kvcache import KVCache
    from zllm.testing import make_llama_gguf

    p = str(tmp_path / "m.gguf")
    make_llama_gguf(p, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=512, vocab_size=256, gtype=GGMLType.Q4_K)
    m = Model.load(p, quantized=True, dtype=jnp.float32)
    cfg = m.cfg
    assert "wqkv" in m.params["layers"][0] and "ffn_gateup" in m.params["layers"][0]

    toks = jnp.asarray(RNG.integers(0, cfg.vocab_size, (1, 4)).astype(np.int32))
    pos = jnp.arange(4, dtype=jnp.int32).reshape(1, 4)

    def run():
        kv = KVCache.create(cfg.n_layers, 1, 16, cfg.n_kv_heads, cfg.head_dim, jnp.float32)
        _, kv = forward(m.params, cfg, toks, pos, kv)
        tok1 = toks[:, -1:]
        pos1 = jnp.full((1, 1), 4, jnp.int32)
        logits, _ = forward(m.params, cfg, tok1, pos1, kv, logits_for="last")
        return np.asarray(logits)

    ref = run()
    qmatmul.install(interpret=True)
    try:
        got = run()
    finally:
        linmod.set_fused_matmul(None)
        linmod.set_fused_decode(None, None)
    assert nmse(got, ref) < 2e-4, f"nmse {nmse(got, ref)}"
