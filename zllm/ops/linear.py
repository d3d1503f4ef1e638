"""Linear-layer dispatch: dense arrays or quantized QTensors.

The QTensor path chooses between the fused Pallas dequant-matmul kernel
(TPU) and the portable dequant-then-matmul jnp fallback (XLA fuses the
dequant into the GEMM's operand read on TPU as well, but materializes on
CPU — the fallback exists for tests and odd shapes)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..quant.repack import QTensor

# toggled by runtime setup; pallas kernels register themselves here
_FUSED_MATMUL = None


def set_fused_matmul(fn):
    """fn(x_2d, qtensor) -> y_2d, or None to disable."""
    global _FUSED_MATMUL
    _FUSED_MATMUL = fn


# decode-path prologue fusions (registered by zllm.ops.qmatmul.install):
# rms-norm-into-matvec and swiglu-into-matvec.  Each hook returns y_2d or
# None when the weight/shape is unsupported (caller falls back).
_FUSED_NORM_MV = None
_FUSED_GLU_MV = None


def set_fused_decode(norm_fn, glu_fn):
    global _FUSED_NORM_MV, _FUSED_GLU_MV
    _FUSED_NORM_MV = norm_fn
    _FUSED_GLU_MV = glu_fn


def fused_norm_linear(x2: jax.Array, wn: jax.Array, eps: float, w):
    """rms_norm(x2, wn, eps) @ w in one kernel, or None (fallback)."""
    if _FUSED_NORM_MV is None or not isinstance(w, QTensor) or x2.shape[0] != 1:
        return None
    return _FUSED_NORM_MV(x2, wn, eps, w)


def fused_glu_linear(gup2: jax.Array, w):
    """swiglu(gup2 halves) @ w in one kernel, or None (fallback)."""
    if _FUSED_GLU_MV is None or not isinstance(w, QTensor) or gup2.shape[0] != 1:
        return None
    return _FUSED_GLU_MV(gup2, w)


def linear(x: jax.Array, w, bias: jax.Array | None = None) -> jax.Array:
    """y = x @ w (+ bias). x: [..., K]; w: QTensor or jax.Array of [K, N]."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    if isinstance(w, QTensor):
        if _FUSED_MATMUL is not None:
            y2 = _FUSED_MATMUL(x2, w)
        else:
            y2 = x2 @ w.dequant(x.dtype)
        if w.psum_axis is not None:
            y2 = lax.psum(y2, w.psum_axis)  # K-sharded: partial sums
        if w.gather_axis is not None:
            y2 = lax.all_gather(y2, w.gather_axis, axis=-1, tiled=True)
    else:
        y2 = x2 @ w.astype(x.dtype)
    y = y2.reshape(*lead, -1)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
