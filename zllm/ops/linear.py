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
