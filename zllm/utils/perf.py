"""Per-phase performance counters + profiler integration.

The analogue of the reference's llama_perf_context (reference:
src/llama-context.cpp:558-560 t_load/t_p_eval/t_eval counters printed by
llama_perf_context_print, include/llama.h perf section) plus the
device-level tracer the reference lacks: `trace(dir)` wraps a region in
jax.profiler so kernel-level timelines land in TensorBoard format, and
`annotate(name)` opens a named TraceAnnotation visible in those traces
(the counterpart of per-node timing in test-backend-ops MODE_PERF).
"""

from __future__ import annotations

import contextlib
import sys
import time
from dataclasses import dataclass, field


@dataclass
class PerfCounters:
    """Wall-clock per phase; mirror of llama_perf_context_data."""

    t_load_ms: float = 0.0
    t_prefill_ms: float = 0.0
    n_prefill: int = 0
    t_decode_ms: float = 0.0
    n_decode: int = 0
    t_sample_ms: float = 0.0
    n_sample: int = 0
    t_start: float = field(default_factory=time.perf_counter)

    @contextlib.contextmanager
    def phase(self, name: str, n: int = 0):
        t0 = time.perf_counter()
        yield
        ms = (time.perf_counter() - t0) * 1e3
        if name == "load":
            self.t_load_ms += ms
        elif name == "prefill":
            self.t_prefill_ms += ms
            self.n_prefill += n
        elif name == "decode":
            self.t_decode_ms += ms
            self.n_decode += n
        elif name == "sample":
            self.t_sample_ms += ms
            self.n_sample += n

    def report(self, file=None) -> str:
        """llama_perf_context_print-shaped summary."""
        file = file or sys.stderr
        lines = []
        if self.t_load_ms:
            lines.append(f"load time = {self.t_load_ms:10.2f} ms")
        if self.n_prefill:
            lines.append(
                f"prompt eval time = {self.t_prefill_ms:10.2f} ms / {self.n_prefill:5d} tokens"
                f" ({self.t_prefill_ms / max(self.n_prefill, 1):8.2f} ms per token,"
                f" {self.n_prefill / (self.t_prefill_ms / 1e3 + 1e-9):8.2f} tokens per second)"
            )
        if self.n_decode:
            lines.append(
                f"eval time = {self.t_decode_ms:10.2f} ms / {self.n_decode:5d} runs  "
                f" ({self.t_decode_ms / max(self.n_decode, 1):8.2f} ms per token,"
                f" {self.n_decode / (self.t_decode_ms / 1e3 + 1e-9):8.2f} tokens per second)"
            )
        if self.n_sample:
            lines.append(
                f"sample time = {self.t_sample_ms:10.2f} ms / {self.n_sample:5d} runs  "
                f" ({self.t_sample_ms / max(self.n_sample, 1):8.2f} ms per token)"
            )
        total = (time.perf_counter() - self.t_start) * 1e3
        lines.append(f"total time = {total:10.2f} ms")
        text = "\n".join("zllm_perf: " + ln for ln in lines)
        print(text, file=file)
        return text

    def as_dict(self) -> dict:
        return {
            "t_load_ms": round(self.t_load_ms, 2),
            "t_prefill_ms": round(self.t_prefill_ms, 2),
            "n_prefill": self.n_prefill,
            "t_decode_ms": round(self.t_decode_ms, 2),
            "n_decode": self.n_decode,
            "t_sample_ms": round(self.t_sample_ms, 2),
            "n_sample": self.n_sample,
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler region trace -> TensorBoard/xplane dump under
    `log_dir` (no-op when log_dir is falsy).  View with tensorboard or
    xprof; captures per-kernel device timelines."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a profiler trace (eval-callback analogue at
    trace granularity)."""
    try:
        import jax

        ctx = jax.profiler.TraceAnnotation(name)
    except Exception:  # profiler unavailable: stay silent
        yield
        return
    with ctx:
        yield
