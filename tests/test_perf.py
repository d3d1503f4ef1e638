"""Per-phase perf counters + profiler integration (reference:
llama_perf_context, src/llama-context.cpp:558-560)."""

import time


def test_counters_and_report(capsys):
    from zllm.utils.perf import PerfCounters

    pc = PerfCounters()
    with pc.phase("load"):
        time.sleep(0.01)
    with pc.phase("prefill", n=32):
        time.sleep(0.01)
    with pc.phase("decode", n=8):
        time.sleep(0.01)
    assert pc.t_load_ms >= 10 and pc.n_prefill == 32 and pc.n_decode == 8
    text = pc.report()
    assert "prompt eval time" in text and "eval time" in text
    d = pc.as_dict()
    assert d["n_prefill"] == 32


def test_trace_writes_xplane(tmp_path):
    import jax
    import jax.numpy as jnp

    from zllm.utils.perf import annotate, trace

    with trace(str(tmp_path)):
        with annotate("unit-test-region"):
            jnp.sum(jnp.ones((8, 8))).block_until_ready()
    dumped = list(tmp_path.rglob("*.xplane.pb"))
    assert dumped, list(tmp_path.rglob("*"))


def test_trace_noop_without_dir():
    from zllm.utils.perf import trace

    with trace(""):
        pass
