"""Continuous-batching engine over recurrent-memory models (mamba, rwkv6).

The reference serves recurrent models through the same server slots as
attention models (src/llama-memory-recurrent.cpp behind the common
llama_memory_i).  Checks that concurrent slots produce exactly the tokens
a lone greedy decode produces — i.e. the per-row `lengths` masking keeps
one slot's prefill from corrupting another slot's recurrent state.
"""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType


def _greedy_oracle(model, prompt, n_new):
    """Lone sequence: chunk-free full prefill + greedy decode."""
    import jax
    import jax.numpy as jnp

    from zllm.models.recurrent import recurrent_forward

    step = jax.jit(
        lambda p, t, s: recurrent_forward(p, model.cfg, t, s, logits_for="last")
    )
    logits, state = step(model.params, jnp.asarray([prompt], jnp.int32), None)
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for _ in range(n_new - 1):
        logits, state = step(model.params, jnp.asarray([[out[-1]]], jnp.int32), state)
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    return out


def _run_engine(model, prompts, n_new):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=8)
    assert eng.recurrent
    eng.start()
    try:
        reqs = [
            eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0))
            for p in prompts
        ]
        import time

        deadline = time.time() + 120
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
        return [r.out_tokens for r in reqs]
    finally:
        eng.stop()


def _check_model(path):
    import jax.numpy as jnp

    from zllm.models.loader import Model

    model = Model.load(path, quantized=False, dtype=jnp.float32)
    # prompts of very different lengths so one slot prefills (chunked)
    # while the other decodes in the same mixed batch
    prompts = [
        list(np.random.default_rng(0).integers(1, 200, size=21)),
        list(np.random.default_rng(1).integers(1, 200, size=3)),
    ]
    n_new = 8
    got = _run_engine(model, prompts, n_new)
    for p, g in zip(prompts, got):
        want = _greedy_oracle(model, p, n_new)
        assert g == want, (g, want)


def test_mamba_engine(tmp_path):
    import json
    import os
    import subprocess
    import sys

    from conftest import subprocess_env

    from test_mamba import MAMBA_CFG
    from zllm.convert.hf import convert_hf_mamba

    out = tmp_path / "m.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(MAMBA_CFG), "mamba"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    path = str(tmp_path / "mamba.gguf")
    convert_hf_mamba(sd, MAMBA_CFG, path, gtype=GGMLType.F32)
    _check_model(path)


def test_rwkv_engine(tmp_path):
    from test_rwkv import RWKV_CFG, _rng_state_dict
    from zllm.convert.hf import convert_hf_rwkv6

    sd = _rng_state_dict(RWKV_CFG)
    path = str(tmp_path / "rwkv6.gguf")
    convert_hf_rwkv6(sd, RWKV_CFG, path, gtype=GGMLType.F32)
    _check_model(path)


def _run_engine_mesh(model, prompts, n_new, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=256, prefill_chunk=8, **kw)
    assert eng.recurrent
    eng.start()
    try:
        reqs = [eng.submit(Request(prompt_tokens=p, max_new=n_new, temp=0.0))
                for p in prompts]
        import time

        deadline = time.time() + 180
        while not all(r.done for r in reqs):
            assert time.time() < deadline, "engine timed out"
            time.sleep(0.02)
        assert all(r.error == "" for r in reqs), [r.error for r in reqs]
        return [list(r.out_tokens) for r in reqs]
    finally:
        eng.stop()


@pytest.mark.parametrize("axes", [{"dp": 2}, {"tp": 2}])
def test_recurrent_engine_mesh(tmp_path, axes):
    """Recurrent models under the serving mesh (round-4 rejected them):
    state tensors shard over dp on their leading batch axis (tp replicates
    the small recurrent weights) and greedy output matches single-device."""
    import jax.numpy as jnp

    from test_rwkv import RWKV_CFG, _rng_state_dict
    from zllm.convert.hf import convert_hf_rwkv6
    from zllm.models.loader import Model

    sd = _rng_state_dict(RWKV_CFG)
    path = str(tmp_path / "rwkv6.gguf")
    convert_hf_rwkv6(sd, RWKV_CFG, path, gtype=GGMLType.F32)
    model = Model.load(path, quantized=False, dtype=jnp.float32)
    prompts = [
        list(np.random.default_rng(0).integers(1, 200, size=13)),
        list(np.random.default_rng(1).integers(1, 200, size=5)),
    ]
    want = _run_engine_mesh(model, prompts, 8)
    got = _run_engine_mesh(model, prompts, 8, **axes)
    assert got == want
