"""Mamba (recurrent state-space) parity vs HF MambaForCausalLM
(reference: src/models/mamba.cpp selective scan + the recurrent memory
class src/llama-memory-recurrent.cpp)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType

MAMBA_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=3,
    state_size=16,
    conv_kernel=4,
    expand=2,
    time_step_rank=4,
    use_bias=False,
    use_conv_bias=True,
    layer_norm_epsilon=1e-5,
    tie_word_embeddings=False,
)


@pytest.fixture(scope="module")
def mamba_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "mamba.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(MAMBA_CFG), "mamba"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


@pytest.fixture(scope="module")
def mamba_gguf(mamba_ref, tmp_path_factory):
    from zllm.convert.hf import convert_hf_mamba

    sd, *_ = mamba_ref
    path = str(tmp_path_factory.mktemp("m") / "mamba.gguf")
    convert_hf_mamba(sd, MAMBA_CFG, path, gtype=GGMLType.F32)
    return path


def test_mamba_logit_parity(mamba_ref, mamba_gguf):
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.mamba import mamba_forward

    _, toks, want, _ = mamba_ref
    m = Model.load(mamba_gguf, quantized=False, dtype=jnp.float32)
    assert m.cfg.is_recurrent and m.cfg.ssm.d_inner == 128

    fwd = jax.jit(lambda p, t: mamba_forward(p, m.cfg, t)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_mamba_incremental_state(mamba_ref, mamba_gguf):
    """Token-by-token decode through RecurrentState == full-sequence
    forward (the recurrent-memory contract), and greedy matches HF."""
    import jax
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.models.mamba import RecurrentState, mamba_forward

    _, toks, want, greedy = mamba_ref
    m = Model.load(mamba_gguf, quantized=False, dtype=jnp.float32)
    cfg = m.cfg

    step = jax.jit(lambda p, t, s: mamba_forward(p, cfg, t, s, logits_for="last"))
    state = RecurrentState.create(cfg, 1)
    row = toks[0].astype(np.int32)
    outs = []
    for t in row:
        logits, state = step(m.params, jnp.asarray([[int(t)]], jnp.int32), state)
        outs.append(np.asarray(logits)[0, -1])
    np.testing.assert_allclose(np.stack(outs), want[0], rtol=5e-4, atol=5e-4)

    # greedy continuation matches HF generate
    prompt = [5, 17, 42, 7]
    state = RecurrentState.create(cfg, 1)
    logits, state = step(m.params, jnp.asarray([prompt], jnp.int32), state)
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for _ in range(5):
        logits, state = step(m.params, jnp.asarray([[out[-1]]], jnp.int32), state)
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    assert out == list(greedy[: len(out)]), (out, list(greedy))


MAMBA2_CFG = dict(
    vocab_size=256,
    hidden_size=64,
    num_hidden_layers=2,
    state_size=32,
    conv_kernel=4,
    expand=2,
    num_heads=4,  # head_dim = 128/4 = 32
    head_dim=32,
    n_groups=1,
    chunk_size=8,
    use_bias=False,
    use_conv_bias=True,
    layer_norm_epsilon=1e-5,
    tie_word_embeddings=False,
    time_step_rank=4,
    time_step_min=0.001,
    time_step_max=0.1,
)


@pytest.fixture(scope="module")
def mamba2_ref(tmp_path_factory):
    from conftest import subprocess_env

    out = tmp_path_factory.mktemp("hf") / "mamba2.npz"
    script = os.path.join(os.path.dirname(__file__), "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, str(out), json.dumps(MAMBA2_CFG), "mamba2"],
        timeout=600, capture_output=True, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    data = np.load(str(out))
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data["toks"], data["logits"], data["greedy"]


def test_mamba2_logit_parity_and_incremental(mamba2_ref, tmp_path):
    """Mamba2 (SSD) parity vs HF Mamba2ForCausalLM (reference:
    graph-context-mamba.cpp build_mamba2_layer) + incremental decode."""
    import jax
    import jax.numpy as jnp

    from zllm.convert.hf import convert_hf_mamba2
    from zllm.models.loader import Model
    from zllm.models.mamba import RecurrentState, mamba_forward

    sd, toks, want, greedy = mamba2_ref
    path = str(tmp_path / "mamba2.gguf")
    convert_hf_mamba2(sd, MAMBA2_CFG, path, gtype=GGMLType.F32)
    m = Model.load(path, quantized=False, dtype=jnp.float32)
    assert m.cfg.ssm.is_mamba2 and m.cfg.ssm.n_head == 4

    fwd = jax.jit(lambda p, t: mamba_forward(p, m.cfg, t)[0])
    got = np.asarray(fwd(m.params, jnp.asarray(toks.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

    # incremental greedy matches HF generate
    prompt = [5, 17, 42, 7]
    logits, state = mamba_forward(m.params, m.cfg, jnp.asarray([prompt], jnp.int32),
                                  logits_for="last")
    out = [int(np.asarray(logits)[0, -1].argmax())]
    for _ in range(5):
        logits, state = mamba_forward(
            m.params, m.cfg, jnp.asarray([[out[-1]]], jnp.int32), state,
            logits_for="last")
        out.append(int(np.asarray(logits)[0, -1].argmax()))
    assert out == list(greedy), (out, list(greedy))
