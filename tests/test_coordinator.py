"""Multi-host continuous-batching schedule coordinator (SURVEY hard part
#4; reference capability being replaced: ggml-rpc.cpp multi-node serving).
Rank 0 broadcasts one fixed-shape (op, kind, tokens, positions) message per
engine step; followers replay identical ubatches through the same jitted
sharded step."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from zllm.parallel.coordinator import (
    KIND_DECODE,
    KIND_MIXED,
    OP_STEP,
    OP_STOP,
    StepCoordinator,
)


def test_schedule_pack_unpack_roundtrip():
    c = StepCoordinator(n_slots=4, chunk=8)
    toks = np.arange(4 * 3, dtype=np.int32).reshape(4, 3)
    pos = toks + 100
    op, kind, t2, p2 = c.unpack(*c.pack(OP_STEP, KIND_MIXED, toks, pos))
    assert (op, kind) == (OP_STEP, KIND_MIXED)
    np.testing.assert_array_equal(t2, toks)
    np.testing.assert_array_equal(p2, pos)

    d = np.ones((4, 1), np.int32)
    op, kind, t2, p2 = c.unpack(*c.pack(OP_STEP, KIND_DECODE, d, d * 5))
    assert kind == KIND_DECODE and t2.shape == (4, 1)
    np.testing.assert_array_equal(p2, d * 5)

    op, kind, t2, p2 = c.unpack(*c.pack(OP_STOP, 0, None, None))
    assert op == OP_STOP and t2 is None


def test_wire_shapes_fixed():
    """Every packed message has identical shapes/dtypes (one broadcast
    program, no re-tracing)."""
    c = StepCoordinator(n_slots=2, chunk=16)
    msgs = [
        c.pack(OP_STEP, KIND_DECODE, np.ones((2, 1), np.int32), np.ones((2, 1), np.int32)),
        c.pack(OP_STEP, KIND_MIXED, np.ones((2, 16), np.int32), np.ones((2, 16), np.int32)),
        c.pack(OP_STOP, 0, None, None),
    ]
    shapes = {tuple((a.shape, a.dtype.str) for a in m) for m in msgs}
    assert len(shapes) == 1


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    import jax.numpy as jnp

    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "coord.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
                    n_ff=256, vocab_size=512)
    return Model.load(path, quantized=True, dtype=jnp.float32)


def _greedy(model, prompt, max_new=6, **kw):
    from zllm.server.engine import Engine, Request

    eng = Engine(model, n_slots=2, max_len=64, prefill_chunk=8, **kw)
    eng.start()
    try:
        r = eng.submit(Request(prompt_tokens=prompt, max_new=max_new, temp=0.0))
        while not r.done:
            if r.stream_q.get(timeout=180) is None:
                break
        assert not r.error, r.error
        return list(r.out_tokens)
    finally:
        eng.stop()


def test_coordinated_engine_matches_plain(model):
    """Single-process coordinated engine on a hybrid dcn mesh: broadcast is
    the identity, greedy output must equal the plain engine's."""
    import jax

    from zllm.parallel import make_hybrid_mesh

    prompt = [3, 5, 7, 9, 11]
    want = _greedy(model, prompt)
    mesh = make_hybrid_mesh(dcn=2, dp=1, tp=1, devices=jax.devices()[:2])
    got = _greedy(model, prompt, mesh=mesh, coordinated=True)
    assert got == want


def test_coordinated_rejects_unsupported(model):
    from zllm.server.engine import Engine

    with pytest.raises(ValueError):
        Engine(model, n_slots=2, max_len=64, kv_layout="paged", coordinated=True)


_PROC = textwrap.dedent("""
    import os, re, sys, json
    pid, port, mdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    # one local device per process (the pytest parent's 8-device flag would
    # make a 16-device global mesh)
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\\d+", "",
        os.environ.get("XLA_FLAGS", ""))
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{{port}}",
                               num_processes=2, process_id=pid)
    sys.path.insert(0, {repo!r})
    import jax.numpy as jnp
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf
    from zllm.parallel import make_hybrid_mesh
    from zllm.server.engine import Engine, Request

    path = os.path.join(mdir, f"m{{pid}}.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=128, n_heads=4, n_kv_heads=2,
                    n_ff=256, vocab_size=512)
    m = Model.load(path, quantized=True, dtype=jnp.float32)
    mesh = make_hybrid_mesh(dcn=2, dp=1, tp=1, devices=jax.devices())
    eng = Engine(m, n_slots=2, max_len=64, prefill_chunk=8, mesh=mesh,
                 coordinated=True)
    if pid == 0:
        eng.start()
        r = eng.submit(Request(prompt_tokens=[3, 5, 7, 9, 11], max_new=6, temp=0.0))
        while not r.done:
            if r.stream_q.get(timeout=180) is None:
                break
        eng.stop()
        print("OUT:" + json.dumps({{"toks": r.out_tokens, "err": r.error}}), flush=True)
    else:
        eng.run_follower()
        print("OUT:" + json.dumps({{"follower": "done"}}), flush=True)
""")


def test_two_process_coordinated_serving(model, tmp_path):
    """Real 2-process jax.distributed run: the leader serves a request over
    a (dcn=2) global mesh while the follower replays the broadcast
    schedule; leader greedy output equals the single-process engine's."""
    from conftest import subprocess_env

    want = _greedy(model, [3, 5, 7, 9, 11])

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = str(tmp_path / "proc.py")
    with open(script, "w") as fh:
        fh.write(_PROC.format(repo=repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = subprocess_env()
    follower = subprocess.Popen(
        [sys.executable, script, "1", port, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        leader = subprocess.run(
            [sys.executable, script, "0", port, str(tmp_path)],
            env=env, capture_output=True, text=True, timeout=420)
        f_out, _ = follower.communicate(timeout=60)
    finally:
        if follower.poll() is None:
            follower.kill()
    assert leader.returncode == 0, leader.stdout + leader.stderr
    out = json.loads(leader.stdout.split("OUT:")[1].strip().splitlines()[0])
    assert not out["err"], out
    assert out["toks"] == want, (out["toks"], want)
    assert '"follower": "done"' in f_out, f_out
