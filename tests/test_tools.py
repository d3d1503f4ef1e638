"""Tool-level tests: quantize CLI round-trip and perplexity sanity
(pattern: reference tools/quantize + tools/perplexity smoke runs in ci/run.sh)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def f32_model(tmp_path_factory):
    from zllm.gguf.constants import GGMLType
    from zllm.testing import make_llama_gguf

    path = str(tmp_path_factory.mktemp("m") / "f32.gguf")
    make_llama_gguf(path, n_layers=2, n_embd=256, n_heads=4, n_kv_heads=2,
                    n_ff=512, vocab_size=512, gtype=GGMLType.F32)
    return path


def test_quantize_tool(f32_model, tmp_path):
    from conftest import subprocess_env

    out = str(tmp_path / "q4.gguf")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "quantize.py"), f32_model, out, "Q4_K_M"],
        capture_output=True, text=True, timeout=300, env=subprocess_env(),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.getsize(out) < os.path.getsize(f32_model) * 0.45

    from zllm.gguf import GGMLType, read_gguf

    f = read_gguf(out)
    assert f.tensors["blk.0.ffn_gate.weight"].gtype == GGMLType.Q4_K
    assert f.tensors["blk.0.attn_v.weight"].gtype == GGMLType.Q6_K  # M bump
    assert f.tensors["blk.0.attn_norm.weight"].gtype == GGMLType.F32
    # quantized model still loads and runs
    import jax
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.models.loader import Model

    m = Model.load(out, quantized=True, dtype=jnp.float32)
    toks = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    pos = jnp.asarray(np.arange(6, dtype=np.int32)[None])
    lg = jax.jit(lambda p, t, q: forward(p, m.cfg, t, q, None)[0])(m.params, toks, pos)
    assert np.isfinite(np.asarray(lg)).all()
    f.close()


def test_perplexity_fn(f32_model):
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from perplexity import perplexity

    from zllm.models.loader import Model

    m = Model.load(f32_model, quantized=False, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, m.cfg.vocab_size, 4 * 64).tolist()
    ppl, err, n = perplexity(m, ids, n_ctx=64, batch=2, progress=False)
    # random model on random tokens: ppl should be near vocab size
    assert 50 < ppl < 5000
    assert n == 4 * (64 // 2 - 1)


def test_gguf_split_merge_roundtrip(tmp_path):
    """Split a model into shards, load the shard set transparently, merge
    back, and verify tensor bytes survive (reference: tools/gguf-split)."""
    import numpy as np

    from tools.gguf_split import merge, split
    from zllm.gguf.constants import GGMLType
    from zllm.gguf.reader import read_gguf
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.Q8_0)
    outs = split(src, str(tmp_path / "shard"), max_tensors=5)
    assert len(outs) > 1

    f0 = read_gguf(src)
    fs = read_gguf(outs[0])  # SplitGGUF
    assert set(fs.tensors) == set(f0.tensors)
    for name in f0.tensors:
        np.testing.assert_array_equal(fs.tensor_bytes(name), f0.tensor_bytes(name))

    merged = str(tmp_path / "merged.gguf")
    merge(outs[0], merged)
    fm = read_gguf(merged)
    for name in f0.tensors:
        np.testing.assert_array_equal(fm.tensor_bytes(name), f0.tensor_bytes(name))
    assert fm.kv("llama.block_count") == f0.kv("llama.block_count")
    f0.close(); fs.close(); fm.close()


def test_split_model_loads(tmp_path):
    """Model.load works directly on the first shard of a split set."""
    import jax.numpy as jnp

    from tools.gguf_split import split
    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.Q8_0)
    outs = split(src, str(tmp_path / "shard"), max_tensors=4)
    m = Model.load(outs[0], quantized=True, dtype=jnp.float32)
    assert len(m.params["layers"]) == 2


def test_export_lora_merges(tmp_path):
    """export-lora: merged model forward == base forward + runtime LoRA."""
    import jax.numpy as jnp
    import numpy as np

    from tools.export_lora import export_lora
    from zllm.gguf.constants import GGMLType
    from zllm.gguf.writer import GGUFWriter
    from zllm.models.adapter import load_lora
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "base.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.F32)

    # synthesize a rank-2 adapter on layer 0's wq
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 2)).astype(np.float32) * 0.1  # [K, r]
    b = rng.standard_normal((2, 64)).astype(np.float32) * 0.1  # [r, N]
    lp = str(tmp_path / "adapter.gguf")
    w = GGUFWriter(lp)
    w.add("general.type", "adapter")
    w.add("adapter.type", "lora")
    w.add("adapter.lora.alpha", 4.0)
    w.add("adapter.lora.rank", 2)
    w.add_tensor("blk.0.attn_q.lora_a", a)
    w.add_tensor("blk.0.attn_q.lora_b", b)
    w.write()

    merged_path = export_lora(src, lp, str(tmp_path / "merged.gguf"), gtype=GGMLType.F32)

    toks = jnp.asarray(np.asarray([[3, 9, 27]], np.int32))
    pos = jnp.asarray(np.arange(3, dtype=np.int32)[None])

    base = Model.load(src, quantized=False, dtype=jnp.float32, fuse=False)
    load_lora(base, lp)
    want, _ = forward(base.params, base.cfg, toks, pos, None)

    m2 = Model.load(merged_path, quantized=False, dtype=jnp.float32, fuse=False)
    got, _ = forward(m2.params, m2.cfg, toks, pos, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_cvector_generate_and_apply(tmp_path):
    """cvector: generated directions steer the residual stream (applying
    the vector changes logits; clearing restores them)."""
    import jax.numpy as jnp
    import numpy as np

    from tools.cvector import generate, write_cvector_gguf
    from zllm.gguf.constants import GGMLType
    from zllm.models.adapter import clear_cvector, load_cvector
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=3, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32)
    m = Model.load(src, quantized=False, dtype=jnp.float32)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(253)]
    types = [int(TokenType.UNKNOWN)] + [int(TokenType.CONTROL)] * 2 + [int(TokenType.BYTE)] * 253
    m.tokenizer = Tokenizer(Vocab(model="llama", pre="default", tokens=tokens,
        scores=[0.0] * 256, types=types, bos_id=1, eos_id=2, unk_id=0,
        add_bos=True, add_space_prefix=False))

    dirs = generate(m, ["happy day", "good news"], ["sad day", "bad news"], method="pca")
    assert set(dirs) == {1, 2} and dirs[1].shape == (64,)
    out = write_cvector_gguf(dirs, str(tmp_path / "cv.gguf"), "llama")

    toks = jnp.asarray(np.asarray([[5, 9]], np.int32))
    pos = jnp.asarray(np.arange(2, dtype=np.int32)[None])
    before, _ = forward(m.params, m.cfg, toks, pos, None)
    n = load_cvector(m, out, scale=5.0)
    assert n == 2
    after, _ = forward(m.params, m.cfg, toks, pos, None)
    assert not np.allclose(np.asarray(before), np.asarray(after))
    clear_cvector(m)
    restored, _ = forward(m.params, m.cfg, toks, pos, None)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(before))


def test_tokenize_cli(tmp_path):
    import subprocess
    import sys as _sys

    from conftest import subprocess_env

    out = subprocess.run(
        [_sys.executable, "tools/tokenize_cli.py",
         "/root/reference/models/ggml-vocab-llama-spm.gguf", "-p", "Hello world",
         "--ids", "--show-count"],
        capture_output=True, text=True, timeout=120, env=subprocess_env(), cwd=REPO,
    )
    assert out.returncode == 0, out.stderr
    ids = eval(out.stdout.strip())
    assert isinstance(ids, list) and len(ids) > 2
    assert "Total number of tokens" in out.stderr


def test_fit_params(tmp_path):
    from tools.fit_params import fit
    from zllm.gguf.constants import GGMLType
    from zllm.testing import make_llama_gguf

    src = str(tmp_path / "m.gguf")
    make_llama_gguf(src, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=128, gtype=GGMLType.Q8_0)
    ctx, slots = fit(src, ctx=32768, slots=4, margin=0, hbm=1 << 30)
    assert ctx == 32768 and slots == 4  # tiny model fits outright
    ctx2, slots2 = fit(src, ctx=1 << 24, slots=64, margin=0, hbm=64 << 20)
    assert ctx2 < (1 << 24)  # context was reduced to fit


def test_kl_divergence_modes(tmp_path):
    """Save-base + compare: same model vs itself gives ~0 KL; vs another
    seed gives KL > 0 (reference: perplexity --kl-divergence)."""
    import jax.numpy as jnp

    from tools.perplexity import kl_divergence
    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    ids = list(range(3, 131)) * 2  # 256 tokens
    p1 = str(tmp_path / "a.gguf")
    make_llama_gguf(p1, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32, seed=0)
    m1 = Model.load(p1, quantized=False, dtype=jnp.float32)
    base = str(tmp_path / "base.npz")
    out = kl_divergence(m1, ids, n_ctx=64, batch=2, save_path=base)
    assert out["chunks"] == 4

    same = kl_divergence(m1, ids, base, n_ctx=64, batch=2)
    assert same["mean_kl"] < 1e-3 and same["same_top_frac"] == 1.0

    p2 = str(tmp_path / "b.gguf")
    make_llama_gguf(p2, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32, seed=9)
    m2 = Model.load(p2, quantized=False, dtype=jnp.float32)
    diff = kl_divergence(m2, ids, base, n_ctx=64, batch=2)
    assert diff["mean_kl"] > same["mean_kl"]


def test_hellaswag_scoring(tmp_path):
    """The ending identical to what the model actually continues with must
    win over random endings — construct tasks from the model's own greedy
    continuations so label-0 accuracy is 100%."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.perplexity import hellaswag
    from zllm.gguf.constants import GGMLType
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf

    p = str(tmp_path / "m.gguf")
    make_llama_gguf(p, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32)
    m = Model.load(p, quantized=False, dtype=jnp.float32)
    rng = np.random.default_rng(0)

    tasks = []
    for i in range(3):
        ctx = list(rng.integers(3, 250, 8))
        ids = [int(x) for x in ctx]
        # greedy 4-token continuation = the "right" ending
        cur = list(ids)
        for _ in range(4):
            toks = jnp.asarray(np.asarray(cur, np.int32)[None])
            pos = jnp.asarray(np.arange(len(cur), dtype=np.int32)[None])
            logits, _ = forward(m.params, m.cfg, toks, pos, None, logits_for="last")
            cur.append(int(np.asarray(logits)[0, -1].argmax()))
        right = cur[len(ids):]
        wrongs = [[int(x) for x in rng.integers(3, 250, 4)] for _ in range(3)]
        tasks.append({"context": ids, "endings": [right] + wrongs, "label": 0})
    acc, n = hellaswag(m, tasks)
    assert n == 3 and acc == 1.0


def test_args_env_and_preset(tmp_path, monkeypatch):
    """CLI > env > preset > default precedence (reference common/arg.cpp
    LLAMA_ARG_* envs + presets)."""
    import argparse

    from zllm.utils.args import add_common_args, parse_with_presets

    preset = tmp_path / "p.ini"
    preset.write_text("[serve]\nctx = 4096\nslots = 8\nseed = 3\n")

    # preset fills defaults
    ap = argparse.ArgumentParser()
    add_common_args(ap, server=True)
    args = parse_with_presets(ap, ["--preset", f"{preset}:serve"])
    assert args.ctx == 4096 and int(args.slots) == 8 and args.seed == 3

    # CLI beats preset
    ap = argparse.ArgumentParser()
    add_common_args(ap, server=True)
    args = parse_with_presets(ap, ["--preset", f"{preset}:serve", "--ctx", "1024"])
    assert int(args.ctx) == 1024 and int(args.slots) == 8

    # env beats preset
    monkeypatch.setenv("ZLLM_ARG_SLOTS", "2")
    ap = argparse.ArgumentParser()
    add_common_args(ap, server=True)
    args = parse_with_presets(ap, ["--preset", f"{preset}:serve"])
    assert int(args.slots) == 2


def test_winogrande_and_multiple_choice(tmp_path):
    """Winogrande CSV parsing + scoring and generic multiple-choice
    (reference: perplexity.cpp winogrande_score / multiple_choice_score).
    With identical choices the tie goes to the first, so answer=1 /
    label=0 tasks must score 100%."""
    import jax.numpy as jnp

    from tools.perplexity import load_winogrande_csv, multiple_choice, winogrande
    from zllm.gguf.constants import GGMLType
    from zllm.models.loader import Model
    from zllm.testing import make_llama_gguf
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    p = str(tmp_path / "m.gguf")
    make_llama_gguf(p, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=256, gtype=GGMLType.F32)
    m = Model.load(p, quantized=False, dtype=jnp.float32)
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(253)]
    types = [int(TokenType.UNKNOWN)] + [int(TokenType.CONTROL)] * 2 + [int(TokenType.BYTE)] * 253
    m.tokenizer = Tokenizer(Vocab(model="llama", pre="default", tokens=tokens,
                                  scores=[0.0] * 256, types=types, bos_id=1, eos_id=2,
                                  unk_id=0, add_bos=True, add_space_prefix=False))

    csv_text = (
        "idx,sentence,choice1,choice2,answer\n"
        '0,"Sam beat Joe, so _ won the game.",Sam,Sam,1\n'
        "1,Al was faster than Bo so _ came first.,Al,Al,1\n"
    )
    tasks = load_winogrande_csv(csv_text)
    assert len(tasks) == 2 and tasks[0][3] == 1
    acc, n = winogrande(m, tasks)
    assert n == 2 and acc == 1.0

    mc = [{"question": "Q: pick.", "choices": ["abc", "abc", "abc"], "label": 0}]
    acc, n = multiple_choice(m, mc)
    assert n == 1 and acc == 1.0


def test_cli_prompt_cache_and_reverse_prompt(tmp_path):
    """--prompt-cache session reuse must not change greedy output, and
    -r stops at the reverse prompt (reference: tools/completion
    --prompt-cache + antiprompts)."""
    import subprocess
    import sys as _sys

    from conftest import subprocess_env
    from zllm.gguf.constants import GGMLType
    from zllm.testing import make_llama_gguf

    p = str(tmp_path / "m.gguf")
    make_llama_gguf(p, n_layers=2, n_embd=64, n_heads=4, n_kv_heads=2,
                    n_ff=128, vocab_size=260, gtype=GGMLType.Q8_0, with_tokenizer=True)
    cache = str(tmp_path / "sess.npz")
    prompt = "The quick brown fox jumps over the lazy dog"

    def run(*extra):
        r = subprocess.run(
            [_sys.executable, os.path.join(REPO, "tools", "cli.py"), p,
             "-p", prompt, "--greedy", "-n", "5", *extra],
            capture_output=True, text=True, timeout=600, env=subprocess_env(),
        )
        assert r.returncode == 0, r.stderr[-800:]
        return r.stdout, r.stderr

    out1, _ = run("--prompt-cache", cache)
    assert os.path.exists(cache)
    out2, err2 = run("--prompt-cache", cache)
    assert "reused" in err2
    assert out1 == out2  # cache reuse is output-invariant
