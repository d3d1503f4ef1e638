"""Multimodal (mtmd) parity vs HF: CLIP tower + llava projector image
features, full llava logits through the embeds prefill path, and the
gemma3 SigLIP + avg-pool projector variant.

Reference analogue: tools/mtmd (clip.cpp + mtmd.cpp); parity oracle is
transformers' LlavaForConditionalGeneration / Gemma3ForConditionalGeneration.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LLAVA_CFG = {
    "vision": dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=2,
        image_size=28,
        patch_size=7,
        hidden_act="quick_gelu",
        layer_norm_eps=1e-5,
    ),
    "text": dict(
        vocab_size=131,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "image_token_index": 100,
}

GEMMA3V_CFG = {
    "vision": dict(
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=32,
        patch_size=4,
        hidden_act="gelu_pytorch_tanh",
        layer_norm_eps=1e-6,
    ),
    "text": dict(
        vocab_size=160,
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=12,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
    ),
    "image_token_index": 150,
    "mm_tokens_per_image": 4,
}


def _oracle(arch, cfg, tmpdir):
    from conftest import subprocess_env

    out = os.path.join(tmpdir, f"{arch}.npz")
    script = os.path.join(REPO, "tests", "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, out, json.dumps(cfg), arch],
        timeout=300, capture_output=True, text=True, env=subprocess_env(),
    )
    if r.returncode != 0:
        pytest.skip(f"HF oracle unavailable for {arch}: {r.stderr[-500:]}")
    data = np.load(out)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data


def _strip_lm(sd):
    """HF *ForConditionalGeneration state dict -> text-LM state dict with
    the standard `model.*` / `lm_head.*` keys convert_hf_llama expects."""
    out = {}
    for k, v in sd.items():
        if "language_model." in k:
            out["model." + k.split("language_model.", 1)[1]] = v
        elif k.startswith("lm_head."):
            out[k] = v
    return out


@pytest.fixture(scope="module")
def llava(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("llava"))
    sd, data = _oracle("llava", LLAVA_CFG, tmp)

    from zllm.convert import convert_hf_llama
    from zllm.convert.mmproj import convert_hf_mmproj
    from zllm.models.loader import Model

    text_path = os.path.join(tmp, "text.gguf")
    mm_path = os.path.join(tmp, "mmproj.gguf")
    convert_hf_llama(_strip_lm(sd), LLAVA_CFG["text"], text_path, arch="llama")
    convert_hf_mmproj(sd, LLAVA_CFG["vision"], mm_path, proj_type="mlp")

    import jax.numpy as jnp

    from zllm.mtmd import ClipModel

    model = Model.load(text_path, quantized=False, dtype=jnp.float32)
    clip = ClipModel(mm_path)
    return model, clip, data


def test_llava_image_features(llava):
    model, clip, data = llava
    feats = np.asarray(clip.encode(data["pixels"][0]))
    want = data["image_features"]
    assert feats.shape == want.shape
    np.testing.assert_allclose(feats, want, atol=2e-4, rtol=1e-3)


def test_llava_full_logits(llava):
    import jax.numpy as jnp

    from zllm.models.llama import forward
    from zllm.mtmd.media import ImageChunk, TextChunk, chunks_to_embeds

    model, clip, data = llava
    feats = clip.encode(data["pixels"][0])
    chunks = [
        TextChunk(tokens=list(data["pre"])),
        ImageChunk(embeds=feats),
        TextChunk(tokens=list(data["post"])),
    ]
    embeds = chunks_to_embeds(model, chunks)
    t = embeds.shape[1]
    assert t == len(data["ids"])
    positions = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _ = forward(model.params, model.cfg, jnp.zeros((1, t), jnp.int32),
                        positions, None, embeds=embeds)
    want = data["logits"][0]
    np.testing.assert_allclose(np.asarray(logits[0]), want, atol=2e-3, rtol=1e-3)


def test_llava_generate_runs(llava):
    """End-to-end decode from an embeds prefill (greedy, a few tokens)."""
    import jax.numpy as jnp

    from zllm.mtmd.media import ImageChunk, TextChunk, chunks_to_embeds
    from zllm.runtime.generate import Generator

    model, clip, data = llava
    feats = clip.encode(data["pixels"][0])
    chunks = [TextChunk(tokens=list(data["pre"])), ImageChunk(embeds=feats),
              TextChunk(tokens=list(data["post"]))]
    embeds = chunks_to_embeds(model, chunks)
    gen = Generator(model, max_len=96, prefill_chunk=16)
    logits = gen.prefill_embeds(embeds)
    first = int(np.argmax(np.asarray(logits)))
    toks = gen.decode_steps(first, 4)
    assert len(toks) == 5
    # decode continuation must match the full-sequence argmax chain
    want_first = int(np.argmax(data["logits"][0, -1]))
    assert first == want_first


def test_gemma3_vision_features(tmp_path):
    tmp = str(tmp_path)
    sd, data = _oracle("gemma3-vision", GEMMA3V_CFG, tmp)

    from zllm.convert.mmproj import convert_hf_mmproj
    from zllm.mtmd import ClipModel

    mm_path = os.path.join(tmp, "mmproj.gguf")
    vis_cfg = dict(GEMMA3V_CFG["vision"])
    vis_cfg["mm_tokens_per_image"] = GEMMA3V_CFG["mm_tokens_per_image"]
    convert_hf_mmproj(sd, vis_cfg, mm_path, proj_type="gemma3")
    clip = ClipModel(mm_path)
    feats = np.asarray(clip.encode(data["pixels"][0]))
    want = data["image_features"]
    assert feats.shape == want.shape
    np.testing.assert_allclose(feats, want, atol=3e-4, rtol=1e-3)


def test_media_marker_chunking():
    """Marker splitting + image accounting (no tokenizer: byte-ish stub)."""

    class TokStub:
        class vocab:
            bos_id = 1

        def encode(self, s, add_bos=False):
            return ([1] if add_bos else []) + [ord(c) % 50 + 2 for c in s]

    class ClipStub:
        def encode_image(self, img):
            return np.zeros((3, 8), np.float32)

    from zllm.mtmd.media import ImageChunk, TextChunk, tokenize_chunks

    chunks = tokenize_chunks(TokStub(), "hi <__media__> there", ["img"], ClipStub())
    kinds = [type(c) for c in chunks]
    assert kinds == [TextChunk, ImageChunk, TextChunk]
    with pytest.raises(ValueError):
        tokenize_chunks(TokStub(), "no marker", ["img"], ClipStub())
