"""Multimodal serving: engine media requests (placeholder ids + embedding
row mask in the mixed prefill step) must reproduce the model-level embeds
prefill exactly, and the HTTP server must accept OpenAI image_url data
URIs end-to-end.  Reference analogue: tools/server multimodal requests
through libmtmd."""

import base64
import io
import json
import os
import subprocess
import sys
import urllib.request

import numpy as np
import pytest

from test_mtmd import LLAVA_CFG, _oracle, _strip_lm

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _byte_tokenizer():
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    n = 131  # match LLAVA_CFG text vocab
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(n - 3)]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)] + [
        int(TokenType.BYTE)
    ] * (n - 3)
    return Tokenizer(Vocab(
        model="llama", pre="default", tokens=tokens, scores=[0.0] * n,
        types=types, bos_id=1, eos_id=2, unk_id=0, add_bos=True,
        add_space_prefix=False,
    ))


@pytest.fixture(scope="module")
def llava_model(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("mmsrv"))
    sd, data = _oracle("llava", LLAVA_CFG, tmp)

    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.convert.mmproj import convert_hf_mmproj
    from zllm.models.loader import Model
    from zllm.mtmd import ClipModel

    text_path = os.path.join(tmp, "text.gguf")
    mm_path = os.path.join(tmp, "mmproj.gguf")
    convert_hf_llama(_strip_lm(sd), LLAVA_CFG["text"], text_path, arch="llama")
    convert_hf_mmproj(sd, LLAVA_CFG["vision"], mm_path, proj_type="mlp")
    model = Model.load(text_path, quantized=False, dtype=jnp.float32)
    model.tokenizer = _byte_tokenizer()
    clip = ClipModel(mm_path)
    return model, clip, data, mm_path


def test_engine_media_matches_embeds_prefill(llava_model):
    """Engine greedy output on a media request == Generator.prefill_embeds
    + greedy decode on the same chunk layout."""
    import queue

    from zllm.mtmd.media import ImageChunk, TextChunk, chunks_to_embeds
    from zllm.runtime.generate import Generator
    from zllm.server.engine import Engine, Request

    model, clip, data, _ = llava_model
    feats = clip.encode(data["pixels"][0])
    pre, post = list(data["pre"]), list(data["post"])

    # reference chain: model-level embeds prefill
    chunks = [TextChunk(tokens=pre), ImageChunk(embeds=feats), TextChunk(tokens=post)]
    embeds = chunks_to_embeds(model, chunks)
    gen = Generator(model, max_len=96, prefill_chunk=8)
    logits = gen.prefill_embeds(embeds)
    first = int(np.argmax(np.asarray(logits)))
    want = gen.decode_steps(first, 5)

    # engine chain: placeholder ids + media spans (prefill_chunk chosen so
    # an image span straddles a chunk boundary)
    n_img = feats.shape[0]
    ids = pre + [0] * n_img + post
    media = [(len(pre), np.asarray(feats, np.float32))]
    eng = Engine(model, n_slots=2, max_len=96, prefill_chunk=8)
    eng.start()
    try:
        req = Request(prompt_tokens=ids, media=media, max_new=6, temp=0.0,
                      top_k=1)
        eng.submit(req)
        while not req.done:
            try:
                req.stream_q.get(timeout=30)
            except queue.Empty:
                raise AssertionError("engine stalled on media request")
        assert req.error == ""
        assert req.out_tokens == want
    finally:
        eng.stop()


def test_engine_media_rejected_on_mesh_modes(llava_model):
    from zllm.server.engine import Engine, Request

    model, clip, data, _ = llava_model
    feats = np.asarray(clip.encode(data["pixels"][0]), np.float32)
    eng = Engine(model, n_slots=2, max_len=96, pp=1)
    eng.pp = 2  # simulate a pp engine without building one
    with pytest.raises(ValueError, match="multimodal"):
        eng.submit(Request(prompt_tokens=[1, 2, 3], media=[(1, feats)]))


def _png_bytes(size: int) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_server_image_request(llava_model):
    from zllm.server import ZllmServer

    model, clip, data, mm_path = llava_model
    srv = ZllmServer(model, n_slots=2, max_len=384, port=0, mmproj=mm_path)
    srv.start_background()
    try:
        uri = "data:image/png;base64," + base64.b64encode(
            _png_bytes(LLAVA_CFG["vision"]["image_size"])).decode()
        body = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "look: "},
                {"type": "image_url", "image_url": {"url": uri}},
            ]}],
            "max_tokens": 8, "temperature": 0,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
        assert isinstance(out["choices"][0]["message"]["content"], str)
        # image tokens must be part of the accounted prompt
        n_img = clip.cfg.n_tokens
        assert out["usage"]["prompt_tokens"] >= n_img
    finally:
        srv.shutdown()


def test_server_multi_image_request(llava_model):
    """Two images in one chat request: both get encoded, both spans ride
    the prompt (reference: server-context handles N media chunks per
    prompt through libmtmd)."""
    from zllm.server import ZllmServer

    model, clip, data, mm_path = llava_model
    srv = ZllmServer(model, n_slots=2, max_len=512, port=0, mmproj=mm_path)
    srv.start_background()
    try:
        uri = "data:image/png;base64," + base64.b64encode(
            _png_bytes(LLAVA_CFG["vision"]["image_size"])).decode()
        body = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "first: "},
                {"type": "image_url", "image_url": {"url": uri}},
                {"type": "text", "text": " second: "},
                {"type": "image_url", "image_url": {"url": uri}},
            ]}],
            "max_tokens": 6, "temperature": 0,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
        n_img = clip.cfg.n_tokens
        assert out["usage"]["prompt_tokens"] >= 2 * n_img
    finally:
        srv.shutdown()


def test_image_slicing_llava_uhd(llava_model):
    """Aspect-preserving tiling: a wide image slices into an overview +
    an aspect-matched grid; embeddings concatenate overview-first."""
    from zllm.mtmd import MtmdModel
    from zllm.mtmd.media import best_slice_grid, preprocess_image_slices

    model, clip, data, mm_path = llava_model
    s = clip.cfg.image_size
    rng = np.random.default_rng(1)
    wide = rng.integers(0, 255, size=(s * 2, s * 4, 3), dtype=np.uint8)
    tiles = preprocess_image_slices(wide, clip.cfg, max_slices=8)
    gx, gy = best_slice_grid(s * 4, s * 2, 8)
    assert (gx, gy) == (4, 2)  # 2:1 aspect at 8 slices
    assert len(tiles) == 1 + gx * gy
    assert all(t.shape == (3, s, s) for t in tiles)

    mm = MtmdModel(mm_path)
    emb = np.asarray(mm.encode_image_slices(wide, max_slices=8))
    assert emb.shape[0] == (1 + gx * gy) * clip.cfg.n_tokens

    # a small square image stays a single overview
    small = rng.integers(0, 255, size=(s, s, 3), dtype=np.uint8)
    assert len(preprocess_image_slices(small, clip.cfg, max_slices=8)) == 1
