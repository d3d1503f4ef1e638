"""Audio-modality parity vs HF Qwen2Audio: whisper log-mel front-end,
encoder + qwen2a projector features, and full-model logits through the
embeds path.  Reference analogue: tools/mtmd/mtmd-audio.cpp +
models/whisper-enc.cpp."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

Q2A_CFG = {
    "audio": dict(
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_dim=64,
        num_mel_bins=32,
        max_source_positions=100,
        scale_embedding=False,
    ),
    "text": dict(
        vocab_size=151,
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
    "audio_token_index": 140,
    "max_samples": 32000,
}


def _oracle(tmpdir):
    from conftest import subprocess_env

    out = os.path.join(tmpdir, "q2a.npz")
    script = os.path.join(REPO, "tests", "hf_oracle.py")
    r = subprocess.run(
        [sys.executable, script, out, json.dumps(Q2A_CFG), "qwen2audio"],
        timeout=300, capture_output=True, text=True, env=subprocess_env(),
    )
    if r.returncode != 0:
        pytest.skip(f"HF oracle unavailable for qwen2audio: {r.stderr[-500:]}")
    data = np.load(out)
    sd = {k[3:]: data[k] for k in data.files if k.startswith("sd.")}
    return sd, data


@pytest.fixture(scope="module")
def q2a(tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("q2a"))
    sd, data = _oracle(tmp)

    from zllm.convert.mmproj import convert_hf_mmproj_audio
    from zllm.mtmd.audio import AudioModel

    mm_path = os.path.join(tmp, "mmproj-audio.gguf")
    convert_hf_mmproj_audio(sd, Q2A_CFG["audio"], mm_path, proj_type="qwen2a")
    return sd, data, AudioModel(mm_path)


def test_log_mel_matches_whisper_fe(q2a):
    from zllm.mtmd.audio import log_mel

    _, data, _ = q2a
    mel = log_mel(data["wave"], Q2A_CFG["audio"]["num_mel_bins"],
                  pad_to=Q2A_CFG["max_samples"])
    want = data["mel"]
    assert mel.shape == want.shape
    np.testing.assert_allclose(mel, want, atol=2e-5, rtol=1e-4)


def test_audio_features_parity(q2a):
    _, data, am = q2a
    feats = np.asarray(am.encode(data["mel"]))
    want = data["audio_features"]
    assert feats.shape == want.shape
    np.testing.assert_allclose(feats, want, atol=3e-4, rtol=1e-3)


def test_qwen2audio_full_logits(tmp_path, q2a):
    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.llama import forward
    from zllm.models.loader import Model
    from zllm.mtmd.media import ImageChunk, TextChunk, chunks_to_embeds

    sd, data, am = q2a
    text_sd = {}
    for k, v in sd.items():
        if "language_model." in k:
            rest = k.split("language_model.", 1)[1]
            # qwen2audio nests a full *ForCausalLM (model./lm_head. keys);
            # llava-style nests the bare decoder (prefix with model.)
            if not rest.startswith(("model.", "lm_head.")):
                rest = "model." + rest
            text_sd[rest] = v
        elif k.startswith("lm_head."):
            text_sd[k] = v
    path = str(tmp_path / "text.gguf")
    convert_hf_llama(text_sd, Q2A_CFG["text"], path, arch="qwen2")
    model = Model.load(path, quantized=False, dtype=jnp.float32)

    feats = am.encode(data["mel"])
    chunks = [TextChunk(tokens=list(data["pre"])),
              ImageChunk(embeds=feats),
              TextChunk(tokens=list(data["post"]))]
    embeds = chunks_to_embeds(model, chunks)
    t = embeds.shape[1]
    assert t == len(data["ids"])
    positions = jnp.arange(t, dtype=jnp.int32)[None]
    logits, _ = forward(model.params, model.cfg, jnp.zeros((1, t), jnp.int32),
                        positions, None, embeds=embeds)
    np.testing.assert_allclose(np.asarray(logits[0]), data["logits"][0],
                               atol=2e-3, rtol=1e-3)


def test_wav_roundtrip(tmp_path):
    """load_wav decodes what the wave module writes (incl. resample)."""
    import wave as wavmod

    from zllm.mtmd.audio import load_wav

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(8000) * 0.1).clip(-1, 1)
    path = str(tmp_path / "t.wav")
    with wavmod.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((x * 32767).astype(np.int16).tobytes())
    y = load_wav(path)
    assert y.shape == (8000,)
    np.testing.assert_allclose(y, x, atol=1e-4)
    # 8 kHz stereo resamples to 16 kHz mono
    path2 = str(tmp_path / "t2.wav")
    with wavmod.open(path2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.repeat((x[:4000] * 32767).astype(np.int16), 2).tobytes())
    y2 = load_wav(path2)
    assert y2.shape == (8000,)


def test_server_audio_request(tmp_path, q2a):
    """End-to-end: serve text model + audio mmproj, POST an OpenAI
    input_audio content part (base64 WAV)."""
    import base64
    import io
    import json
    import urllib.request
    import wave as wavmod

    import jax.numpy as jnp

    from zllm.convert import convert_hf_llama
    from zllm.models.loader import Model
    from zllm.server import ZllmServer
    from zllm.tokenizer import Tokenizer
    from zllm.tokenizer.vocab import TokenType, Vocab

    sd, data, am = q2a
    text_sd = {}
    for k, v in sd.items():
        if "language_model." in k:
            rest = k.split("language_model.", 1)[1]
            if not rest.startswith(("model.", "lm_head.")):
                rest = "model." + rest
            text_sd[rest] = v
    path = str(tmp_path / "text.gguf")
    convert_hf_llama(text_sd, Q2A_CFG["text"], path, arch="qwen2")
    model = Model.load(path, quantized=False, dtype=jnp.float32)
    n = Q2A_CFG["text"]["vocab_size"]
    tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{b:02X}>" for b in range(n - 3)]
    types = [int(TokenType.UNKNOWN), int(TokenType.CONTROL), int(TokenType.CONTROL)] + [
        int(TokenType.BYTE)] * (n - 3)
    model.tokenizer = Tokenizer(Vocab(
        model="llama", pre="default", tokens=tokens, scores=[0.0] * n,
        types=types, bos_id=1, eos_id=2, unk_id=0, add_bos=True,
        add_space_prefix=False))

    mm_path = str(tmp_path / "mm.gguf")
    from zllm.convert.mmproj import convert_hf_mmproj_audio

    convert_hf_mmproj_audio(sd, Q2A_CFG["audio"], mm_path)

    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes((data["wave"][:8000] * 32767).astype(np.int16).tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    srv = ZllmServer(model, n_slots=2, max_len=384, port=0, mmproj=mm_path)
    srv.start_background()
    try:
        body = {
            "messages": [{"role": "user", "content": [
                {"type": "text", "text": "listen: "},
                {"type": "input_audio", "input_audio": {"data": b64, "format": "wav"}},
            ]}],
            "max_tokens": 6, "temperature": 0,
        }
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/chat/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=180) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
        n_aud = int(np.asarray(am.encode(data["mel"])).shape[0])
        assert out["usage"]["prompt_tokens"] >= n_aud
    finally:
        srv.shutdown()
