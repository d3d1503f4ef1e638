"""Whisper-style audio encoder + projectors (mtmd audio modality).

Reference counterpart: tools/mtmd/mtmd-audio.cpp (log-mel preprocessing)
and tools/mtmd/models/whisper-enc.cpp (conv1d x2 + ViT blocks + the
ultravox/qwen2a/voxtral projectors).  The log-mel front-end matches HF's
WhisperFeatureExtractor numerically (slaney-scale filters, reflect-pad
STFT, log10 clamp-normalize) so converted HF checkpoints reproduce their
oracle features; the encoder reuses the CLIP ViT block on [T/2, C]
frames with the conv stack lowered to XLA conv_general_dilated.

Projectors:
- ``qwen2a``: avg-pool(2) -> ln_post -> linear (HF Qwen2Audio ordering:
  the pool sits BEFORE the final layer norm).
- ``ultravox``: ln_post -> frame stacking -> RMS pre-norm -> swiglu
  (swapped halves) MLP -> RMS mid-norm -> linear.
- ``voxtral``: ln_post -> frame stacking -> gelu-erf MLP.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from .clip import _act, _ln, _vit_block

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    proj_type: str = "qwen2a"
    n_embd: int = 1280
    n_ff: int = 5120
    n_layer: int = 32
    n_head: int = 20
    proj_dim: int = 4096
    n_mel: int = 128
    eps: float = 1e-5
    ffn_op: str = "gelu_erf"
    stack_factor: int = 8  # ultravox/voxtral frame stacking

    @classmethod
    def from_gguf(cls, f) -> "AudioConfig":
        def kv(key, default=None):
            return f.kv(f"clip.audio.{key}", default)

        proj = f.kv("clip.audio.projector_type", f.kv("clip.projector_type", "qwen2a"))
        return cls(
            proj_type=proj,
            n_embd=int(kv("embedding_length", 1280)),
            n_ff=int(kv("feed_forward_length", 5120)),
            n_layer=int(kv("block_count", 32)),
            n_head=int(kv("attention.head_count", 20)),
            proj_dim=int(kv("projection_dim", 4096)),
            n_mel=int(kv("num_mel_bins", 128)),
            eps=float(kv("attention.layer_norm_epsilon", 1e-5)),
            stack_factor=int(kv("projector.stack_factor", 0) or 8),
        )


# ---------------------------------------------------------------------------
# log-mel front-end (matches HF WhisperFeatureExtractor)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    # slaney scale: linear below 1 kHz (mel = 3f/200), log above
    f = np.asarray(f, np.float64)
    return np.where(
        f >= 1000.0,
        15.0 + 27.0 * np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4),
        3.0 * f / 200.0,
    )


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
    return f


def mel_filter_bank(n_mel: int, n_fft: int = N_FFT, sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-normalized triangular filters [n_mel, n_fft//2 + 1] — the
    bank HF's WhisperFeatureExtractor builds (audio_utils.mel_filter_bank
    with norm='slaney', mel_scale='slaney')."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(sr / 2.0),
                          n_mel + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # [n_freq, n_mel+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up)).T  # [n_mel, n_freq]
    enorm = 2.0 / (hz_pts[2 : n_mel + 2] - hz_pts[:n_mel])
    return (fb * enorm[:, None]).astype(np.float64)


def log_mel(wave: np.ndarray, n_mel: int, pad_to: int = 0) -> np.ndarray:
    """Waveform (16 kHz mono f32) -> [n_mel, T] whisper log-mel features.
    `pad_to` zero-pads the waveform to a fixed sample count first (HF
    pads to 30 s = 480000 samples before featurizing)."""
    wave = np.asarray(wave, np.float64).reshape(-1)
    if pad_to and len(wave) < pad_to:
        wave = np.concatenate([wave, np.zeros(pad_to - len(wave))])
    window = np.hanning(N_FFT + 1)[:-1]
    half = N_FFT // 2
    padded = np.pad(wave, (half, half), mode="reflect")
    n_frames = 1 + (len(padded) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
    frames = padded[idx] * window
    spec = np.abs(np.fft.rfft(frames, axis=-1)) ** 2  # [T, n_freq]
    mel = mel_filter_bank(n_mel) @ spec.T  # [n_mel, T]
    log_spec = np.log10(np.maximum(mel, 1e-10))[:, :-1]  # HF drops last frame
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def load_wav(data: bytes | str) -> np.ndarray:
    """WAV bytes/path -> 16 kHz mono f32 (linear resample if needed)."""
    import io
    import wave as wavmod

    fh = io.BytesIO(data) if isinstance(data, bytes) else open(data, "rb")
    with wavmod.open(fh, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        ch = w.getnchannels()
        raw = w.readframes(n)
    dt = {1: np.int8, 2: np.int16, 4: np.int32}[sw]
    x = np.frombuffer(raw, dt).astype(np.float32) / float(2 ** (8 * sw - 1))
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if sr != SAMPLE_RATE:
        t = np.arange(int(len(x) * SAMPLE_RATE / sr)) * (sr / SAMPLE_RATE)
        x = np.interp(t, np.arange(len(x)), x).astype(np.float32)
    return x


# ---------------------------------------------------------------------------
# encoder + projectors
# ---------------------------------------------------------------------------

def load_audio_mmproj(f, names: set):
    """Audio tensors from an open GGUF (shared mmproj may carry both
    modalities).  Returns (params, AudioConfig)."""
    cfg = AudioConfig.from_gguf(f)

    def get(name):
        return jnp.asarray(f.tensor_f32(name))

    def opt(name):
        return get(name) if name in names else None

    p: dict = {}
    for i in (1, 2):
        cw = f.tensor_f32(f"a.conv1d.{i}.weight")  # [n_embd, c_in, 3]
        p[f"conv{i}_w"] = jnp.asarray(cw.reshape(cfg.n_embd, -1, 3))
        p[f"conv{i}_b"] = get(f"a.conv1d.{i}.bias")
    p["pos_embd"] = get("a.position_embd.weight")
    p["post_ln"] = opt("a.post_ln.weight")
    p["post_ln_b"] = opt("a.post_ln.bias")
    layers = []
    for il in range(cfg.n_layer):
        pre = f"a.blk.{il}."
        lay = {}
        for src, dst in (
            ("attn_q", "wq"), ("attn_k", "wk"), ("attn_v", "wv"),
            ("attn_out", "wo"), ("ffn_up", "up"), ("ffn_down", "down"),
            ("ffn_gate", "gate"), ("ln1", "ln1"), ("ln2", "ln2"),
        ):
            w = opt(pre + src + ".weight")
            if w is not None and dst not in ("ln1", "ln2"):
                w = w.T
            lay[dst] = w
            lay[dst + "_b"] = opt(pre + src + ".bias")
        lay["ls1"] = lay["ls2"] = None
        layers.append(lay)
    p["layers"] = layers
    if cfg.proj_type == "qwen2a":
        p["fc"] = get("mm.a.fc.weight").T
        p["fc_b"] = opt("mm.a.fc.bias")
    elif cfg.proj_type in ("ultravox", "voxtral"):
        p["mm_1"] = get("mm.a.mlp.1.weight").T
        p["mm_1_b"] = opt("mm.a.mlp.1.bias")
        p["mm_2"] = get("mm.a.mlp.2.weight").T
        p["mm_2_b"] = opt("mm.a.mlp.2.bias")
        if cfg.proj_type == "ultravox":
            p["norm_pre"] = get("mm.a.norm_pre.weight")
            p["norm_mid"] = get("mm.a.norm_mid.weight")
    else:
        raise NotImplementedError(f"audio projector type: {cfg.proj_type}")
    return p, cfg


def _conv1d(x, w, b, stride: int):
    """x [C_in, T], w [C_out, C_in, K] 'same' padding -> [C_out, T/stride]."""
    k = w.shape[-1]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride,), padding=[(pad, pad)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]
    return y + b[:, None]


@functools.partial(jax.jit, static_argnames=("cfg",))
def audio_forward(params, cfg: AudioConfig, mel: jax.Array) -> jax.Array:
    """[n_mel, T] log-mel -> [n_tokens, proj_dim] LM-space embeddings."""
    x = _act(_conv1d(mel.astype(jnp.float32), params["conv1_w"],
                     params["conv1_b"], 1), "gelu_erf")
    x = _act(_conv1d(x, params["conv2_w"], params["conv2_b"], 2), "gelu_erf")
    x = x.T  # [T/2, C]
    x = x + params["pos_embd"][: x.shape[0]]
    for lay in params["layers"]:
        x = _vit_block(lay, cfg, x)
    if cfg.proj_type == "qwen2a":
        # HF Qwen2AudioEncoder: avg-pool(2) BEFORE the final layer norm
        t = x.shape[0] - x.shape[0] % 2
        x = x[:t].reshape(t // 2, 2, -1).mean(axis=1)
        x = _ln(x, params["post_ln"], params["post_ln_b"], cfg.eps)
        y = x @ params["fc"]
        return y + params["fc_b"] if params["fc_b"] is not None else y
    if params["post_ln"] is not None:
        x = _ln(x, params["post_ln"], params["post_ln_b"], cfg.eps)
    # frame stacking (ultravox StackAudioFrames): pad T to a multiple of
    # the stack factor, group sf frames on the channel dim
    sf = cfg.stack_factor
    t = x.shape[0]
    tpad = -(-t // sf) * sf
    x = jnp.pad(x, ((0, tpad - t), (0, 0)))
    x = x.reshape(tpad // sf, sf * x.shape[-1])
    if cfg.proj_type == "ultravox":
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-6) * params["norm_pre"]
        h = x @ params["mm_1"]
        gate, up = jnp.split(h, 2, axis=-1)
        # swiglu with swapped halves (ultravox_model.py SwiGLU: silu on
        # the SECOND half; reference ggml_swiglu_swapped)
        h = jax.nn.silu(up) * gate
        ms = jnp.mean(jnp.square(h), axis=-1, keepdims=True)
        h = h * jax.lax.rsqrt(ms + 1e-6) * params["norm_mid"]
        return h @ params["mm_2"]
    # voxtral: gelu-erf MLP
    h = _act(x @ params["mm_1"] + (params["mm_1_b"] if params["mm_1_b"] is not None else 0),
             "gelu_erf")
    return h @ params["mm_2"] + (params["mm_2_b"] if params["mm_2_b"] is not None else 0)


class AudioModel:
    """Loaded audio mmproj: preprocess + encode convenience wrapper."""

    def __init__(self, path: str):
        from ..gguf.reader import read_gguf

        f = read_gguf(path)
        try:
            self.params, self.cfg = load_audio_mmproj(f, set(f.tensors))
        finally:
            f.close()

    def encode(self, mel) -> jax.Array:
        return audio_forward(self.params, self.cfg, jnp.asarray(mel))

    def encode_audio(self, audio, pad_to: int = 0) -> jax.Array:
        """WAV bytes/path or waveform array -> LM embeddings."""
        return encode_audio(self.params, self.cfg, audio, pad_to=pad_to)


def encode_audio(params, cfg: AudioConfig, audio, pad_to: int = 0) -> jax.Array:
    """Preprocess + encode one clip.  The 30 s whisper window is capped by
    the checkpoint's position table (pos rows x 2 mel frames); longer
    audio is truncated like the reference's 30 s chunking."""
    wave = audio if isinstance(audio, np.ndarray) else load_wav(audio)
    if not pad_to:
        max_frames = 2 * int(params["pos_embd"].shape[0])
        pad_to = min(30 * SAMPLE_RATE, max_frames * HOP)
    wave = wave[:pad_to]
    return audio_forward(params, cfg, jnp.asarray(log_mel(wave, cfg.n_mel, pad_to=pad_to)))
