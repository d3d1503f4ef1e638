"""WavTokenizer decoder — the vocoder half of the TTS pipeline.

The counterpart of the reference's `wavtokenizer-dec` arch
(src/models/wavtokenizer-dec.cpp): audio codebook tokens -> embedding ->
a PosNet conv stack (resnet / resnet / attention / resnet / resnet /
group-norm) -> token LayerNorm -> ConvNeXt blocks (depthwise conv + LN +
GELU MLP + gamma) -> linear head producing per-code STFT coefficients
(log-magnitudes | phases), plus the inverse-STFT overlap-add that turns
them into waveform samples (tools/tts/tts.cpp embd_to_audio:201-280).

TPU mapping: all convs run as jax.lax conv_general_dilated over the
[C, T] plane; the iSTFT is a batched numpy irfft (host-side — it runs
once per utterance and is memory-bound).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class WavTokConfig:
    n_vocab: int
    n_embd_features: int  # codebook embedding width
    n_embd: int  # posnet/convnext width
    n_convnext: int
    n_ff: int
    n_out: int  # spec coefficients per code (n_fft/2+1 mags + phases)
    n_groups: int = 32
    group_eps: float = 1e-6
    eps: float = 1e-5
    n_fft: int = 1280
    n_hop: int = 320


def load_wavtokenizer(path: str):
    """wavtokenizer-dec GGUF -> (params, WavTokConfig); tensor names per
    the reference's LLM_ARCH_WAVTOKENIZER_DEC table
    (src/llama-arch.cpp:472-487, llama-model.cpp:5917-6010)."""
    from ..gguf.reader import read_gguf

    f = read_gguf(path)
    try:
        arch = f.architecture

        def kv(key, default=None):
            v = f.kv(f"{arch}.{key}")
            return default if v is None else v

        names = set(f.tensors)

        def get(name):
            return jnp.asarray(f.tensor_f32(name))

        p: dict = {"layers": [], "convnext": []}
        p["tok_embd"] = get("token_embd.weight")
        p["conv1d"] = get("conv1d.weight")  # [C, F, 7]
        p["conv1d_b"] = get("conv1d.bias").reshape(-1)
        n_posnet = 0
        while f"posnet.{n_posnet}.conv1.weight" in names or \
                f"posnet.{n_posnet}.attn_norm.weight" in names:
            n_posnet += 1
        for il in range(n_posnet):
            pre = f"posnet.{il}."
            lay = {}
            for nm in ("norm1", "norm2", "attn_norm"):
                if pre + nm + ".weight" in names:
                    lay[nm] = get(pre + nm + ".weight").reshape(-1)
                    lay[nm + "_b"] = get(pre + nm + ".bias").reshape(-1)
            for nm in ("conv1", "conv2", "attn_q", "attn_k", "attn_v",
                       "attn_output"):
                if pre + nm + ".weight" in names:
                    lay[nm] = get(pre + nm + ".weight")
                    lay[nm + "_b"] = get(pre + nm + ".bias").reshape(-1)
            p["layers"].append(lay)
        p["tok_norm"] = get("token_embd_norm.weight")
        p["tok_norm_b"] = get("token_embd_norm.bias")
        n_convnext = 0
        while f"convnext.{n_convnext}.dw.weight" in names:
            n_convnext += 1
        for il in range(n_convnext):
            pre = f"convnext.{il}."
            p["convnext"].append({
                "dw": get(pre + "dw.weight"),
                "dw_b": get(pre + "dw.bias").reshape(-1),
                "norm": get(pre + "norm.weight"),
                "norm_b": get(pre + "norm.bias"),
                "pw1": get(pre + "pw1.weight"),
                "pw1_b": get(pre + "pw1.bias"),
                "pw2": get(pre + "pw2.weight"),
                "pw2_b": get(pre + "pw2.bias"),
                "gamma": get(pre + "gamma.weight").reshape(-1),
            })
        p["out_norm"] = get("output_norm.weight")
        p["out_norm_b"] = get("output_norm.bias")
        p["output"] = get("output.weight")
        p["output_b"] = get("output.bias")
        cfg = WavTokConfig(
            n_vocab=p["tok_embd"].shape[0],
            n_embd_features=p["tok_embd"].shape[1],
            n_embd=p["conv1d"].shape[0],
            n_convnext=n_convnext,
            n_ff=p["convnext"][0]["pw1"].shape[0] if n_convnext else 0,
            n_out=p["output"].shape[0],
            n_groups=int(kv("attention.group_norm_groups", 32)),
            group_eps=float(kv("attention.group_norm_epsilon", 1e-6)),
            # head emits n_fft/2+1 log-mags + as many phases; hop = fft/4
            # (reference tts.cpp:206-207: n_fft 1280, n_hop 320 at n_out 1282)
            n_fft=(p["output"].shape[0] // 2 - 1) * 2,
            n_hop=(p["output"].shape[0] // 2 - 1) // 2,
        )
        return p, cfg
    finally:
        f.close()


def _conv1d_same(x, w, b, groups=1):
    """x [C_in, T]; w [C_out, C_in/groups, K] -> [C_out, T] (same pad)."""
    k = w.shape[-1]
    out = jax.lax.conv_general_dilated(
        x[None], w, (1,), [(k // 2, (k - 1) // 2)],
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=groups)
    return out[0] + b[:, None]


def _group_norm(x, w, b, groups, eps):
    """x [C, T]: normalize each channel-group over (C/g, T) then scale
    per channel (reference build_norm LLM_NORM_GROUP)."""
    c, t = x.shape
    g = x.reshape(groups, c // groups, t)
    mu = g.mean(axis=(1, 2), keepdims=True)
    var = jnp.var(g, axis=(1, 2), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(c, t) * w[:, None] + b[:, None]


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def wavtok_decode(params, cfg: WavTokConfig, codes) -> jax.Array:
    """codes [T] int32 -> spec embd [T, n_out] (log-mags | phases)."""
    p = params
    x = p["tok_embd"][jnp.asarray(codes, jnp.int32)]  # [T, F]
    cur = _conv1d_same(x.T, p["conv1d"], p["conv1d_b"])  # [C, T]
    for il, lay in enumerate(p["layers"]):
        inp = cur
        if "conv1" in lay:  # resnet block
            h = _group_norm(cur, lay["norm1"], lay["norm1_b"],
                            cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            h = _conv1d_same(h, lay["conv1"], lay["conv1_b"])
            h = _group_norm(h, lay["norm2"], lay["norm2_b"],
                            cfg.n_groups, cfg.group_eps)
            h = h * jax.nn.sigmoid(h)
            cur = inp + _conv1d_same(h, lay["conv2"], lay["conv2_b"])
        elif "attn_q" in lay:  # single-head attention block
            h = _group_norm(cur, lay["attn_norm"], lay["attn_norm_b"],
                            cfg.n_groups, cfg.group_eps)
            q = _conv1d_same(h, lay["attn_q"], lay["attn_q_b"]).T  # [T, C]
            k = _conv1d_same(h, lay["attn_k"], lay["attn_k_b"]).T
            v = _conv1d_same(h, lay["attn_v"], lay["attn_v_b"])  # [C, T]
            att = jax.nn.softmax(q @ k.T / np.sqrt(cfg.n_embd), axis=-1)
            o = v @ att.T  # [C, T]
            cur = inp + _conv1d_same(o, lay["attn_output"], lay["attn_output_b"])
        else:  # trailing group norm
            cur = _group_norm(cur, lay["attn_norm"], lay["attn_norm_b"],
                              cfg.n_groups, cfg.group_eps)
    x = _ln(cur.T, p["tok_norm"], p["tok_norm_b"], cfg.eps)  # [T, C]
    for lay in p["convnext"]:
        inp = x
        h = _conv1d_same(x.T, lay["dw"], lay["dw_b"],
                         groups=x.shape[-1]).T  # depthwise k=7
        h = _ln(h, lay["norm"], lay["norm_b"], cfg.eps)
        h = jax.nn.gelu(h @ lay["pw1"].T + lay["pw1_b"], approximate=True)
        h = h @ lay["pw2"].T + lay["pw2_b"]
        x = inp + h * lay["gamma"]
    x = _ln(x, p["out_norm"], p["out_norm_b"], cfg.eps)
    return x @ p["output"].T + p["output_b"]


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280, n_hop: int = 320) -> np.ndarray:
    """Per-code STFT coefficients -> waveform via hann overlap-add
    (reference tools/tts/tts.cpp embd_to_audio:201-280): first half are
    log-magnitudes (clamped at 1e2), second half phases."""
    embd = np.asarray(embd, np.float64)
    n_codes, n_out = embd.shape
    half = n_out // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * (np.cos(phi) + 1j * np.sin(phi))  # [T, n_fft/2+1]
    frames = np.fft.irfft(spec, n=n_fft, axis=-1)  # [T, n_fft]
    hann = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    frames = frames * hann[None]
    n_pad = (n_fft - n_hop) // 2
    n_out_len = (n_codes - 1) * n_hop + n_fft
    audio = np.zeros(n_out_len)
    env = np.zeros(n_out_len)
    for i in range(n_codes):
        start = i * n_hop - n_pad
        lo = max(start, 0)
        hi = min(start + n_fft, n_out_len)
        audio[lo:hi] += frames[i, lo - start : hi - start]
        env[lo:hi] += (hann * hann)[lo - start : hi - start]
    audio = audio[n_pad : n_out_len - n_pad]
    env = env[n_pad : n_out_len - n_pad]
    return (audio / np.maximum(env, 1e-8)).astype(np.float32)


def save_wav16(path: str, audio: np.ndarray, sample_rate: int = 24000):
    """16-bit mono PCM writer (reference tts.cpp save_wav16:92-120)."""
    import struct

    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with open(path, "wb") as fh:
        data = pcm.tobytes()
        fh.write(b"RIFF")
        fh.write(struct.pack("<I", 36 + len(data)))
        fh.write(b"WAVEfmt ")
        fh.write(struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             sample_rate * 2, 2, 16))
        fh.write(b"data")
        fh.write(struct.pack("<I", len(data)))
        fh.write(data)
    return path
