"""TTS vocoder: the WavTokenizer decoder verified against a direct numpy
implementation of the reference graph (src/models/wavtokenizer-dec.cpp)
and the iSTFT overlap-add (tools/tts/tts.cpp embd_to_audio), plus the
tools/tts.py codes->wav flow end to end."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.gguf.writer import GGUFWriter

V, F, C, NCN, NFF, NOUT, NG = 80, 16, 32, 2, 48, 66, 4
NFFT, NHOP = 64, 16  # tiny iSTFT geometry for the test (NOUT = NFFT + 2)


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def _make_gguf(path, rng):
    w = GGUFWriter(path)
    w.add("general.architecture", "wavtokenizer-dec")
    w.add("wavtokenizer-dec.block_count", 6)
    w.add("wavtokenizer-dec.attention.group_norm_groups", NG)
    w.add("wavtokenizer-dec.attention.group_norm_epsilon", 1e-6)
    t = {}
    t["tok_embd"] = _w(rng, V, F)
    t["conv1d"] = _w(rng, C, F, 7)
    t["conv1d_b"] = _w(rng, C)
    w.add_tensor("token_embd.weight", t["tok_embd"], GGMLType.F32)
    w.add_tensor("conv1d.weight", t["conv1d"], GGMLType.F32)
    w.add_tensor("conv1d.bias", t["conv1d_b"], GGMLType.F32)
    for il in (0, 1, 3, 4):
        for nm, shape in (("norm1", (C,)), ("norm2", (C,))):
            t[f"p{il}_{nm}"] = _w(rng, *shape) + 1.0
            t[f"p{il}_{nm}_b"] = _w(rng, *shape)
            w.add_tensor(f"posnet.{il}.{nm}.weight", t[f"p{il}_{nm}"], GGMLType.F32)
            w.add_tensor(f"posnet.{il}.{nm}.bias", t[f"p{il}_{nm}_b"], GGMLType.F32)
        for nm in ("conv1", "conv2"):
            t[f"p{il}_{nm}"] = _w(rng, C, C, 3)
            t[f"p{il}_{nm}_b"] = _w(rng, C)
            w.add_tensor(f"posnet.{il}.{nm}.weight", t[f"p{il}_{nm}"], GGMLType.F32)
            w.add_tensor(f"posnet.{il}.{nm}.bias", t[f"p{il}_{nm}_b"], GGMLType.F32)
    t["p2_attn_norm"] = _w(rng, C) + 1.0
    t["p2_attn_norm_b"] = _w(rng, C)
    w.add_tensor("posnet.2.attn_norm.weight", t["p2_attn_norm"], GGMLType.F32)
    w.add_tensor("posnet.2.attn_norm.bias", t["p2_attn_norm_b"], GGMLType.F32)
    for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
        t[f"p2_{nm}"] = _w(rng, C, C, 1)
        t[f"p2_{nm}_b"] = _w(rng, C)
        w.add_tensor(f"posnet.2.{nm}.weight", t[f"p2_{nm}"], GGMLType.F32)
        w.add_tensor(f"posnet.2.{nm}.bias", t[f"p2_{nm}_b"], GGMLType.F32)
    t["p5_norm"] = _w(rng, C) + 1.0
    t["p5_norm_b"] = _w(rng, C)
    w.add_tensor("posnet.5.attn_norm.weight", t["p5_norm"], GGMLType.F32)
    w.add_tensor("posnet.5.attn_norm.bias", t["p5_norm_b"], GGMLType.F32)
    t["tok_norm"] = _w(rng, C) + 1.0
    t["tok_norm_b"] = _w(rng, C)
    w.add_tensor("token_embd_norm.weight", t["tok_norm"], GGMLType.F32)
    w.add_tensor("token_embd_norm.bias", t["tok_norm_b"], GGMLType.F32)
    for il in range(NCN):
        t[f"c{il}_dw"] = _w(rng, C, 1, 7)
        t[f"c{il}_dw_b"] = _w(rng, C)
        t[f"c{il}_norm"] = _w(rng, C) + 1.0
        t[f"c{il}_norm_b"] = _w(rng, C)
        t[f"c{il}_pw1"] = _w(rng, NFF, C)
        t[f"c{il}_pw1_b"] = _w(rng, NFF)
        t[f"c{il}_pw2"] = _w(rng, C, NFF)
        t[f"c{il}_pw2_b"] = _w(rng, C)
        t[f"c{il}_gamma"] = _w(rng, C)
        for nm in ("dw", "norm", "pw1", "pw2"):
            w.add_tensor(f"convnext.{il}.{nm}.weight", t[f"c{il}_{nm}"], GGMLType.F32)
            w.add_tensor(f"convnext.{il}.{nm}.bias", t[f"c{il}_{nm}_b"], GGMLType.F32)
        w.add_tensor(f"convnext.{il}.gamma.weight", t[f"c{il}_gamma"], GGMLType.F32)
    t["out_norm"] = _w(rng, C) + 1.0
    t["out_norm_b"] = _w(rng, C)
    t["output"] = _w(rng, NOUT, C)
    t["output_b"] = _w(rng, NOUT)
    w.add_tensor("output_norm.weight", t["out_norm"], GGMLType.F32)
    w.add_tensor("output_norm.bias", t["out_norm_b"], GGMLType.F32)
    w.add_tensor("output.weight", t["output"], GGMLType.F32)
    w.add_tensor("output.bias", t["output_b"], GGMLType.F32)
    w.write()
    return t


def _conv_np(x, wt, b, pad):
    """x [Cin, T]; wt [Cout, Cin, K] same-pad conv."""
    cout, cin, k = wt.shape
    xp = np.pad(x, ((0, 0), (pad, k - 1 - pad)))
    out = np.zeros((cout, x.shape[1]))
    for ti in range(x.shape[1]):
        out[:, ti] = np.einsum("oik,ik->o", wt, xp[:, ti : ti + k]) + b
    return out


def _gn(x, wt, b, groups, eps=1e-6):
    c, tt = x.shape
    g = x.reshape(groups, c // groups, tt)
    mu = g.mean(axis=(1, 2), keepdims=True)
    var = g.var(axis=(1, 2), keepdims=True)
    g = (g - mu) / np.sqrt(var + eps)
    return g.reshape(c, tt) * wt[:, None] + b[:, None]


def _lnr(x, wt, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps) * wt + b


def _gelu(x):
    return 0.5 * x * (1.0 + np.tanh(0.7978845608 * (x + 0.044715 * x**3)))


def _spec_decode(t, codes):
    x = t["tok_embd"][codes].astype(np.float64)
    cur = _conv_np(x.T, t["conv1d"], t["conv1d_b"], 3)
    for il in range(6):
        inp = cur
        if il in (0, 1, 3, 4):
            h = _gn(cur, t[f"p{il}_norm1"], t[f"p{il}_norm1_b"], NG)
            h = h / (1.0 + np.exp(-h)) * 1.0 if False else h * (1.0 / (1.0 + np.exp(-h)))
            h = _conv_np(h, t[f"p{il}_conv1"], t[f"p{il}_conv1_b"], 1)
            h = _gn(h, t[f"p{il}_norm2"], t[f"p{il}_norm2_b"], NG)
            h = h * (1.0 / (1.0 + np.exp(-h)))
            cur = inp + _conv_np(h, t[f"p{il}_conv2"], t[f"p{il}_conv2_b"], 1)
        elif il == 2:
            h = _gn(cur, t["p2_attn_norm"], t["p2_attn_norm_b"], NG)
            q = _conv_np(h, t["p2_attn_q"], t["p2_attn_q_b"], 0).T
            k = _conv_np(h, t["p2_attn_k"], t["p2_attn_k_b"], 0).T
            v = _conv_np(h, t["p2_attn_v"], t["p2_attn_v_b"], 0)
            s = q @ k.T / np.sqrt(C)
            s = np.exp(s - s.max(-1, keepdims=True))
            s /= s.sum(-1, keepdims=True)
            o = v @ s.T
            cur = inp + _conv_np(o, t["p2_attn_output"], t["p2_attn_output_b"], 0)
        else:
            cur = _gn(cur, t["p5_norm"], t["p5_norm_b"], NG)
    x = _lnr(cur.T, t["tok_norm"], t["tok_norm_b"])
    for il in range(NCN):
        inp = x
        dw = t[f"c{il}_dw"]  # [C, 1, 7]
        h = np.stack([
            np.convolve(np.pad(x[:, ci], (3, 3)), dw[ci, 0][::-1], "valid")
            for ci in range(C)
        ], axis=1) + t[f"c{il}_dw_b"]
        h = _lnr(h, t[f"c{il}_norm"], t[f"c{il}_norm_b"])
        h = _gelu(h @ t[f"c{il}_pw1"].T + t[f"c{il}_pw1_b"])
        h = h @ t[f"c{il}_pw2"].T + t[f"c{il}_pw2_b"]
        x = inp + h * t[f"c{il}_gamma"]
    x = _lnr(x, t["out_norm"], t["out_norm_b"])
    return x @ t["output"].T + t["output_b"]


def test_wavtokenizer_matches_numpy_spec(tmp_path):
    from zllm.models.wavtokenizer import load_wavtokenizer, wavtok_decode

    rng = np.random.default_rng(0)
    path = str(tmp_path / "wavtok.gguf")
    t = _make_gguf(path, rng)
    params, cfg = load_wavtokenizer(path)
    assert cfg.n_embd == C and cfg.n_out == NOUT and cfg.n_convnext == NCN

    codes = np.random.default_rng(1).integers(0, V, 12).astype(np.int32)
    got = np.asarray(wavtok_decode(params, cfg, codes))
    want = _spec_decode(t, codes)
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_istft_overlap_add_reference_semantics():
    """embd_to_audio must reproduce the reference fold/irfft pipeline:
    a constant-magnitude zero-phase spectrum renders a finite waveform of
    exactly n_codes*hop samples with env-normalized overlap."""
    from zllm.models.wavtokenizer import embd_to_audio

    n_codes = 9
    rng = np.random.default_rng(2)
    embd = np.concatenate([
        rng.standard_normal((n_codes, NFFT // 2 + 1)) * 0.1,
        rng.uniform(-np.pi, np.pi, (n_codes, NFFT // 2 + 1)),
    ], axis=1)
    audio = embd_to_audio(embd, n_fft=NFFT, n_hop=NHOP)
    assert audio.shape[0] == (n_codes - 1) * NHOP + NFFT - 2 * (NFFT - NHOP) // 2
    assert np.isfinite(audio).all()


def test_tts_codes_to_wav(tmp_path):
    """End-to-end codes -> wav through the tool entry point."""
    import struct
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "tools"))
    from tts import codes_to_wav

    rng = np.random.default_rng(3)
    path = str(tmp_path / "voc.gguf")
    _make_gguf(path, rng)
    codes = rng.integers(0, V, 16).tolist()
    out = str(tmp_path / "out.wav")
    codes_to_wav(path, codes, out, sample_rate=24000)
    with open(out, "rb") as fh:
        hdr = fh.read(44)
        data = fh.read()
    assert hdr[:4] == b"RIFF" and hdr[8:12] == b"WAVE"
    rate = struct.unpack("<I", hdr[24:28])[0]
    assert rate == 24000
    assert len(data) > 0 and len(data) % 2 == 0
