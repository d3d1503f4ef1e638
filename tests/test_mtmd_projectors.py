"""mtmd projector breadth: internvl, llama4, pixtral, minicpmv resampler,
ldp, ldpv2 — each verified against a direct numpy implementation of the
reference graphs (tools/mtmd/models/{internvl,llama4,pixtral,minicpmv,
llava}.cpp; pixel-shuffle axis order cross-checked against a ggml-op
emulation)."""

import numpy as np
import pytest

from zllm.gguf.constants import GGMLType
from zllm.gguf.writer import GGUFWriter

C, NH, NL, FF, PS, IMG, PROJ = 32, 4, 2, 64, 8, 32, 48
SIDE = IMG // PS  # 4x4 patches
P = SIDE * SIDE


def _w(rng, *shape):
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


def _write_tower(w, rng, *, cls=False, pos=True, post_ln=True, rms=False):
    """Emit the shared ViT tensors; returns dict of numpy weights."""
    t = {}
    t["patch_w"] = _w(rng, C, 3, PS, PS)
    t["patch_b"] = _w(rng, C)
    w.add_tensor("v.patch_embd.weight", t["patch_w"], GGMLType.F32)
    w.add_tensor("v.patch_embd.bias", t["patch_b"], GGMLType.F32)
    if cls:
        t["cls"] = _w(rng, C)
        w.add_tensor("v.class_embd", t["cls"], GGMLType.F32)
    if pos:
        n_pos = P + (1 if cls else 0)
        t["pos"] = _w(rng, n_pos, C)
        w.add_tensor("v.position_embd.weight", t["pos"], GGMLType.F32)
    if post_ln:
        t["post_ln"] = _w(rng, C) + 1.0
        t["post_ln_b"] = _w(rng, C)
        w.add_tensor("v.post_ln.weight", t["post_ln"], GGMLType.F32)
        w.add_tensor("v.post_ln.bias", t["post_ln_b"], GGMLType.F32)
    t["layers"] = []
    for il in range(NL):
        lay = {}
        pre = f"v.blk.{il}."
        for nm in ("attn_q", "attn_k", "attn_v", "attn_out"):
            lay[nm] = _w(rng, C, C)
            lay[nm + "_b"] = _w(rng, C)
            w.add_tensor(pre + nm + ".weight", lay[nm], GGMLType.F32)
            w.add_tensor(pre + nm + ".bias", lay[nm + "_b"], GGMLType.F32)
        lay["up"] = _w(rng, FF, C)
        lay["up_b"] = _w(rng, FF)
        lay["down"] = _w(rng, C, FF)
        lay["down_b"] = _w(rng, C)
        w.add_tensor(pre + "ffn_up.weight", lay["up"], GGMLType.F32)
        w.add_tensor(pre + "ffn_up.bias", lay["up_b"], GGMLType.F32)
        w.add_tensor(pre + "ffn_down.weight", lay["down"], GGMLType.F32)
        w.add_tensor(pre + "ffn_down.bias", lay["down_b"], GGMLType.F32)
        for nm in ("ln1", "ln2"):
            lay[nm] = _w(rng, C) + 1.0
            w.add_tensor(pre + nm + ".weight", lay[nm], GGMLType.F32)
            if not rms:
                lay[nm + "_b"] = _w(rng, C)
                w.add_tensor(pre + nm + ".bias", lay[nm + "_b"], GGMLType.F32)
        t["layers"].append(lay)
    return t


def _kv_common(w, proj):
    w.add("general.architecture", "clip")
    w.add("clip.projector_type", proj)
    w.add("clip.use_gelu", True)
    w.add("clip.vision.embedding_length", C)
    w.add("clip.vision.feed_forward_length", FF)
    w.add("clip.vision.block_count", NL)
    w.add("clip.vision.attention.head_count", NH)
    w.add("clip.vision.projection_dim", PROJ)
    w.add("clip.vision.image_size", IMG)
    w.add("clip.vision.patch_size", PS)
    w.add("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add("clip.vision.image_std", [0.5, 0.5, 0.5])


def _ln(x, wt, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(x.var(-1, keepdims=True) + eps) * wt
    return y + b if b is not None else y


def _rmsn(x, wt, eps=1e-5):
    return x / np.sqrt(np.mean(x * x, -1, keepdims=True) + eps) * wt


def _gelu(x):
    # tanh-approximated gelu (clip.use_gelu=True -> zllm _act "gelu")
    return 0.5 * x * (1.0 + np.tanh(0.7978845608 * (x + 0.044715 * x**3)))


def _patchify(pix):
    g = pix.reshape(3, SIDE, PS, SIDE, PS)
    return g.transpose(1, 3, 0, 2, 4).reshape(P, 3 * PS * PS)


def _rope2d_np(x, pos_a, pos_b, base, interleave):
    t, h, d = x.shape
    half = d // 2
    hh = half // 2
    inv = base ** (-2.0 * np.arange(hh) / half)
    fs = base ** (-2.0 / d) if interleave else 1.0

    def rot(seg, pos, scale):
        ang = pos[:, None] * scale * inv[None]
        cos, sin = np.cos(ang)[:, None, :], np.sin(ang)[:, None, :]
        x1, x2 = seg[..., 0::2], seg[..., 1::2]
        out = np.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], -1)
        return out.reshape(t, h, half)

    return np.concatenate(
        [rot(x[..., :half], pos_a, 1.0), rot(x[..., half:], pos_b, fs)], -1)


def _vit_np(t, x, *, rms=False, rope2d=None):
    hd = C // NH
    for lay in t["layers"]:
        h = _rmsn(x, lay["ln1"]) if rms else _ln(x, lay["ln1"], lay["ln1_b"])
        q = (h @ lay["attn_q"].T + lay["attn_q_b"]).reshape(-1, NH, hd)
        k = (h @ lay["attn_k"].T + lay["attn_k_b"]).reshape(-1, NH, hd)
        v = (h @ lay["attn_v"].T + lay["attn_v_b"]).reshape(-1, NH, hd)
        if rope2d is not None:
            q = _rope2d_np(q, *rope2d)
            k = _rope2d_np(k, *rope2d)
        s = np.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        s = np.exp(s - s.max(-1, keepdims=True))
        s /= s.sum(-1, keepdims=True)
        o = np.einsum("hts,shd->thd", s, v).reshape(-1, C)
        x = x + o @ lay["attn_out"].T + lay["attn_out_b"]
        h = _rmsn(x, lay["ln2"]) if rms else _ln(x, lay["ln2"], lay["ln2_b"])
        u = _gelu(h @ lay["up"].T + lay["up_b"])
        x = x + u @ lay["down"].T + lay["down_b"]
    return x


def _pixshuf_np(x, m, second):
    g = x.reshape(SIDE, SIDE // m, m * x.shape[-1])
    g = g.transpose(1, 0, 2)
    g = g.reshape(SIDE // m, SIDE // m, m * m * x.shape[-1])
    if second:
        g = g.transpose(1, 0, 2)
    return g.reshape(-1, m * m * x.shape[-1])


def _encode(path, pix):
    import jax.numpy as jnp

    from zllm.mtmd.clip import clip_forward, load_mmproj

    params, cfg = load_mmproj(path)
    return np.asarray(clip_forward(params, cfg, jnp.asarray(pix))), cfg


@pytest.fixture()
def pix():
    return np.random.default_rng(42).standard_normal((3, IMG, IMG)).astype(np.float32)


def test_internvl_projector(tmp_path, pix):
    rng = np.random.default_rng(0)
    path = str(tmp_path / "internvl.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "internvl")
    w.add("clip.vision.projector.scale_factor", 2)
    t = _write_tower(w, rng, cls=True, pos=True, post_ln=True)
    mm = {"ln": _w(rng, 4 * C) + 1.0, "ln_b": _w(rng, 4 * C),
          "fc1": _w(rng, PROJ, 4 * C), "fc1_b": _w(rng, PROJ),
          "fc3": _w(rng, PROJ, PROJ), "fc3_b": _w(rng, PROJ)}
    w.add_tensor("mm.model.mlp.0.weight", mm["ln"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.0.bias", mm["ln_b"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.1.weight", mm["fc1"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.1.bias", mm["fc1_b"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.3.weight", mm["fc3"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.3.bias", mm["fc3_b"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.n_tokens == P // 4

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = np.concatenate([x, t["cls"][None]], axis=0)  # CLS appended LAST
    x = x + t["pos"][: x.shape[0]]
    x = _vit_np(t, x)
    x = _ln(x, t["post_ln"], t["post_ln_b"])
    g = _pixshuf_np(x[:P], 2, second=True)
    g = _ln(g, mm["ln"], mm["ln_b"])
    g = _gelu(g @ mm["fc1"].T + mm["fc1_b"])
    want = g @ mm["fc3"].T + mm["fc3_b"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_llama4_projector(tmp_path, pix):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "llama4.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "llama4")
    w.add("clip.vision.projector.scale_factor", 2)
    t = _write_tower(w, rng, cls=True, pos=True, post_ln=True)
    mm = {"m1": _w(rng, PROJ, 4 * C), "m2": _w(rng, PROJ, PROJ),
          "proj": _w(rng, PROJ, PROJ)}
    w.add_tensor("mm.model.mlp.1.weight", mm["m1"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.2.weight", mm["m2"], GGMLType.F32)
    w.add_tensor("mm.model.fc.weight", mm["proj"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.n_tokens == P // 4

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = np.concatenate([x, t["cls"][None]], axis=0)
    x = x + t["pos"][: x.shape[0]]
    yy = np.repeat(np.arange(SIDE), SIDE)
    xx = np.tile(np.arange(SIDE), SIDE)
    pos_x = np.concatenate([xx, [0]]).astype(np.float64)
    pos_y = np.concatenate([yy, [0]]).astype(np.float64)
    x = _vit_np(t, x, rope2d=(pos_x, pos_y, 10000.0, False))
    x = _ln(x, t["post_ln"], t["post_ln_b"])
    g = _pixshuf_np(x[:P], 2, second=False)
    g = _gelu(g @ mm["m1"].T)
    g = _gelu(g @ mm["m2"].T)
    want = g @ mm["proj"].T
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pixtral_projector(tmp_path, pix):
    rng = np.random.default_rng(2)
    path = str(tmp_path / "pixtral.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "pixtral")
    t = _write_tower(w, rng, cls=False, pos=False, post_ln=False, rms=True)
    mm = {"m1": _w(rng, PROJ, C), "m1_b": _w(rng, PROJ),
          "m2": _w(rng, PROJ, PROJ), "m2_b": _w(rng, PROJ),
          "brk": _w(rng, PROJ)}
    w.add_tensor("mm.1.weight", mm["m1"], GGMLType.F32)
    w.add_tensor("mm.1.bias", mm["m1_b"], GGMLType.F32)
    w.add_tensor("mm.2.weight", mm["m2"], GGMLType.F32)
    w.add_tensor("mm.2.bias", mm["m2_b"], GGMLType.F32)
    w.add_tensor("v.token_embd.img_break", mm["brk"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.norm_kind == "rms"
    assert cfg.n_tokens == P + SIDE - 1

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    yy = np.repeat(np.arange(SIDE), SIDE).astype(np.float64)
    xx = np.tile(np.arange(SIDE), SIDE).astype(np.float64)
    x = _vit_np(t, x, rms=True, rope2d=(yy, xx, 10000.0, True))
    y = _gelu(x @ mm["m1"].T + mm["m1_b"]) @ mm["m2"].T + mm["m2_b"]
    y = y.reshape(SIDE, SIDE, PROJ)
    brk = np.broadcast_to(mm["brk"], (SIDE, 1, PROJ))
    want = np.concatenate([y, brk], axis=1).reshape(-1, PROJ)[:-1]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_minicpmv_resampler(tmp_path, pix):
    rng = np.random.default_rng(3)
    nq, dproj = 8, 64  # resampler dim; d_head falls back to dproj/n_head
    path = str(tmp_path / "minicpmv.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "resampler")
    w.add("clip.minicpmv_query_num", nq)
    t = _write_tower(w, rng, cls=False, pos=True, post_ln=True)
    mm = {"query": _w(rng, nq, dproj), "proj": _w(rng, dproj, dproj),
          "kv": _w(rng, dproj, C)}
    w.add_tensor("resampler.query", mm["query"], GGMLType.F32)
    w.add_tensor("resampler.proj.weight", mm["proj"], GGMLType.F32)
    w.add_tensor("resampler.kv.weight", mm["kv"], GGMLType.F32)
    for nm in ("q", "k", "v", "out"):
        mm[f"a_{nm}"] = _w(rng, dproj, dproj)
        mm[f"a_{nm}_b"] = _w(rng, dproj)
        w.add_tensor(f"resampler.attn.{nm}.weight", mm[f"a_{nm}"], GGMLType.F32)
        w.add_tensor(f"resampler.attn.{nm}.bias", mm[f"a_{nm}_b"], GGMLType.F32)
    for nm in ("q", "kv", "post"):
        mm[f"ln_{nm}"] = _w(rng, dproj) + 1.0
        mm[f"ln_{nm}_b"] = _w(rng, dproj)
        w.add_tensor(f"resampler.ln_{nm}.weight", mm[f"ln_{nm}"], GGMLType.F32)
        w.add_tensor(f"resampler.ln_{nm}.bias", mm[f"ln_{nm}_b"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert got.shape[0] == nq

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = x + t["pos"][:P]
    x = _vit_np(t, x)
    x = _ln(x, t["post_ln"], t["post_ln_b"])
    v = x @ mm["kv"].T
    q = _ln(mm["query"], mm["ln_q"], mm["ln_q_b"])
    v = _ln(v, mm["ln_kv"], mm["ln_kv_b"])
    quarter = dproj // 4
    omega = 1.0 / (10000.0 ** (np.arange(quarter) / quarter))
    yy = np.repeat(np.arange(SIDE), SIDE).astype(np.float64)
    xx = np.tile(np.arange(SIDE), SIDE).astype(np.float64)
    tx, ty = xx[:, None] * omega, yy[:, None] * omega
    pos = np.concatenate([np.sin(tx), np.cos(tx), np.sin(ty), np.cos(ty)], -1)
    k = v + pos
    n_head = max(dproj // 128, 1)
    dh = dproj // n_head
    Q = (q @ mm["a_q"].T + mm["a_q_b"]).reshape(nq, n_head, dh)
    K = (k @ mm["a_k"].T + mm["a_k_b"]).reshape(P, n_head, dh)
    V = (v @ mm["a_v"].T + mm["a_v_b"]).reshape(P, n_head, dh)
    s = np.einsum("qhd,khd->hqk", Q, K) / np.sqrt(dh)
    s = np.exp(s - s.max(-1, keepdims=True))
    s /= s.sum(-1, keepdims=True)
    o = np.einsum("hqk,khd->qhd", s, V).reshape(nq, dproj)
    o = o @ mm["a_out"].T + mm["a_out_b"]
    o = _ln(o, mm["ln_post"], mm["ln_post_b"])
    want = o @ mm["proj"]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ldpv2_projector(tmp_path, pix):
    rng = np.random.default_rng(4)
    path = str(tmp_path / "ldpv2.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "ldpv2")
    t = _write_tower(w, rng, cls=True, pos=True, post_ln=False)
    mm = {"m0": _w(rng, PROJ, C), "m0_b": _w(rng, PROJ),
          "m2": _w(rng, PROJ, PROJ), "m2_b": _w(rng, PROJ),
          "peg": _w(rng, PROJ, 1, 3, 3), "peg_b": _w(rng, PROJ)}
    w.add_tensor("mm.model.mlp.0.weight", mm["m0"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.0.bias", mm["m0_b"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.2.weight", mm["m2"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.2.bias", mm["m2_b"], GGMLType.F32)
    w.add_tensor("mm.model.peg.0.weight", mm["peg"], GGMLType.F32)
    w.add_tensor("mm.model.peg.0.bias", mm["peg_b"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.n_tokens == (SIDE // 2) ** 2

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = np.concatenate([t["cls"][None], x], axis=0)  # HF CLIP: CLS first
    x = x + t["pos"][: x.shape[0]]
    # llava family skips the top layer (minor_layers=1)
    t1 = dict(t)
    t1["layers"] = t["layers"][: NL - 1]
    x = _vit_np(t1, x)
    y = _gelu(x[1:] @ mm["m0"].T + mm["m0_b"]) @ mm["m2"].T + mm["m2_b"]
    g = y.reshape(SIDE, SIDE, PROJ).transpose(2, 0, 1)
    g = g.reshape(PROJ, SIDE // 2, 2, SIDE // 2, 2).mean(axis=(2, 4))
    # depthwise 3x3 pad 1
    gp = np.pad(g, ((0, 0), (1, 1), (1, 1)))
    peg = np.zeros_like(g)
    for ci in range(PROJ):
        for yy2 in range(g.shape[1]):
            for xx2 in range(g.shape[2]):
                peg[ci, yy2, xx2] = np.sum(
                    gp[ci, yy2 : yy2 + 3, xx2 : xx2 + 3] * mm["peg"][ci, 0])
    peg = peg + mm["peg_b"][:, None, None]
    want = (g + peg).transpose(1, 2, 0).reshape(-1, PROJ)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_ldp_projector(tmp_path, pix):
    rng = np.random.default_rng(5)
    path = str(tmp_path / "ldp.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "ldp")
    t = _write_tower(w, rng, cls=True, pos=True, post_ln=False)
    se = PROJ // 4
    mm = {"m1": _w(rng, PROJ, C), "m1_b": _w(rng, PROJ),
          "m3": _w(rng, PROJ, PROJ), "m3_b": _w(rng, PROJ)}
    w.add_tensor("mm.model.mlp.1.weight", mm["m1"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.1.bias", mm["m1_b"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.3.weight", mm["m3"], GGMLType.F32)
    w.add_tensor("mm.model.mlp.3.bias", mm["m3_b"], GGMLType.F32)
    for blk in (1, 2):
        b = f"mm.model.mb_block.{blk}.block."
        mm[f"b{blk}_dw"] = _w(rng, PROJ, 1, 3, 3)
        mm[f"b{blk}_ln"] = _w(rng, PROJ) + 1.0
        mm[f"b{blk}_ln_b"] = _w(rng, PROJ)
        mm[f"b{blk}_fc1"] = _w(rng, se, PROJ)
        mm[f"b{blk}_fc1_b"] = _w(rng, se)
        mm[f"b{blk}_fc2"] = _w(rng, PROJ, se)
        mm[f"b{blk}_fc2_b"] = _w(rng, PROJ)
        mm[f"b{blk}_pw"] = _w(rng, PROJ, PROJ, 1, 1)
        mm[f"b{blk}_pln"] = _w(rng, PROJ) + 1.0
        mm[f"b{blk}_pln_b"] = _w(rng, PROJ)
        w.add_tensor(b + "0.0.weight", mm[f"b{blk}_dw"], GGMLType.F32)
        w.add_tensor(b + "0.1.weight", mm[f"b{blk}_ln"], GGMLType.F32)
        w.add_tensor(b + "0.1.bias", mm[f"b{blk}_ln_b"], GGMLType.F32)
        w.add_tensor(b + "1.fc1.weight", mm[f"b{blk}_fc1"], GGMLType.F32)
        w.add_tensor(b + "1.fc1.bias", mm[f"b{blk}_fc1_b"], GGMLType.F32)
        w.add_tensor(b + "1.fc2.weight", mm[f"b{blk}_fc2"], GGMLType.F32)
        w.add_tensor(b + "1.fc2.bias", mm[f"b{blk}_fc2_b"], GGMLType.F32)
        w.add_tensor(b + "2.0.weight", mm[f"b{blk}_pw"], GGMLType.F32)
        w.add_tensor(b + "2.1.weight", mm[f"b{blk}_pln"], GGMLType.F32)
        w.add_tensor(b + "2.1.bias", mm[f"b{blk}_pln_b"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.n_tokens == (SIDE // 2) ** 2

    def dw(g, wdw, stride):
        cc, hh, ww2 = g.shape
        gp = np.pad(g, ((0, 0), (1, 1), (1, 1)))
        oh, ow = (hh + 2 - 3) // stride + 1, (ww2 + 2 - 3) // stride + 1
        out = np.zeros((cc, oh, ow))
        for ci in range(cc):
            for yy2 in range(oh):
                for xx2 in range(ow):
                    out[ci, yy2, xx2] = np.sum(
                        gp[ci, yy2 * stride : yy2 * stride + 3,
                           xx2 * stride : xx2 * stride + 3] * wdw[ci, 0])
        return out

    def lnc(g, wt, b):
        mu = g.mean(axis=0, keepdims=True)
        return ((g - mu) / np.sqrt(g.var(axis=0, keepdims=True) + 1e-5)
                * wt[:, None, None] + b[:, None, None])

    def hswish(x):
        return x * np.clip(x + 3, 0, 6) / 6

    def hsig(x):
        return np.clip(x + 3, 0, 6) / 6

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = np.concatenate([t["cls"][None], x], axis=0)
    x = x + t["pos"][: x.shape[0]]
    t1 = dict(t)
    t1["layers"] = t["layers"][: NL - 1]
    x = _vit_np(t1, x)
    y = _gelu(x[1:] @ mm["m1"].T + mm["m1_b"]) @ mm["m3"].T + mm["m3_b"]
    g = y.reshape(SIDE, SIDE, PROJ).transpose(2, 0, 1)
    for blk, stride, residual in ((1, 1, True), (2, 2, False)):
        b = dw(g, mm[f"b{blk}_dw"], stride)
        b = lnc(b, mm[f"b{blk}_ln"], mm[f"b{blk}_ln_b"])
        hw = hswish(b)
        sev = hw.mean(axis=(1, 2))
        sev = np.maximum(sev @ mm[f"b{blk}_fc1"].T + mm[f"b{blk}_fc1_b"], 0.0)
        sev = hsig(sev @ mm[f"b{blk}_fc2"].T + mm[f"b{blk}_fc2_b"])
        b = hw * sev[:, None, None]
        cc, hh, ww2 = b.shape
        flat = b.reshape(cc, hh * ww2).T @ mm[f"b{blk}_pw"].reshape(PROJ, PROJ).T
        b = flat.T.reshape(PROJ, hh, ww2)
        b = lnc(b, mm[f"b{blk}_pln"], mm[f"b{blk}_pln_b"])
        g = g + b if residual else b
    want = g.transpose(1, 2, 0).reshape(-1, PROJ)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_glm_edge_adapter(tmp_path, pix):
    """glm-edge: 2x2 stride-2 conv grid downsample, GLU adapter
    (silu(h_to_4h) * gate), BOI/EOI embedding wrap (reference
    models/llava.cpp PROJECTOR_TYPE_GLM_EDGE)."""
    rng = np.random.default_rng(6)
    path = str(tmp_path / "glmedge.gguf")
    w = GGUFWriter(path)
    _kv_common(w, "adapter")
    t = _write_tower(w, rng, cls=True, pos=True, post_ln=True)
    c2, c4 = PROJ, 2 * PROJ
    mm = {"conv": _w(rng, c2, C, 2, 2), "conv_b": _w(rng, c2),
          "mlp0": _w(rng, PROJ, c2), "lnq": _w(rng, PROJ) + 1.0,
          "lnq_b": _w(rng, PROJ), "gate": _w(rng, c4, PROJ),
          "h4h": _w(rng, c4, PROJ), "hh": _w(rng, PROJ, c4),
          "boi": _w(rng, PROJ), "eoi": _w(rng, PROJ)}
    w.add_tensor("adapter.conv.weight", mm["conv"], GGMLType.F32)
    w.add_tensor("adapter.conv.bias", mm["conv_b"], GGMLType.F32)
    w.add_tensor("adapter.linear.linear.weight", mm["mlp0"], GGMLType.F32)
    w.add_tensor("adapter.linear.norm1.weight", mm["lnq"], GGMLType.F32)
    w.add_tensor("adapter.linear.norm1.bias", mm["lnq_b"], GGMLType.F32)
    w.add_tensor("adapter.linear.gate.weight", mm["gate"], GGMLType.F32)
    w.add_tensor("adapter.linear.dense_h_to_4h.weight", mm["h4h"], GGMLType.F32)
    w.add_tensor("adapter.linear.dense_4h_to_h.weight", mm["hh"], GGMLType.F32)
    w.add_tensor("adapter.boi", mm["boi"], GGMLType.F32)
    w.add_tensor("adapter.eoi", mm["eoi"], GGMLType.F32)
    w.write()

    got, cfg = _encode(path, pix)
    assert cfg.n_tokens == (SIDE // 2) ** 2 + 2

    x = _patchify(pix) @ t["patch_w"].reshape(C, -1).T + t["patch_b"]
    x = np.concatenate([t["cls"][None], x], axis=0)
    x = x + t["pos"][: x.shape[0]]
    x = _vit_np(t, x)  # glm-edge runs ALL layers
    x = _ln(x, t["post_ln"], t["post_ln_b"])
    g = x[1:].reshape(SIDE, SIDE, C).transpose(2, 0, 1)
    # 2x2 stride-2 valid conv
    conv = np.zeros((c2, SIDE // 2, SIDE // 2))
    for oc in range(c2):
        for yy in range(SIDE // 2):
            for xx in range(SIDE // 2):
                conv[oc, yy, xx] = np.sum(
                    g[:, 2 * yy : 2 * yy + 2, 2 * xx : 2 * xx + 2] * mm["conv"][oc])
    y = conv.transpose(1, 2, 0).reshape(-1, c2) + mm["conv_b"]
    y = y @ mm["mlp0"].T
    y = _ln(y, mm["lnq"], mm["lnq_b"])
    y = _gelu(y)
    h = y @ mm["h4h"].T
    gate = y @ mm["gate"].T
    y = (h / (1.0 + np.exp(-h)) * gate) @ mm["hh"].T
    want = np.concatenate([mm["boi"][None], y, mm["eoi"][None]], axis=0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
