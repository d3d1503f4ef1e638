"""TPU-native CLIP/SigLIP vision encoder + multimodal projector.

Re-implements the reference mmproj stack (reference: tools/mtmd/clip.cpp
build_vit / models/llava.cpp / models/siglip.cpp) as a plain JAX ViT:
the patch embedding is a reshape+matmul (one big MXU gemm instead of a
conv), attention is a single full-bidirectional batched dot-product over
all patches, and the whole encode is one jit so XLA fuses the elementwise
glue.  Weights come from a standard `mmproj` GGUF (tensor names per
reference tools/mtmd/clip-impl.h: `v.patch_embd.weight`, `v.blk.N.*`,
`mm.*`), hparams from the `clip.vision.*` KV namespace.

Class-token ordering follows the HF convention (CLS first, patch rows
after it); positions index that order.  Projectors implemented:

- ``mlp`` (llava / granite-vision): features from the second-to-last
  layer, CLS dropped, mm.0 -> GELU -> mm.2.
- ``mlp_norm`` (yi-vl): mm.0 -> LN(mm.1) -> GELU -> mm.3 -> LN(mm.4).
- ``gemma3``: SigLIP tower, avg-pool n_merge x n_merge token merge,
  RMS soft-emb norm, input projection.
- ``idefics3`` (smolvlm): pixel-shuffle patch merge + linear.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.reader import GGUFFile, read_gguf


@dataclasses.dataclass(frozen=True)
class ClipConfig:
    proj_type: str = "mlp"
    n_embd: int = 1024
    n_ff: int = 4096
    n_layer: int = 24
    n_head: int = 16
    proj_dim: int = 4096
    image_size: int = 336
    patch_size: int = 14
    eps: float = 1e-5
    ffn_op: str = "gelu"  # gelu | silu | gelu_quick | gelu_erf
    n_merge: int = 1  # gemma3 pool kernel / idefics3 shuffle factor
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    minor_layers: int = 0  # layers to SKIP at the top (llava: 1)
    rope_theta: float = 10000.0  # pixtral/llama4 2D rope base
    query_num: int = 64  # minicpmv resampler learned queries
    norm_kind: str = "layer"  # "rms" for pixtral / internvl-6B ViTs

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_tokens(self) -> int:
        """Embedding tokens one image contributes to the LM sequence."""
        side = self.image_size // self.patch_size
        if self.proj_type == "gemma3":
            return (side // self.n_merge) ** 2
        if self.proj_type in ("idefics3", "internvl", "llama4"):
            return self.n_patches // (self.n_merge * self.n_merge)
        if self.proj_type in ("ldp", "ldpv2"):
            return (side // 2) ** 2
        if self.proj_type == "adapter":  # glm-edge: conv/2 grid + BOI/EOI
            return (side // 2) ** 2 + 2
        if self.proj_type == "resampler":
            return self.query_num
        if self.proj_type == "pixtral":
            m = max(self.n_merge, 1)
            return (side // m) ** 2 + (side // m) - 1  # [IMG_BREAK] per row
        return self.n_patches

    @classmethod
    def from_gguf(cls, f: GGUFFile) -> "ClipConfig":
        def kv(key, default=None):
            return f.kv(f"clip.vision.{key}", default)

        proj = f.kv("clip.projector_type", "mlp")
        # use_gelu -> tanh-gelu, use_silu -> silu, neither -> quick-gelu
        # (reference clip.cpp:1045-1060; HF CLIP's default act is quick_gelu)
        if f.kv("clip.use_gelu", False):
            ffn_op = "gelu"
        elif f.kv("clip.use_silu", False):
            ffn_op = "silu"
        else:
            ffn_op = "gelu_quick"
        mean = kv("image_mean")
        std = kv("image_std")
        if mean is None:
            mean = (0.48145466, 0.4578275, 0.40821073)
        if std is None:
            std = (0.26862954, 0.26130258, 0.27577711)
        return cls(
            proj_type=proj,
            n_embd=int(kv("embedding_length", 1024)),
            n_ff=int(kv("feed_forward_length", 4096)),
            n_layer=int(kv("block_count", 24)),
            n_head=int(kv("attention.head_count", 16)),
            proj_dim=int(kv("projection_dim", 4096)),
            image_size=int(kv("image_size", 336)),
            patch_size=int(kv("patch_size", 14)),
            eps=float(kv("attention.layer_norm_epsilon", 1e-5)),
            ffn_op=ffn_op,
            n_merge=int(kv("projector.scale_factor", 0) or kv("spatial_merge_size", 0)
                        or (2 if proj in ("ldp", "ldpv2") else 0) or 1),
            image_mean=tuple(float(x) for x in np.asarray(mean).reshape(-1)),
            image_std=tuple(float(x) for x in np.asarray(std).reshape(-1)),
            minor_layers=1 if proj in ("mlp", "mlp_norm", "ldp", "ldpv2") else 0,
            rope_theta=float(kv("rope.freq_base", 10000.0) or 10000.0),
            query_num=int(f.kv("clip.minicpmv_query_num", 64) or 64),
            # pixtral's ViT is RMS-normed; InternVL's 6B ViT
            # (n_embd 3200 / 45 layers) likewise (clip.cpp:1744)
            norm_kind="rms" if proj == "pixtral" or (
                proj == "internvl" and int(kv("embedding_length", 1024)) == 3200
                and int(kv("block_count", 24)) == 45) else "layer",
        )


def _pixel_shuffle(x, side, m, *, second_permute):
    """Group m x m patch neighborhoods into channels (reference
    internvl.cpp / llama4.cpp pixel shuffle; llama4 omits the second
    permute).  x [side*side, C] in y-major patch order."""
    c = x.shape[-1]
    g = x.reshape(side, side // m, m * c)  # m x-neighbors -> channels
    g = g.transpose(1, 0, 2)               # [W/m, H, m*C]
    g = g.reshape(side // m, side // m, m * m * c)  # m y-neighbors
    if second_permute:
        g = g.transpose(1, 0, 2)
    return g.reshape(-1, m * m * c)


def _dw_conv3x3(x, w, stride):
    """Depthwise 3x3 conv, padding 1.  x [C, H, W]; w [C, 1, 3, 3]."""
    c = x.shape[0]
    out = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c)
    return out[0]


def _ln_channels(x, w, b, eps):
    """LayerNorm across the channel dim of [C, H, W] (the reference
    permutes to channels-minor, norms, permutes back)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=0, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w[:, None, None] + b[:, None, None]


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _hardsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _ln(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps) * w
    return y + b if b is not None else y


def _act(x, op: str):
    if op == "silu":
        return jax.nn.silu(x)
    if op == "gelu_quick":
        return x * jax.nn.sigmoid(1.702 * x)
    if op == "gelu_erf":
        return jax.nn.gelu(x, approximate=False)
    return jax.nn.gelu(x, approximate=True)  # ggml_gelu is tanh-approx


def load_mmproj(path: str):
    """mmproj GGUF -> (params pytree of f32 jnp arrays, ClipConfig).

    Tensor-name contract per reference tools/mtmd/clip-impl.h (TN_*).
    """
    f = read_gguf(path)
    try:
        return load_vision_mmproj(f, set(f.tensors))
    finally:
        f.close()


def load_vision_mmproj(f: GGUFFile, names: set):
    """Vision tensors from an open GGUF (shared mmproj may carry both
    modalities).  Returns (params, ClipConfig)."""
    cfg = ClipConfig.from_gguf(f)

    def get(name):
        return jnp.asarray(f.tensor_f32(name))

    def opt(name):
        return get(name) if name in names else None

    p: dict = {}
    pe = f.tensor_f32("v.patch_embd.weight")  # [n_embd, 3, ps, ps]
    ps = cfg.patch_size
    pe = pe.reshape(cfg.n_embd, 3, ps, ps)
    # patchify matmul operand: [3*ps*ps, n_embd] with (c, py, px) minor
    p["patch_w"] = jnp.asarray(pe.reshape(cfg.n_embd, -1).T.copy())
    p["patch_b"] = opt("v.patch_embd.bias")
    p["class_embd"] = opt("v.class_embd")
    p["pos_embd"] = opt("v.position_embd.weight")
    for nm, key in (("pre_ln", "v.pre_ln"), ("post_ln", "v.post_ln")):
        p[nm] = opt(key + ".weight")
        p[nm + "_b"] = opt(key + ".bias")
    layers = []
    for il in range(cfg.n_layer):
        pre = f"v.blk.{il}."
        lay = {}
        for src, dst in (
            ("attn_q", "wq"), ("attn_k", "wk"), ("attn_v", "wv"),
            ("attn_out", "wo"), ("ffn_up", "up"), ("ffn_down", "down"),
            ("ffn_gate", "gate"), ("ln1", "ln1"), ("ln2", "ln2"),
        ):
            w = opt(pre + src + ".weight")
            if w is not None and dst not in ("ln1", "ln2"):
                w = w.T  # GGUF row-major [out, in] -> matmul [in, out]
            lay[dst] = w
            lay[dst + "_b"] = opt(pre + src + ".bias")
        for src, dst in (("ls1", "ls1"), ("ls2", "ls2")):
            lay[dst] = opt(pre + src + ".weight")
        layers.append(lay)
    p["layers"] = layers
    # projector heads
    if cfg.proj_type in ("mlp", "mlp_norm"):
        for i in (0, 1, 2, 3, 4):
            w = opt(f"mm.{i}.weight")
            p[f"mm_{i}"] = w.T if w is not None and w.ndim == 2 else w
            p[f"mm_{i}_b"] = opt(f"mm.{i}.bias")
    elif cfg.proj_type == "gemma3":
        p["mm_input_proj"] = get("mm.input_projection.weight")
        p["mm_soft_emb_norm"] = get("mm.soft_emb_norm.weight")
    elif cfg.proj_type == "idefics3":
        p["mm_fc"] = get("mm.model.fc.weight").T
    elif cfg.proj_type == "internvl":
        # LN(mm.model.mlp.0) -> fc(1) -> gelu -> fc(3) (models/internvl.cpp)
        p["mm_0"] = get("mm.model.mlp.0.weight")
        p["mm_0_b"] = get("mm.model.mlp.0.bias")
        p["mm_1"] = get("mm.model.mlp.1.weight").T
        p["mm_1_b"] = get("mm.model.mlp.1.bias")
        p["mm_3"] = get("mm.model.mlp.3.weight").T
        p["mm_3_b"] = get("mm.model.mlp.3.bias")
    elif cfg.proj_type == "llama4":
        p["mm_mlp_1"] = get("mm.model.mlp.1.weight").T
        p["mm_mlp_2"] = get("mm.model.mlp.2.weight").T
        p["mm_proj"] = get("mm.model.fc.weight").T
    elif cfg.proj_type == "pixtral":
        p["mm_1"] = get("mm.1.weight").T
        p["mm_1_b"] = opt("mm.1.bias")
        p["mm_2"] = get("mm.2.weight").T
        p["mm_2_b"] = opt("mm.2.bias")
        pm = opt("mm.patch_merger.weight")
        p["mm_patch_merger"] = pm.T if pm is not None else None
        p["mm_input_norm"] = opt("mm.input_norm.weight")
        p["tok_img_break"] = opt("v.token_embd.img_break")
    elif cfg.proj_type == "resampler":
        # minicpmv perceiver resampler (models/minicpmv.cpp)
        p["rs_query"] = get("resampler.query")
        p["rs_proj"] = get("resampler.proj.weight")  # applied as x @ proj
        p["rs_kv"] = get("resampler.kv.weight").T
        for nm in ("q", "k", "v", "out"):
            p[f"rs_attn_{nm}"] = get(f"resampler.attn.{nm}.weight").T
            p[f"rs_attn_{nm}_b"] = get(f"resampler.attn.{nm}.bias")
        for nm in ("q", "kv", "post"):
            p[f"rs_ln_{nm}"] = get(f"resampler.ln_{nm}.weight")
            p[f"rs_ln_{nm}_b"] = get(f"resampler.ln_{nm}.bias")
    elif cfg.proj_type == "ldpv2":
        p["mm_0"] = get("mm.model.mlp.0.weight").T
        p["mm_0_b"] = get("mm.model.mlp.0.bias")
        p["mm_2"] = get("mm.model.mlp.2.weight").T
        p["mm_2_b"] = get("mm.model.mlp.2.bias")
        p["peg_w"] = get("mm.model.peg.0.weight")  # [C, 1, 3, 3] depthwise
        p["peg_b"] = get("mm.model.peg.0.bias")
    elif cfg.proj_type == "adapter":
        # glm-edge (reference models/llava.cpp PROJECTOR_TYPE_GLM_EDGE)
        p["glm_conv"] = get("adapter.conv.weight")  # [C2, C, 2, 2]
        p["glm_conv_b"] = get("adapter.conv.bias")
        p["glm_mlp_0"] = get("adapter.linear.linear.weight").T
        p["glm_ln_q"] = get("adapter.linear.norm1.weight")
        p["glm_ln_q_b"] = get("adapter.linear.norm1.bias")
        p["glm_gate"] = get("adapter.linear.gate.weight").T
        p["glm_h4h"] = get("adapter.linear.dense_h_to_4h.weight").T
        p["glm_4hh"] = get("adapter.linear.dense_4h_to_h.weight").T
        p["glm_boi"] = get("adapter.boi")
        p["glm_eoi"] = get("adapter.eoi")
    elif cfg.proj_type == "ldp":
        p["mm_1"] = get("mm.model.mlp.1.weight").T
        p["mm_1_b"] = get("mm.model.mlp.1.bias")
        p["mm_3"] = get("mm.model.mlp.3.weight").T
        p["mm_3_b"] = get("mm.model.mlp.3.bias")
        for blk in (1, 2):
            b = f"mm.model.mb_block.{blk}.block."
            o = f"ldp_b{blk}_"
            p[o + "dw"] = get(b + "0.0.weight")  # depthwise [C,1,3,3]
            p[o + "ln"] = get(b + "0.1.weight")
            p[o + "ln_b"] = get(b + "0.1.bias")
            p[o + "fc1"] = get(b + "1.fc1.weight").T
            p[o + "fc1_b"] = get(b + "1.fc1.bias")
            p[o + "fc2"] = get(b + "1.fc2.weight").T
            p[o + "fc2_b"] = get(b + "1.fc2.bias")
            p[o + "pw"] = get(b + "2.0.weight")  # pointwise [Cout,Cin,1,1]
            p[o + "pln"] = get(b + "2.1.weight")
            p[o + "pln_b"] = get(b + "2.1.bias")
    else:
        raise NotImplementedError(f"mmproj projector type: {cfg.proj_type}")
    return p, cfg


def _blk_norm(x, w, b, cfg):
    if getattr(cfg, "norm_kind", "layer") == "rms":
        ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
        return x * jax.lax.rsqrt(ms + cfg.eps) * w
    return _ln(x, w, b, cfg.eps)


def _rope_2d(x, pos_a, pos_b, base, interleave):
    """2D rope over [T, H, D]: first half of D rotates by pos_a, second by
    pos_b; `interleave` shifts the second half's frequencies one odd step
    (reference clip_graph::build_rope_2d, tools/mtmd/clip.cpp:646-712 —
    both halves run ggml NORM-mode rope over D/2 dims)."""
    t, h, d = x.shape
    half = d // 2
    hh = half // 2
    inv = base ** (-2.0 * jnp.arange(hh, dtype=jnp.float32) / half)

    def rot(seg, pos, fscale):
        ang = pos[:, None].astype(jnp.float32) * fscale * inv[None]
        cos = jnp.cos(ang)[:, None, :]
        sin = jnp.sin(ang)[:, None, :]
        x1, x2 = seg[..., 0::2], seg[..., 1::2]
        out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
        return out.reshape(t, h, half)

    fs = float(base) ** (-2.0 / d) if interleave else 1.0
    return jnp.concatenate(
        [rot(x[..., :half], pos_a, 1.0), rot(x[..., half:], pos_b, fs)], axis=-1)


def _vit_block(lay, cfg, x, rope2d=None):
    """One post-norm ViT block over x [T, C] (reference build_vit,
    tools/mtmd/clip.cpp:287-430)."""
    t, c = x.shape
    hd = c // cfg.n_head
    h = _blk_norm(x, lay["ln1"], lay["ln1_b"], cfg)
    q = h @ lay["wq"]
    k = h @ lay["wk"]
    v = h @ lay["wv"]
    if lay["wq_b"] is not None:
        q = q + lay["wq_b"]
    if lay["wk_b"] is not None:
        k = k + lay["wk_b"]
    if lay["wv_b"] is not None:
        v = v + lay["wv_b"]
    q = q.reshape(t, cfg.n_head, hd)
    k = k.reshape(t, cfg.n_head, hd)
    if rope2d is not None:
        pos_a, pos_b, interleave = rope2d
        q = _rope_2d(q, pos_a, pos_b, cfg.rope_theta, interleave)
        k = _rope_2d(k, pos_a, pos_b, cfg.rope_theta, interleave)
    q = q.transpose(1, 0, 2)
    k = k.transpose(1, 0, 2)
    v = v.reshape(t, cfg.n_head, hd).transpose(1, 0, 2)
    att = jnp.einsum("htd,hsd->hts", q, k) * (1.0 / np.sqrt(hd))
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("hts,hsd->htd", att, v).transpose(1, 0, 2).reshape(t, c)
    o = o @ lay["wo"]
    if lay["wo_b"] is not None:
        o = o + lay["wo_b"]
    if lay.get("ls1") is not None:
        o = o * lay["ls1"]
    x = x + o
    h = _blk_norm(x, lay["ln2"], lay["ln2_b"], cfg)
    u = h @ lay["up"]
    if lay["up_b"] is not None:
        u = u + lay["up_b"]
    if lay.get("gate") is not None:
        g = h @ lay["gate"]
        if lay["gate_b"] is not None:
            g = g + lay["gate_b"]
        u = _act(g, cfg.ffn_op) * u
    else:
        u = _act(u, cfg.ffn_op)
    d = u @ lay["down"]
    if lay["down_b"] is not None:
        d = d + lay["down_b"]
    if lay.get("ls2") is not None:
        d = d * lay["ls2"]
    return x + d


def patchify(cfg: ClipConfig, pixels: jax.Array) -> jax.Array:
    """[3, H, W] f32 -> [n_patches, 3*ps*ps] rows in (c, py, px) minor
    order, matching the conv2d weight layout (reference build_inp,
    clip.cpp:452-462 does this as a stride-ps conv)."""
    ps = cfg.patch_size
    c, hh, ww = pixels.shape
    gy, gx = hh // ps, ww // ps
    x = pixels.reshape(c, gy, ps, gx, ps)
    # -> [gy, gx, c, py, px] -> [gy*gx, c*ps*ps]
    return x.transpose(1, 3, 0, 2, 4).reshape(gy * gx, c * ps * ps)


@functools.partial(jax.jit, static_argnames=("cfg",))
def clip_forward(params, cfg: ClipConfig, pixels: jax.Array) -> jax.Array:
    """Encode one image [3, H, W] (H = W = cfg.image_size, already
    normalized) -> [cfg.n_tokens, proj_dim] LM-space embeddings."""
    x = patchify(cfg, pixels).astype(jnp.float32) @ params["patch_w"]
    if params["patch_b"] is not None:
        x = x + params["patch_b"]
    side = cfg.image_size // cfg.patch_size
    cls_last = cfg.proj_type in ("internvl", "llama4")
    if params["class_embd"] is not None:
        cls = params["class_embd"].reshape(1, -1)
        # the reference graphs append CLS AFTER the patches for
        # internvl/llama4 (models/internvl.cpp:11, llama4.cpp:31); the
        # HF CLIP convention (llava family) keeps it first
        x = (jnp.concatenate([x, cls], axis=0) if cls_last
             else jnp.concatenate([cls, x], axis=0))
    if params["pos_embd"] is not None:
        x = x + params["pos_embd"][: x.shape[0]]
    if params["pre_ln"] is not None:
        x = _ln(x, params["pre_ln"], params["pre_ln_b"], cfg.eps)
    rope2d = None
    if cfg.proj_type in ("pixtral", "llama4"):
        yy = jnp.repeat(jnp.arange(side), side)
        xx = jnp.tile(jnp.arange(side), side)
        if cfg.proj_type == "llama4":  # CLS row appended with pos 0
            yy = jnp.concatenate([yy, jnp.zeros(1, yy.dtype)])
            xx = jnp.concatenate([xx, jnp.zeros(1, xx.dtype)])
            rope2d = (xx, yy, False)  # first half = X axis (llama4.cpp:36)
        else:
            rope2d = (yy, xx, True)  # pixtral: h first, interleaved freqs
    n_run = cfg.n_layer - cfg.minor_layers
    for lay in params["layers"][:n_run]:
        x = _vit_block(lay, cfg, x, rope2d=rope2d)
    if params["post_ln"] is not None and cfg.minor_layers == 0:
        x = _ln(x, params["post_ln"], params["post_ln_b"], cfg.eps)
    return _project(params, cfg, x)


def _project(p, cfg: ClipConfig, x: jax.Array) -> jax.Array:
    if cfg.proj_type == "mlp":
        # drop CLS, two-layer GELU MLP (reference models/llava.cpp:165-175)
        if p["class_embd"] is not None:
            x = x[1:]
        y = x @ p["mm_0"] + p["mm_0_b"]
        y = _act(y, "gelu")
        if p.get("mm_2") is not None:
            y = y @ p["mm_2"] + p["mm_2_b"]
        return y
    if cfg.proj_type == "mlp_norm":
        if p["class_embd"] is not None:
            x = x[1:]
        y = x @ p["mm_0"] + p["mm_0_b"]
        y = _ln(y, p["mm_1"], p["mm_1_b"], cfg.eps)
        y = _act(y, "gelu")
        y = y @ p["mm_3"] + p["mm_3_b"]
        return _ln(y, p["mm_4"], p["mm_4_b"], cfg.eps)
    if cfg.proj_type == "gemma3":
        # avg-pool n_merge x n_merge token merge, RMS soft-emb norm,
        # input projection (reference models/siglip.cpp:18-40)
        side = cfg.image_size // cfg.patch_size
        m = cfg.n_merge
        c = x.shape[-1]
        g = x.reshape(side // m, m, side // m, m, c).mean(axis=(1, 3))
        g = g.reshape(-1, c)
        ms = jnp.mean(jnp.square(g), axis=-1, keepdims=True)
        g = g * jax.lax.rsqrt(ms + cfg.eps) * p["mm_soft_emb_norm"]
        return g @ p["mm_input_proj"]
    if cfg.proj_type == "internvl":
        # CLS (appended last) removed, pixel shuffle, LN + GELU MLP
        # (reference tools/mtmd/models/internvl.cpp)
        x = x[: cfg.n_patches]
        side = cfg.image_size // cfg.patch_size
        g = _pixel_shuffle(x, side, cfg.n_merge, second_permute=True)
        g = _ln(g, p["mm_0"], p["mm_0_b"], 1e-5)
        g = _act(g @ p["mm_1"] + p["mm_1_b"], "gelu")
        return g @ p["mm_3"] + p["mm_3_b"]
    if cfg.proj_type == "llama4":
        # (reference tools/mtmd/models/llama4.cpp: pixel shuffle without
        # the second permute, no-bias GELU MLP, final projector)
        x = x[: cfg.n_patches]
        side = cfg.image_size // cfg.patch_size
        g = _pixel_shuffle(x, side, cfg.n_merge, second_permute=False)
        g = _act(g @ p["mm_mlp_1"], "gelu")
        g = _act(g @ p["mm_mlp_2"], "gelu")
        return g @ p["mm_proj"]
    if cfg.proj_type == "pixtral":
        # optional mistral-small patch merger, GELU MLP, one [IMG_BREAK]
        # token per grid row (reference tools/mtmd/models/pixtral.cpp)
        side = cfg.image_size // cfg.patch_size
        m = max(cfg.n_merge, 1)
        if p.get("mm_patch_merger") is not None:
            ms = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
            x = x * jax.lax.rsqrt(ms + cfg.eps) * p["mm_input_norm"]
            c = x.shape[-1]
            g = x.reshape(side, side, c)
            # unfold m x m blocks -> [.., m*m*C] in (c, ky, kx) minor order
            g = g.reshape(side // m, m, side // m, m, c)
            g = g.transpose(0, 2, 1, 3, 4).reshape(-1, m * m * c)
            # im2col channel order is (kx, ky, c) fastest-c? reference uses
            # im2col whose minor order is (c, kx, ky) -> match merger weight
            x = g @ p["mm_patch_merger"]
        y = _act(x @ p["mm_1"] + (p["mm_1_b"] if p["mm_1_b"] is not None else 0.0), "gelu")
        y = y @ p["mm_2"] + (p["mm_2_b"] if p["mm_2_b"] is not None else 0.0)
        if p.get("tok_img_break") is not None:
            rows = side // m
            cols = side // m
            y = y.reshape(rows, cols, -1)
            brk = jnp.broadcast_to(p["tok_img_break"].reshape(1, 1, -1),
                                   (rows, 1, y.shape[-1]))
            y = jnp.concatenate([y, brk], axis=1).reshape(-1, y.shape[-1])
            y = y[:-1]  # no break after the last row
        return y
    if cfg.proj_type == "resampler":
        # minicpmv perceiver resampler (reference models/minicpmv.cpp):
        # learned queries cross-attend the ViT tokens + 2D sincos pos
        side = cfg.image_size // cfg.patch_size
        v = x @ p["rs_kv"]
        q = _ln(p["rs_query"], p["rs_ln_q"], p["rs_ln_q_b"], cfg.eps)
        v = _ln(v, p["rs_ln_kv"], p["rs_ln_kv_b"], cfg.eps)
        dproj = v.shape[-1]
        quarter = dproj // 4
        omega = 1.0 / (10000.0 ** (jnp.arange(quarter, dtype=jnp.float32) / quarter))
        yy = jnp.repeat(jnp.arange(side, dtype=jnp.float32), side)
        xx = jnp.tile(jnp.arange(side, dtype=jnp.float32), side)
        tx = xx[:, None] * omega[None]
        ty = yy[:, None] * omega[None]
        pos = jnp.concatenate(
            [jnp.sin(tx), jnp.cos(tx), jnp.sin(ty), jnp.cos(ty)], axis=-1)
        k = v + pos
        d_head = 128
        n_head = max(dproj // d_head, 1)
        d_head = dproj // n_head
        nq = q.shape[0]
        t = k.shape[0]
        Q = (q @ p["rs_attn_q"] + p["rs_attn_q_b"]).reshape(nq, n_head, d_head)
        K = (k @ p["rs_attn_k"] + p["rs_attn_k_b"]).reshape(t, n_head, d_head)
        V = (v @ p["rs_attn_v"] + p["rs_attn_v_b"]).reshape(t, n_head, d_head)
        att = jnp.einsum("qhd,khd->hqk", Q, K) * (1.0 / np.sqrt(d_head))
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, V).reshape(nq, dproj)
        o = o @ p["rs_attn_out"] + p["rs_attn_out_b"]
        o = _ln(o, p["rs_ln_post"], p["rs_ln_post_b"], cfg.eps)
        return o @ p["rs_proj"]
    if cfg.proj_type == "ldpv2":
        # MobileVLM v2: MLP -> 2x2 avg pool -> depthwise PEG conv residual
        # (reference models/llava.cpp PROJECTOR_TYPE_LDPV2)
        if p["class_embd"] is not None:
            x = x[1:]
        side = cfg.image_size // cfg.patch_size
        y = _act(x @ p["mm_0"] + p["mm_0_b"], "gelu")
        y = y @ p["mm_2"] + p["mm_2_b"]
        c = y.shape[-1]
        g = y.reshape(side, side, c).transpose(2, 0, 1)  # [C, H, W]
        g = g.reshape(c, side // 2, 2, side // 2, 2).mean(axis=(2, 4))
        peg = _dw_conv3x3(g, p["peg_w"], 1) + p["peg_b"][:, None, None]
        g = g + peg
        return g.transpose(1, 2, 0).reshape(-1, c)
    if cfg.proj_type == "ldp":
        # MobileVLM v1 (reference models/llava.cpp PROJECTOR_TYPE_LDP):
        # MLP then two mobile blocks (depthwise conv + LN + SE + pointwise)
        if p["class_embd"] is not None:
            x = x[1:]
        side = cfg.image_size // cfg.patch_size
        y = _act(x @ p["mm_1"] + p["mm_1_b"], "gelu")
        y = y @ p["mm_3"] + p["mm_3_b"]
        c = y.shape[-1]
        g = y.reshape(side, side, c).transpose(2, 0, 1)  # [C, H, W]

        def mobile_block(g, pre, stride, residual):
            b = _dw_conv3x3(g, p[pre + "dw"], stride)
            b = _ln_channels(b, p[pre + "ln"], p[pre + "ln_b"], cfg.eps)
            hw = _hardswish(b)
            se = hw.mean(axis=(1, 2))
            se = jax.nn.relu(se @ p[pre + "fc1"] + p[pre + "fc1_b"])
            se = _hardsigmoid(se @ p[pre + "fc2"] + p[pre + "fc2_b"])
            b = hw * se[:, None, None]
            cc, hh, ww = b.shape
            flat = b.reshape(cc, hh * ww).T @ p[pre + "pw"].reshape(
                p[pre + "pw"].shape[0], cc).T
            b = flat.T.reshape(-1, hh, ww)
            b = _ln_channels(b, p[pre + "pln"], p[pre + "pln_b"], cfg.eps)
            return g + b if residual else b

        g = mobile_block(g, "ldp_b1_", 1, True)
        g = mobile_block(g, "ldp_b2_", 2, False)
        return g.transpose(1, 2, 0).reshape(-1, g.shape[0])
    if cfg.proj_type == "adapter":
        # glm-edge: 2x2 stride-2 conv + GLU adapter, BOI/EOI wrap
        # (reference models/llava.cpp PROJECTOR_TYPE_GLM_EDGE)
        if p["class_embd"] is not None:
            x = x[1:]
        side = cfg.image_size // cfg.patch_size
        c = x.shape[-1]
        g = x.reshape(side, side, c).transpose(2, 0, 1)[None]  # [1, C, H, W]
        conv = jax.lax.conv_general_dilated(
            g, p["glm_conv"], (2, 2), [(0, 0), (0, 0)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))[0]
        c2 = conv.shape[0]
        y = conv.transpose(1, 2, 0).reshape(-1, c2) + p["glm_conv_b"]
        y = y @ p["glm_mlp_0"]
        y = _ln(y, p["glm_ln_q"], p["glm_ln_q_b"], cfg.eps)
        y = _act(y, "gelu")
        y = (jax.nn.silu(y @ p["glm_h4h"]) * (y @ p["glm_gate"])) @ p["glm_4hh"]
        return jnp.concatenate(
            [p["glm_boi"].reshape(1, -1), y, p["glm_eoi"].reshape(1, -1)], axis=0)
    if cfg.proj_type == "idefics3":
        # pixel shuffle: group m x m neighboring patches on the channel dim
        # (reference build_patch_merge_permute + mm.model.fc)
        side = cfg.image_size // cfg.patch_size
        m = cfg.n_merge
        c = x.shape[-1]
        g = x.reshape(side, side // m, m * c)
        g = g.reshape(side // m, m, side // m, m * c)
        g = g.transpose(0, 2, 1, 3).reshape(-1, m * m * c)
        return g @ p["mm_fc"]
    raise NotImplementedError(cfg.proj_type)


class ClipModel:
    """Loaded mmproj: preprocess + encode convenience wrapper."""

    def __init__(self, path: str):
        self.params, self.cfg = load_mmproj(path)

    def encode(self, pixels: np.ndarray | jax.Array) -> jax.Array:
        """pixels [3, S, S] normalized f32 -> [n_tokens, proj_dim]."""
        return clip_forward(self.params, self.cfg, jnp.asarray(pixels))

    def encode_image(self, img) -> jax.Array:
        """PIL image / path / raw bytes -> LM embeddings."""
        from .media import preprocess_image

        return self.encode(preprocess_image(img, self.cfg))
