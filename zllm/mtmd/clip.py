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

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def n_tokens(self) -> int:
        """Embedding tokens one image contributes to the LM sequence."""
        if self.proj_type == "gemma3":
            side = self.image_size // self.patch_size
            return (side // self.n_merge) ** 2
        if self.proj_type == "idefics3":
            return self.n_patches // (self.n_merge * self.n_merge)
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
            n_merge=int(kv("projector.scale_factor", 0) or kv("spatial_merge_size", 0) or 1),
            image_mean=tuple(float(x) for x in np.asarray(mean).reshape(-1)),
            image_std=tuple(float(x) for x in np.asarray(std).reshape(-1)),
            minor_layers=1 if proj in ("mlp", "mlp_norm") else 0,
        )


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
    else:
        raise NotImplementedError(f"mmproj projector type: {cfg.proj_type}")
    return p, cfg


def _vit_block(lay, cfg, x):
    """One post-norm ViT block over x [T, C] (reference build_vit,
    tools/mtmd/clip.cpp:287-430)."""
    t, c = x.shape
    hd = c // cfg.n_head
    h = _ln(x, lay["ln1"], lay["ln1_b"], cfg.eps)
    q = h @ lay["wq"]
    k = h @ lay["wk"]
    v = h @ lay["wv"]
    if lay["wq_b"] is not None:
        q = q + lay["wq_b"]
    if lay["wk_b"] is not None:
        k = k + lay["wk_b"]
    if lay["wv_b"] is not None:
        v = v + lay["wv_b"]
    q = q.reshape(t, cfg.n_head, hd).transpose(1, 0, 2)
    k = k.reshape(t, cfg.n_head, hd).transpose(1, 0, 2)
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
    h = _ln(x, lay["ln2"], lay["ln2_b"], cfg.eps)
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
    if params["class_embd"] is not None:  # CLS first (HF convention)
        x = jnp.concatenate([params["class_embd"].reshape(1, -1), x], axis=0)
    if params["pos_embd"] is not None:
        x = x + params["pos_embd"][: x.shape[0]]
    if params["pre_ln"] is not None:
        x = _ln(x, params["pre_ln"], params["pre_ln_b"], cfg.eps)
    n_run = cfg.n_layer - cfg.minor_layers
    for lay in params["layers"][:n_run]:
        x = _vit_block(lay, cfg, x)
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
