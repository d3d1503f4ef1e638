"""Media loading, preprocessing and prompt chunking for multimodal input.

The reference counterpart is tools/mtmd/mtmd.cpp (marker-based prompt
splitting into text/media chunks) plus clip.cpp's image_preprocess
(bicubic resize + mean/std normalize).  PIL is gated: everything except
`preprocess_image` works without it (tests feed raw arrays).
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np

DEFAULT_MARKER = "<__media__>"


def preprocess_image(img, cfg) -> np.ndarray:
    """PIL image / path / bytes -> normalized f32 [3, S, S] with
    S = cfg.image_size (square bicubic resize, CLIP mean/std)."""
    arr = _to_rgb_array(img, cfg.image_size)
    mean = np.asarray(cfg.image_mean, np.float32).reshape(3, 1, 1)
    std = np.asarray(cfg.image_std, np.float32).reshape(3, 1, 1)
    x = arr.astype(np.float32) / 255.0
    x = x.transpose(2, 0, 1)  # HWC -> CHW
    return (x - mean) / std


def _to_rgb_array(img, size: int) -> np.ndarray:
    if isinstance(img, np.ndarray):
        if img.shape[:2] != (size, size):
            raise ValueError(f"raw array image must be [{size}, {size}, 3]")
        return img
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("PIL is required to decode image files") from e
    if isinstance(img, (str, bytes)):
        img = Image.open(io.BytesIO(img) if isinstance(img, bytes) else img)
    img = img.convert("RGB")
    if img.size != (size, size):
        img = img.resize((size, size), Image.BICUBIC)
    return np.asarray(img)


@dataclasses.dataclass
class TextChunk:
    tokens: list  # token ids


@dataclasses.dataclass
class ImageChunk:
    embeds: "object"  # [n_tokens, n_embd] jax array (already projected)


def tokenize_chunks(tokenizer, prompt: str, images: list, clip,
                    marker: str = DEFAULT_MARKER, add_bos: bool = True):
    """Split `prompt` on `marker` and interleave encoded images
    (reference mtmd_tokenize, tools/mtmd/mtmd.cpp:375-520).  Returns a
    list of TextChunk/ImageChunk; consumes one image per marker."""
    parts = prompt.split(marker)
    if len(parts) - 1 != len(images):
        raise ValueError(
            f"prompt has {len(parts) - 1} media markers but {len(images)} images given")
    chunks: list = []
    for i, part in enumerate(parts):
        if i > 0:
            item = images[i - 1]
            if isinstance(item, tuple):  # ("image" | "audio", data)
                emb = clip.encode_media(*item)
            else:
                emb = clip.encode_image(item)
            chunks.append(ImageChunk(embeds=emb))
        if part:
            toks = tokenizer.encode(part, add_bos=add_bos and i == 0)
            if toks:
                chunks.append(TextChunk(tokens=list(toks)))
        elif i == 0 and add_bos:
            bos = getattr(tokenizer.vocab, "bos_id", -1)
            if bos is not None and bos >= 0:
                chunks.append(TextChunk(tokens=[bos]))
    return chunks


def tokenize_with_media(tokenizer, text: str, embeds_list: list,
                        marker: str = DEFAULT_MARKER, placeholder: int = 0):
    """Split `text` on markers and return (prompt_ids, media) for the
    serving engine: `prompt_ids` carries `placeholder` over each image
    span, `media` is [(start_offset, [n, d] f32 embeddings), ...]
    (the Request.media contract; reference: mtmd_tokenize +
    mtmd-helper chunk eval)."""
    parts = text.split(marker)
    if len(parts) - 1 != len(embeds_list):
        raise ValueError(
            f"prompt has {len(parts) - 1} media markers but "
            f"{len(embeds_list)} images given")
    ids: list[int] = []
    media: list = []
    for i, part in enumerate(parts):
        if i > 0:
            emb = np.asarray(embeds_list[i - 1], np.float32)
            media.append((len(ids), emb))
            ids.extend([placeholder] * emb.shape[0])
        if part:
            ids.extend(tokenizer.encode(part, add_special=(i == 0),
                                        parse_special=True))
    return ids, media


def decode_media_part(part: dict) -> tuple:
    """OpenAI `image_url`/`input_audio` or Anthropic `image` content part
    -> ("image" | "audio", raw bytes).  Accepts data URIs and plain
    base64 (no network fetch)."""
    import base64

    kind = part.get("type")
    if kind == "image_url":
        url = part.get("image_url", {})
        url = url.get("url", url) if isinstance(url, dict) else url
        if isinstance(url, str) and url.startswith("data:"):
            return "image", base64.b64decode(url.split(",", 1)[1])
        raise ValueError("image_url must be a base64 data: URI")
    if kind == "image":  # anthropic style
        src = part.get("source", {})
        if src.get("type") == "base64":
            return "image", base64.b64decode(src.get("data", ""))
        raise ValueError("image source must be base64")
    if kind == "input_audio":  # OpenAI audio content part
        ia = part.get("input_audio", {})
        return "audio", base64.b64decode(ia.get("data", ""))
    raise ValueError(f"unsupported media part type: {kind}")


def decode_image_part(part: dict) -> bytes:
    return decode_media_part(part)[1]


def chunks_to_embeds(model, chunks) -> "object":
    """Concatenate chunk embeddings into one [1, T, n_embd] prefill input
    in the LM's embedding space (pre-scale: models.llama.embed applies
    arch scaling to this, matching the reference where ggml graphs scale
    inp_embd regardless of token/embd source)."""
    import jax.numpy as jnp

    scale = model.cfg.n_embd ** 0.5 if model.cfg.arch.startswith("gemma") else 1.0
    segs = []
    for ch in chunks:
        if isinstance(ch, TextChunk):
            toks = jnp.asarray(ch.tokens, jnp.int32)
            # gemma's sqrt(n_embd) applies to token batches only
            # (reference src/models/gemma3.cpp:13) — scale text here
            segs.append(model.params["tok_emb"][toks].astype(jnp.float32) * scale)
        else:
            segs.append(jnp.asarray(ch.embeds, jnp.float32))
    return jnp.concatenate(segs, axis=0)[None]


def _resize_rgb(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """Bilinear resize [H, W, 3] uint8/f32 -> [h, w, 3] f32 (PIL-free)."""
    src_h, src_w = arr.shape[:2]
    if (src_h, src_w) == (h, w):
        return arr.astype(np.float32)
    ys = (np.arange(h) + 0.5) * src_h / h - 0.5
    xs = (np.arange(w) + 0.5) * src_w / w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, src_h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, src_w - 1)
    y1 = np.clip(y0 + 1, 0, src_h - 1)
    x1 = np.clip(x0 + 1, 0, src_w - 1)
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    a = arr.astype(np.float32)
    top = a[y0][:, x0] * (1 - fx) + a[y0][:, x1] * fx
    bot = a[y1][:, x0] * (1 - fx) + a[y1][:, x1] * fx
    return top * (1 - fy) + bot * fy


def _normalize(arr: np.ndarray, cfg) -> np.ndarray:
    mean = np.asarray(cfg.image_mean, np.float32).reshape(3, 1, 1)
    std = np.asarray(cfg.image_std, np.float32).reshape(3, 1, 1)
    x = arr.astype(np.float32) / 255.0
    return (x.transpose(2, 0, 1) - mean) / std


def best_slice_grid(w: int, h: int, max_slices: int) -> tuple[int, int]:
    """Pick the (gx, gy) tile grid that best preserves the image's aspect
    ratio with gx*gy <= max_slices (the llava-uhd candidate scan,
    reference tools/mtmd/clip.cpp llava_uhd::get_slice_instructions:
    minimize |log(W/H) - log(gx/gy)|, preferring more coverage)."""
    best, best_err, best_cover = (1, 1), float("inf"), 0
    target = np.log(w / h)
    for gx in range(1, max_slices + 1):
        for gy in range(1, max_slices + 1):
            if gx * gy > max_slices:
                continue
            err = abs(target - np.log(gx / gy))
            cover = gx * gy
            if err < best_err - 1e-9 or (abs(err - best_err) < 1e-9
                                         and cover > best_cover):
                best, best_err, best_cover = (gx, gy), err, cover
    return best


def preprocess_image_slices(img, cfg, max_slices: int = 6) -> list:
    """Aspect-preserving llava-uhd slicing: one square overview plus an
    aspect-matched grid of native-resolution tiles (reference
    tools/mtmd/clip.cpp llava_uhd slicing used by minicpmv/llava-uhd
    class models).  Returns a list of normalized [3, S, S] arrays,
    overview first."""
    s = cfg.image_size
    if isinstance(img, np.ndarray):
        arr = img
    else:
        try:
            from PIL import Image
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("PIL is required to decode image files") from e
        if isinstance(img, (str, bytes)):
            img = Image.open(io.BytesIO(img) if isinstance(img, bytes) else img)
        arr = np.asarray(img.convert("RGB"))
    h, w = arr.shape[:2]
    out = [_normalize(_resize_rgb(arr, s, s), cfg)]
    if max_slices <= 1 or (h <= s and w <= s):
        return out
    gx, gy = best_slice_grid(w, h, max_slices)
    resized = _resize_rgb(arr, gy * s, gx * s)
    for ty in range(gy):
        for tx in range(gx):
            tile = resized[ty * s : (ty + 1) * s, tx * s : (tx + 1) * s]
            out.append(_normalize(tile, cfg))
    return out
