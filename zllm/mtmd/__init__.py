"""Multimodal (mtmd) support: vision encoders, media chunking, generation.

TPU-native analogue of the reference's libmtmd (tools/mtmd/): a CLIP or
SigLIP tower encodes images to LM-space embeddings, the prompt is split
on media markers into text/image chunks, and the LM prefills from the
concatenated embedding sequence.
"""

from .clip import ClipConfig, ClipModel, clip_forward, load_mmproj
from .media import (DEFAULT_MARKER, ImageChunk, TextChunk, chunks_to_embeds,
                    preprocess_image, tokenize_chunks)


class MtmdModel:
    """A loaded mmproj with whichever encoders it carries (vision and/or
    audio — the reference's clip_init loads both from one GGUF)."""

    def __init__(self, path: str):
        from ..gguf.reader import read_gguf

        f = read_gguf(path)
        try:
            names = set(f.tensors)
            self.vision = self.audio = None
            if any(n.startswith("v.") for n in names):
                from .clip import load_vision_mmproj

                self.vision = load_vision_mmproj(f, names)
            if any(n.startswith("a.") for n in names):
                from .audio import load_audio_mmproj

                self.audio = load_audio_mmproj(f, names)
            if self.vision is None and self.audio is None:
                raise ValueError(f"{path}: no vision or audio tensors")
        finally:
            f.close()

    def encode_image(self, img):
        if self.vision is None:
            raise ValueError("mmproj has no vision encoder")
        params, cfg = self.vision
        from .clip import clip_forward
        from .media import preprocess_image

        return clip_forward(params, cfg, preprocess_image(img, cfg))

    def encode_image_slices(self, img, max_slices: int = 6):
        """llava-uhd aspect-preserving encoding: overview + native-aspect
        tiles, embeddings concatenated overview-first (reference
        tools/mtmd/clip.cpp llava_uhd)."""
        if self.vision is None:
            raise ValueError("mmproj has no vision encoder")
        params, cfg = self.vision
        import jax.numpy as jnp

        from .clip import clip_forward
        from .media import preprocess_image_slices

        tiles = preprocess_image_slices(img, cfg, max_slices=max_slices)
        return jnp.concatenate(
            [clip_forward(params, cfg, t) for t in tiles], axis=0)

    def encode_audio(self, audio):
        if self.audio is None:
            raise ValueError("mmproj has no audio encoder")
        from .audio import encode_audio

        return encode_audio(*self.audio, audio)

    def encode_media(self, kind: str, data):
        return self.encode_audio(data) if kind == "audio" else self.encode_image(data)


def generate_mm(model, clip, prompt: str, images: list, max_new: int = 64,
                max_len: int = 2048, sampler=None, marker: str = DEFAULT_MARKER):
    """One-shot multimodal generation (the mtmd-cli flow, reference
    tools/mtmd/mtmd-cli.cpp): split prompt on `marker`, encode images,
    prefill embeds, greedy/sampled decode.  Returns GenerateResult."""
    from ..runtime.generate import Generator

    chunks = tokenize_chunks(model.tokenizer, prompt, images, clip, marker=marker)
    embeds = chunks_to_embeds(model, chunks)
    gen = Generator(model, max_len=max_len)
    logits = gen.prefill_embeds(embeds)
    import jax.numpy as jnp

    first = int(jnp.argmax(logits)) if sampler is None else int(sampler(logits))
    eos = model.tokenizer.vocab.eos_id if model.tokenizer else -1
    toks = [first]
    if first != eos:
        rest = gen.decode_steps(first, max_new - 1)
        toks = rest
        if eos in toks:
            toks = toks[: toks.index(eos) + 1]
    text = model.tokenizer.decode(toks) if model.tokenizer else ""
    from ..runtime.generate import GenerateResult

    return GenerateResult(tokens=toks, text=text, n_prefill=int(embeds.shape[1]),
                          t_prefill=getattr(gen, "t_prefill", 0.0))
