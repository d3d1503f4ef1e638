"""Text-to-speech (reference: tools/tts/tts.cpp — OuteTTS LM + the
WavTokenizer decoder).

Two stages:
  1. the OuteTTS language model turns the formatted text prompt into
     audio codebook tokens (ids in [code_base, code_base+4100], default
     base 151672 per OuteTTS v0.2);
  2. the WavTokenizer decoder (zllm.models.wavtokenizer) turns the codes
     into STFT coefficients and the iSTFT overlap-add renders PCM.

`--codes` skips stage 1 for direct vocoder use.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

CODE_BASE = 151672  # OuteTTS v0.2 audio-token offset (tts.cpp:728)
CODE_MAX = 155772


def codes_to_wav(vocoder_path: str, codes, out_path: str,
                 sample_rate: int = 24000) -> str:
    from zllm.models.wavtokenizer import (
        embd_to_audio, load_wavtokenizer, save_wav16, wavtok_decode,
    )

    params, cfg = load_wavtokenizer(vocoder_path)
    embd = np.asarray(wavtok_decode(params, cfg, np.asarray(codes, np.int32)))
    audio = embd_to_audio(embd, n_fft=cfg.n_fft, n_hop=cfg.n_hop)
    return save_wav16(out_path, audio, sample_rate)


def generate_codes(model, text: str, max_new: int = 768) -> list:
    """OuteTTS v0.2 prompting (tts.cpp:440-520 simplified): the words
    ride between <|text_start|>/<|text_end|>, generation runs until
    <|audio_end|> and ids in the audio-code range become codes."""
    tok = model.tokenizer
    words = "<|text_sep|>".join(w.lower() for w in text.split())
    prompt = f"<|im_start|>\n<|text_start|>{words}<|text_end|>\n<|audio_start|>\n"
    from zllm.runtime.generate import Generator

    ids = tok.encode(prompt)
    gen = Generator(model, max_len=len(ids) + max_new + 8)
    import jax.numpy as jnp

    logits = gen.prefill(jnp.asarray([ids], jnp.int32))
    first = int(np.argmax(np.asarray(logits)))
    out = [first] + gen.decode_steps(first, max_new - 1)
    end_id = tok.encode("<|audio_end|>", add_bos=False)
    if end_id and end_id[0] in out:
        out = out[: out.index(end_id[0])]
    return [t - CODE_BASE for t in out if CODE_BASE <= t <= CODE_MAX]


def main():
    import argparse

    ap = argparse.ArgumentParser(description="TTS (reference tools/tts)")
    ap.add_argument("-m", "--model", default="", help="OuteTTS LM GGUF")
    ap.add_argument("-mv", "--vocoder", required=True, help="WavTokenizer GGUF")
    ap.add_argument("-p", "--prompt", default="Hello world")
    ap.add_argument("-o", "--out", default="output.wav")
    ap.add_argument("--codes", default="",
                    help="comma-separated codebook tokens (skip the LM)")
    ap.add_argument("--sample-rate", type=int, default=24000)
    ap.add_argument("-n", "--max-new", type=int, default=768)
    args = ap.parse_args()

    if args.codes:
        codes = [int(c) for c in args.codes.replace(",", " ").split()]
    else:
        if not args.model:
            ap.error("need --model or --codes")
        import jax.numpy as jnp

        from zllm.models.loader import Model

        m = Model.load(args.model, quantized=True, dtype=jnp.bfloat16)
        if m.tokenizer is None:
            ap.error("model has no tokenizer")
        codes = generate_codes(m, args.prompt, max_new=args.max_new)
        if not codes:
            ap.error("LM produced no audio codes")
    path = codes_to_wav(args.vocoder, codes, args.out, args.sample_rate)
    print(f"wrote {path} ({len(codes)} codes)")


if __name__ == "__main__":
    main()
