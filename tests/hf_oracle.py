"""Subprocess oracle: builds a tiny random HF Llama, dumps state_dict +
reference logits/greedy tokens to an .npz.  Run in a separate process
because torch and jax deadlock each other's threadpools when co-resident
(observed in this image: jit lowering blocks on array materialization)."""

import json
import os
import sys

os.environ["USE_TF"] = "0"
os.environ["USE_FLAX"] = "0"


def main(out_path: str, cfg_json: str, arch: str = "llama"):
    import numpy as np
    import torch

    torch.set_num_threads(2)
    import transformers

    cfg = json.loads(cfg_json)
    torch.manual_seed(0)
    if arch == "bert":
        return main_bert(out_path, cfg)
    if arch == "t5":
        return main_t5(out_path, cfg)
    if arch == "llava":
        return main_llava(out_path, cfg)
    if arch == "gemma3-vision":
        return main_gemma3_vision(out_path, cfg)
    if arch == "qwen2audio":
        return main_qwen2audio(out_path, cfg)
    cls = {
        "mamba": (transformers.MambaForCausalLM, transformers.MambaConfig),
        "mamba2": (transformers.Mamba2ForCausalLM, transformers.Mamba2Config),
        "bamba": (transformers.BambaForCausalLM, transformers.BambaConfig),
        "falcon-h1": (transformers.FalconH1ForCausalLM, transformers.FalconH1Config),
        "llama": (transformers.LlamaForCausalLM, transformers.LlamaConfig),
        "qwen2": (transformers.Qwen2ForCausalLM, transformers.Qwen2Config),
        "gemma2": (transformers.Gemma2ForCausalLM, transformers.Gemma2Config),
        "mixtral": (transformers.MixtralForCausalLM, transformers.MixtralConfig),
        "qwen3": (transformers.Qwen3ForCausalLM, transformers.Qwen3Config),
        "phi3": (transformers.Phi3ForCausalLM, transformers.Phi3Config),
        "deepseek2": (transformers.DeepseekV2ForCausalLM, transformers.DeepseekV2Config),
        "deepseek3": (transformers.DeepseekV3ForCausalLM, transformers.DeepseekV3Config),
        "gemma3": (transformers.Gemma3ForCausalLM, transformers.Gemma3TextConfig),
        "olmo2": (transformers.Olmo2ForCausalLM, transformers.Olmo2Config),
        "granite": (transformers.GraniteForCausalLM, transformers.GraniteConfig),
        "qwen2moe": (transformers.Qwen2MoeForCausalLM, transformers.Qwen2MoeConfig),
        "qwen3moe": (transformers.Qwen3MoeForCausalLM, transformers.Qwen3MoeConfig),
        "gpt-oss": (transformers.GptOssForCausalLM, transformers.GptOssConfig),
        "jamba": (transformers.JambaForCausalLM, transformers.JambaConfig),
        "stablelm": (transformers.StableLmForCausalLM, transformers.StableLmConfig),
        "gptneox": (transformers.GPTNeoXForCausalLM, transformers.GPTNeoXConfig),
        "starcoder2": (transformers.Starcoder2ForCausalLM, transformers.Starcoder2Config),
        "command-r": (transformers.CohereForCausalLM, transformers.CohereConfig),
        "gpt2": (transformers.GPT2LMHeadModel, transformers.GPT2Config),
        "falcon": (transformers.FalconForCausalLM, transformers.FalconConfig),
        "nemotron": (transformers.NemotronForCausalLM, transformers.NemotronConfig),
        "olmo": (transformers.OlmoForCausalLM, transformers.OlmoConfig),
        "glm4": (transformers.Glm4ForCausalLM, transformers.Glm4Config),
        "smollm3": (transformers.SmolLM3ForCausalLM, transformers.SmolLM3Config),
        "mpt": (transformers.MptForCausalLM, transformers.MptConfig),
        "seed-oss": (transformers.SeedOssForCausalLM, transformers.SeedOssConfig),
        "olmo3": (transformers.Olmo3ForCausalLM, transformers.Olmo3Config),
        "phi2": (transformers.PhiForCausalLM, transformers.PhiConfig),
        "lfm2": (transformers.Lfm2ForCausalLM, transformers.Lfm2Config),
        "arcee": (transformers.ArceeForCausalLM, transformers.ArceeConfig),
        "ernie4_5": (transformers.Ernie4_5ForCausalLM, transformers.Ernie4_5Config),
        "exaone4": (transformers.Exaone4ForCausalLM, transformers.Exaone4Config),
        "cohere2": (transformers.Cohere2ForCausalLM, transformers.Cohere2Config),
        "olmoe": (transformers.OlmoeForCausalLM, transformers.OlmoeConfig),
        "glm4moe": (transformers.Glm4MoeForCausalLM, transformers.Glm4MoeConfig),
        "dots1": (transformers.Dots1ForCausalLM, transformers.Dots1Config),
        "bloom": (transformers.BloomForCausalLM, transformers.BloomConfig),
        "granitemoe": (transformers.GraniteMoeForCausalLM, transformers.GraniteMoeConfig),
        # GlmForCausalLM (glm-4-9b lineage) converts to the reference's
        # chatglm arch (convert_hf_to_gguf.py ChatGLMModel registration)
        "chatglm": (transformers.GlmForCausalLM, transformers.GlmConfig),
        "dbrx": (transformers.DbrxForCausalLM, transformers.DbrxConfig),
        "hunyuan-moe": (transformers.HunYuanMoEV1ForCausalLM, transformers.HunYuanMoEV1Config),
        "hunyuan-dense": (transformers.HunYuanDenseV1ForCausalLM, transformers.HunYuanDenseV1Config),
        "apertus": (transformers.ApertusForCausalLM, transformers.ApertusConfig),
        "ernie4_5-moe": (transformers.Ernie4_5_MoeForCausalLM, transformers.Ernie4_5_MoeConfig),
        "granitemoeshared": (transformers.GraniteMoeSharedForCausalLM,
                             transformers.GraniteMoeSharedConfig),
        "qwen3next": (transformers.Qwen3NextForCausalLM, transformers.Qwen3NextConfig),
        "gemma3n": (transformers.Gemma3nForCausalLM, transformers.Gemma3nTextConfig),
    }[arch]
    hf = cls[0](cls[1](**cfg, attn_implementation="eager")).eval()

    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg["vocab_size"], size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        logits = hf(torch.tensor(toks)).logits.numpy()

    prompt = [5, 17, 42, 7]
    with torch.no_grad():
        greedy = hf.generate(
            torch.tensor([prompt], dtype=torch.int64), max_new_tokens=6, do_sample=False
        )[0, len(prompt) :].numpy()

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["toks"] = toks
    out["logits"] = logits
    out["greedy"] = greedy
    np.savez(out_path, **out)


def main_llava(out_path: str, cfg: dict):
    """Tiny LlavaForConditionalGeneration: image features + mm logits.
    cfg = {"vision": CLIPVisionConfig kwargs, "text": LlamaConfig kwargs,
    "image_token_index": int}."""
    import numpy as np
    import torch
    import transformers

    torch.set_num_threads(2)
    torch.manual_seed(0)
    vis = transformers.CLIPVisionConfig(**cfg["vision"])
    txt = transformers.LlamaConfig(**cfg["text"], attn_implementation="eager")
    full = transformers.LlavaConfig(
        vision_config=vis, text_config=txt,
        image_token_index=cfg["image_token_index"],
        projector_hidden_act="gelu",
        vision_feature_select_strategy="default",
        vision_feature_layer=-2,
    )
    hf = transformers.LlavaForConditionalGeneration(full).eval()

    rng = np.random.default_rng(3)
    pixels = rng.standard_normal(
        (1, 3, vis.image_size, vis.image_size)).astype(np.float32)
    n_img = (vis.image_size // vis.patch_size) ** 2
    pre = [5, 17, 42]
    post = [7, 9, 23, 4]
    ids = pre + [cfg["image_token_index"]] * n_img + post
    with torch.no_grad():
        feats = hf.get_image_features(
            pixel_values=torch.tensor(pixels),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        logits = hf(
            input_ids=torch.tensor([ids], dtype=torch.int64),
            pixel_values=torch.tensor(pixels),
        ).logits.numpy()

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["pixels"] = pixels
    out["image_features"] = np.asarray(feats).reshape(n_img, -1)
    out["ids"] = np.asarray(ids)
    out["pre"] = np.asarray(pre)
    out["post"] = np.asarray(post)
    out["logits"] = logits
    np.savez(out_path, **out)


def main_gemma3_vision(out_path: str, cfg: dict):
    """Tiny Gemma3ForConditionalGeneration: image features + mm logits.
    cfg = {"vision": SiglipVisionConfig kwargs, "text": Gemma3TextConfig
    kwargs, "image_token_index": int, "mm_tokens_per_image": int}."""
    import numpy as np
    import torch
    import transformers

    torch.set_num_threads(2)
    torch.manual_seed(0)
    vis = transformers.SiglipVisionConfig(**cfg["vision"])
    txt = transformers.Gemma3TextConfig(**cfg["text"], attn_implementation="eager")
    full = transformers.Gemma3Config(
        vision_config=vis, text_config=txt,
        image_token_index=cfg["image_token_index"],
        mm_tokens_per_image=cfg["mm_tokens_per_image"],
    )
    hf = transformers.Gemma3ForConditionalGeneration(full).eval()

    rng = np.random.default_rng(3)
    pixels = rng.standard_normal(
        (1, 3, vis.image_size, vis.image_size)).astype(np.float32)
    n_img = cfg["mm_tokens_per_image"]
    pre = [5, 17, 42]
    post = [7, 9, 23, 4]
    ids = pre + [cfg["image_token_index"]] * n_img + post
    with torch.no_grad():
        feats = hf.get_image_features(pixel_values=torch.tensor(pixels))
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        logits = hf(
            input_ids=torch.tensor([ids], dtype=torch.int64),
            pixel_values=torch.tensor(pixels),
        ).logits.numpy()

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["pixels"] = pixels
    out["image_features"] = np.asarray(feats).reshape(n_img, -1)
    out["ids"] = np.asarray(ids)
    out["pre"] = np.asarray(pre)
    out["post"] = np.asarray(post)
    out["logits"] = logits
    np.savez(out_path, **out)


def main_qwen2audio(out_path: str, cfg: dict):
    """Tiny Qwen2AudioForConditionalGeneration: whisper log-mel features,
    projected audio embeddings, and full mm logits.  cfg = {"audio":
    Qwen2AudioEncoderConfig kwargs, "text": Qwen2Config kwargs,
    "audio_token_index": int, "max_samples": int}."""
    import numpy as np
    import torch
    import transformers

    torch.set_num_threads(2)
    torch.manual_seed(0)
    aud = transformers.Qwen2AudioEncoderConfig(**cfg["audio"])
    txt = transformers.Qwen2Config(**cfg["text"], attn_implementation="eager")
    full = transformers.Qwen2AudioConfig(
        audio_config=aud, text_config=txt,
        audio_token_index=cfg["audio_token_index"],
    )
    hf = transformers.Qwen2AudioForConditionalGeneration(full).eval()

    rng = np.random.default_rng(3)
    max_samples = int(cfg.get("max_samples", 32000))
    wave = (rng.standard_normal(max_samples // 2) * 0.1).astype(np.float32)
    fe = transformers.WhisperFeatureExtractor(
        feature_size=aud.num_mel_bins, sampling_rate=16000)
    mel = fe(wave, sampling_rate=16000, padding="max_length",
             max_length=max_samples, return_tensors="np").input_features
    with torch.no_grad():
        enc = hf.audio_tower(torch.tensor(mel)).last_hidden_state
        feats = hf.multi_modal_projector(enc)[0]
        n_aud = feats.shape[0]
        pre = [5, 17, 42]
        post = [7, 9, 23, 4]
        ids = pre + [cfg["audio_token_index"]] * n_aud + post
        logits = hf(
            input_ids=torch.tensor([ids], dtype=torch.int64),
            input_features=torch.tensor(mel),
            attention_mask=torch.ones((1, len(ids)), dtype=torch.int64),
            feature_attention_mask=torch.ones(mel.shape[:2][:1] + (mel.shape[2],),
                                              dtype=torch.int64),
        ).logits.numpy()

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["wave"] = wave
    out["mel"] = mel[0]
    out["audio_features"] = feats.numpy()
    out["ids"] = np.asarray(ids)
    out["pre"] = np.asarray(pre)
    out["post"] = np.asarray(post)
    out["logits"] = logits
    np.savez(out_path, **out)


def main_t5(out_path: str, cfg: dict):
    """T5ForConditionalGeneration: enc+dec logits and greedy generate."""
    import numpy as np
    import torch
    import transformers

    torch.set_num_threads(2)
    hf = transformers.T5ForConditionalGeneration(
        transformers.T5Config(**cfg)
    ).eval()

    rng = np.random.default_rng(3)
    enc = rng.integers(2, cfg["vocab_size"], size=(2, 9)).astype(np.int64)
    dec = rng.integers(2, cfg["vocab_size"], size=(2, 7)).astype(np.int64)
    with torch.no_grad():
        logits = hf(input_ids=torch.tensor(enc),
                    decoder_input_ids=torch.tensor(dec)).logits.numpy()
        greedy = hf.generate(torch.tensor(enc[:1]), max_new_tokens=6,
                             do_sample=False, num_beams=1)[0].numpy()

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["enc_toks"] = enc
    out["dec_toks"] = dec
    out["logits"] = logits
    out["greedy"] = greedy
    np.savez(out_path, **out)


def main_bert(out_path: str, cfg: dict):
    """BertForSequenceClassification: hidden states + rank scores."""
    import numpy as np
    import torch
    import transformers

    torch.set_num_threads(2)
    hf = transformers.BertForSequenceClassification(
        transformers.BertConfig(**cfg, num_labels=1, attn_implementation="eager")
    ).eval()

    rng = np.random.default_rng(3)
    toks = rng.integers(0, cfg["vocab_size"], size=(2, 10)).astype(np.int64)
    with torch.no_grad():
        tt = torch.tensor(toks)
        hidden = hf.bert(tt).last_hidden_state.numpy()
        score = hf(tt).logits.numpy()[:, 0]

    out = {f"sd.{k}": v.float().numpy() for k, v in hf.state_dict().items()}
    out["toks"] = toks
    out["hidden"] = hidden
    out["score"] = score
    np.savez(out_path, **out)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "llama")
