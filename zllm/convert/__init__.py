from .hf import convert_hf_llama
