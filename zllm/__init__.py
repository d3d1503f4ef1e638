"""zllm: a TPU-native quantized LLM inference engine (JAX/XLA/Pallas).

Built from scratch with the capability set of llama.cpp (reference:
YingkunZhou/zyk-llama.cpp): GGUF model files, blockwise weight-only
quantization, fused dequant-matmul Pallas kernels, paged KV cache,
continuous-batching server, and mesh-sharded multi-chip execution.
"""

__version__ = "0.1.0"
