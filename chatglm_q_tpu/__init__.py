"""chatglm_q_tpu — TPU-native weight-only-quantized inference framework
for ChatGLM2-style GLM models (JAX/XLA/Pallas), re-creating the
capabilities of K024/chatglm-q in a TPU-first design."""

from .config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig

__version__ = "0.1.0"
