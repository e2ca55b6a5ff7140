"""chatglm_q_tpu — TPU-native weight-only-quantized inference framework
for ChatGLM2-style GLM models (JAX/XLA/Pallas), re-creating the
capabilities of K024/chatglm-q in a TPU-first design."""

from .config import ChatGLM2Config, GLMLoadConfig, TpuRuntimeConfig


def __getattr__(name):
    # lazy submodule access: chatglm_q_tpu.loader, .serving, .quant, ...
    import importlib

    if name in ("loader", "models", "ops", "parallel", "quant", "serving",
                "tokenizer", "utils"):
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)


__version__ = "0.1.0"
