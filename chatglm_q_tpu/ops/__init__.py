from .linear import quant_linear, quant_embedding_lookup, int8_matmul, int4_matmul
