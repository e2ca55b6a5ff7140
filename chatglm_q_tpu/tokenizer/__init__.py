from .chatglm2 import ChatGLM2Tokenizer, BatchEncoding
from .sp_core import SpTokenizer
