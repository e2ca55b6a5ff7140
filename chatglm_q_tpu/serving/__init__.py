from .decoder import GLMDecoder
from .chat import chat_template, process_response
