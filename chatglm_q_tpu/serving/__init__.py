from .decoder import GLMDecoder
from .chat import chat_template, process_response
from .engine import ServingEngine, Request
from .paged_engine import PagedServingEngine
from .dist_engine import DistributedServingEngine, DistributedPagedServingEngine
from .api_server import GLMAPIServer
