from . import chatglm2
