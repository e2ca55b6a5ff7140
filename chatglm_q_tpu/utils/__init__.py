from . import timing, profiling, logging, distributed, debug, train
