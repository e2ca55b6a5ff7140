from . import timing, profiling
