from . import debugging, profiling
