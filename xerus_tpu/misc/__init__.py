"""Misc runtime layer: RNG, logging, file I/O, histograms, perf counters.

Mirrors the role of the reference's ``xerus::misc`` namespace
(/root/reference/include/xerus/misc/*.h) with host-side Python equivalents.
"""

from .random import randomEngine, set_seed, normal, uniform  # noqa: F401
from .io import FileFormat, save_to_file, load_from_file  # noqa: F401
from .histogram import LogHistogram  # noqa: F401
from .log import (get_logger, set_log_level, enable_log_on_error,
                  RingBufferHandler)  # noqa: F401
from .performance import pa_start, pa_section, get_analysis, clear_analysis  # noqa: F401
from .profiling import profile_trace  # noqa: F401
