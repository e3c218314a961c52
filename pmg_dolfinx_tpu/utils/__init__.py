"""Auxiliary subsystems: timers, logging, profiling, memory telemetry.

Replaces the reference's observability stack (SURVEY.md §5):
dolfinx::common::Timer + list_timings, spdlog logging, roctx/omnitrace
profiling annotations (src/amd_gpu.hpp:236-252), and ROCm-SMI memory
telemetry (src/amd_gpu.hpp:71-234).
"""

from .timers import Timer, list_timings, reset_timings
from .profiling import annotate, device_memory_stats, trace
from .logging import init_logging, get_logger
from .checkpoint import load_state, save_state
from .io import write_npz, write_vtk
