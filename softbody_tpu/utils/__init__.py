"""Utilities: PNG IO, profiling/observability helpers."""

from .png import write_png  # noqa: F401
from .profiling import FrameClock, Profiler  # noqa: F401
