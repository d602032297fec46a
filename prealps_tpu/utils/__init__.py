"""Utilities: timing/profiling, logging, vector helpers."""

from prealps_tpu.utils.timing import Timers, timed, profile_trace

__all__ = ["Timers", "timed", "profile_trace"]
