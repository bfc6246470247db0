"""Utilities: timing/profiling (reference: ad-hoc chrono/time prints)."""

from sixdpose_tpu.utils.timing import StageTimer, block, device_trace

__all__ = ["StageTimer", "block", "device_trace"]
