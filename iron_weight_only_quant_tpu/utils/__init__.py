"""Shared utilities: results IO, timing."""

from .results_io import append_results, read_results
from .timing import Timer

__all__ = ["append_results", "read_results", "Timer"]
