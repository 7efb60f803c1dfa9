"""Profiling + roofline accounting.

The reference has wall-clock prints only (SURVEY.md §5); here:
  * :func:`trace` wraps a region with jax.profiler for xprof/tensorboard;
  * :class:`Roofline` turns measured op times into fraction-of-roofline
    numbers against the chip's HBM bandwidth and MXU peak.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax

# v5e (single core) nominal peaks; override for other chips
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 394.0
V5E_INT8_TOPS = 788.0


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace of the enclosed region (view with xprof/tb)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Roofline:
    hbm_gbps: float = V5E_HBM_GBPS
    bf16_tflops: float = V5E_BF16_TFLOPS

    def matmul_time_floor(self, m: int, k: int, n: int, weight_bytes: float) -> float:
        """Lower bound (s): max of bandwidth time and compute time."""
        io = weight_bytes + m * k * 2 + m * n * 2
        t_bw = io / (self.hbm_gbps * 1e9)
        t_fl = 2 * m * k * n / (self.bf16_tflops * 1e12)
        return max(t_bw, t_fl)

    def fraction(self, measured_s: float, m: int, k: int, n: int,
                 weight_bytes: float) -> float:
        return self.matmul_time_floor(m, k, n, weight_bytes) / max(measured_s, 1e-12)
