"""Standalone two-step FP4 quantizer (SURVEY.md C8).

Mirrors reference fp4_quantize_cpu.py:37-72: first a per-group scale S maps
the absmax onto the format's max value; then each element gets a per-element
power-of-two scale from its (bias-clamped) exponent estimate and is rounded
on that grid.  Despite the reference file's "e1m2" name, its constants are
M=1, E=2 -- mirrored here, but parametric.

This is a fake-quant utility (returns snapped values), the reference's only
GPU-free runnable quantization path; kept CPU/TPU-runnable here too.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SCALE_EPS = 1e-8  # reference fp4_quantize_cpu.py:68


def _floor_log2_safe(x: jnp.ndarray) -> jnp.ndarray:
    raw = jax.lax.bitcast_convert_type(jnp.abs(x).astype(jnp.float32), jnp.int32)
    return (((raw >> 23) & 0xFF) - 127).astype(jnp.float32)


def quantize_fp4_two_step(
    tensor: jnp.ndarray,
    group_size: int = 128,
    per_tensor: bool = False,
    mant_bits: int = 1,
    exp_bits: int = 2,
) -> jnp.ndarray:
    """Fake-quantize a 2-D ``[rows, cols]`` tensor, grouping along the last dim."""
    if tensor.ndim != 2:
        raise ValueError("expected a 2-D tensor")
    org_shape = tensor.shape
    t = tensor.astype(jnp.float32)
    if group_size > 0:
        if org_shape[1] % group_size != 0:
            raise ValueError("cols must divide group_size")
        t = t.reshape(-1, group_size)
    if per_tensor:
        t = t.reshape(1, -1)

    bias = 2 ** (exp_bits - 1) - 1
    max_float = (2.0 - 2.0 ** (-mant_bits)) * 2.0 ** (2**exp_bits - 1 - bias)

    absmax = jnp.clip(jnp.max(jnp.abs(t), axis=1, keepdims=True), SCALE_EPS, None)
    S = absmax / max_float

    unscaled = jnp.clip(t / S, -max_float, max_float)
    log_scales = jnp.clip(_floor_log2_safe(unscaled) + bias, 1.0, None)
    elem_scales = jnp.exp2(log_scales - mant_bits - bias)
    q = jnp.round(unscaled / elem_scales) * elem_scales
    return (q * S).reshape(org_shape).astype(tensor.dtype)
