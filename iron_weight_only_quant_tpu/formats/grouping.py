"""Grouped-view helpers.

A quantization *group* is a contiguous run of weights sharing one scale /
zero-point / block exponent.  The reference reshapes its ``[out, in]``
PyTorch weights to ``[-1, group_size]`` (quant_linear.py:896-906); this module
provides the same three granularities for JAX kernels stored ``[in, out]``
(so ``y = x @ w``):

  * ``group_size > 0``   : groups of that width along the chosen axis
  * ``group_size == -1`` : one group spanning the whole tensor (per-tensor)
  * ``group_size == -2`` : one group per channel (per output feature)

``quant_axis=0`` groups along the input-feature/reduction axis -- equivalent
to the reference's default grouping along the last dim of ``[out, in]``.
``quant_axis=1`` groups along output features -- the reference's
``quant_dim=1`` transpose-first mode (quant_linear.py:640-647).

The grouped view is ordered so that for ``quant_axis=0`` row ``g`` of the view
is the ``g``-th group in reference row-major ``[out, in]`` order; codecs
therefore produce bit-identical scales to the reference for the same weights.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import PER_CHANNEL, PER_TENSOR


def group_view_shape(shape: Tuple[int, int], group_size: int, quant_axis: int) -> Tuple[int, int]:
    """Shape of the grouped view for a ``[in, out]`` weight of ``shape``."""
    k, n = shape
    if quant_axis == 0:
        rows, reduce_len = n, k
    else:
        rows, reduce_len = k, n
    if group_size == PER_TENSOR:
        return (1, rows * reduce_len)
    if group_size == PER_CHANNEL:
        return (rows, reduce_len)
    if group_size > 0:
        if reduce_len % group_size != 0:
            raise ValueError(
                f"axis length {reduce_len} not divisible by group_size {group_size}"
            )
        return (rows * reduce_len // group_size, group_size)
    raise ValueError(f"invalid group_size {group_size}")


def make_groups(w: jnp.ndarray, group_size: int, quant_axis: int = 0) -> jnp.ndarray:
    """``[in, out]`` weight -> ``[n_groups, width]`` grouped view (float32)."""
    if w.ndim != 2:
        raise ValueError("make_groups expects a 2-D weight")
    mat = w.T if quant_axis == 0 else w  # -> [rows, reduce_len]
    shape = group_view_shape(w.shape, group_size, quant_axis)
    return mat.reshape(shape)


def restore_from_groups(
    groups: jnp.ndarray, shape: Tuple[int, int], quant_axis: int = 0
) -> jnp.ndarray:
    """Grouped view -> ``[in, out]`` weight of ``shape``."""
    k, n = shape
    if quant_axis == 0:
        return groups.reshape(n, k).T
    return groups.reshape(k, n)
