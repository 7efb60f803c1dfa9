"""Explicit shard_map tensor parallelism over packed quantized weights.

GSPMD partitions the XLA dequant path automatically, but Pallas kernels do
not auto-partition -- multi-chip fused execution needs shard_map with
explicit collectives.  This module provides the two megatron building
blocks over a ``"model"`` mesh axis:

  * :func:`tp_column_matmul` -- weight sharded on N (output features);
    activations replicated; output N-sharded.  Split-K packing is
    N-sharding-invariant, so any artifact works.
  * :func:`tp_row_matmul` -- weight sharded on K (reduction); activations
    K-sharded; partial products psum'd.  Requires an artifact built with
    ``quantize_tensor(..., k_shards=mesh model size)`` so each device's
    packed slice is self-contained (ops/packing.py pack_codes_sharded).

Inside each shard the fused Pallas kernel (or XLA fallback off-TPU) runs on
a plain local :class:`QuantizedTensor` view.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:  # jax >= 0.8 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ..ops.qmatmul import quantized_matmul
from ..quantize.qtensor import QuantizedTensor


def _side_specs(qt: QuantizedTensor, row_shard: bool, axis: str):
    def spec(side):
        if side is None:
            return None
        if row_shard:
            # per-channel/tensor side info ([1, N] / [1, 1]) is K-invariant
            return P(axis, None) if side.shape[0] > 1 else P()
        return P(None, axis) if side.shape[1] > 1 else P()

    return spec(qt.scales), spec(qt.zeros)


def _local_qt(qt: QuantizedTensor, qw, s, z, k_local: int, n_local: int):
    return QuantizedTensor(qw, s, z, None, qt.spec, (k_local, n_local), qt.mode, 1,
                           qt.n_pad, qt.k_pad)


def tp_column_matmul(
    x: jnp.ndarray, qt: QuantizedTensor, mesh: Mesh, axis: str = "model"
) -> jnp.ndarray:
    """x: [..., K] replicated -> y: [..., N] sharded on ``axis``."""
    if qt.mode != "affine":
        raise NotImplementedError("tp ops support affine artifacts")
    d = mesh.shape[axis]
    if qt.n % d != 0 or (qt.scales.shape[1] > 1 and qt.scales.shape[1] % d != 0):
        raise ValueError(f"N={qt.n} / scale columns must divide {axis}={d}")
    s_spec, z_spec = _side_specs(qt, row_shard=False, axis=axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis), s_spec, z_spec),
        out_specs=P(None, axis),
    )
    def run(x, qw, s, z):
        return quantized_matmul(x, _local_qt(qt, qw, s, z, qt.k, qt.n // d))

    return run(x, qt.qweight, qt.scales, qt.zeros)


def tp_row_matmul(
    x: jnp.ndarray, qt: QuantizedTensor, mesh: Mesh, axis: str = "model"
) -> jnp.ndarray:
    """x: [..., K] sharded on ``axis`` -> y: [..., N] replicated (psum).

    The artifact must be packed with ``k_shards`` equal to the mesh axis size.
    """
    if qt.mode != "affine":
        raise NotImplementedError("tp ops support affine artifacts")
    d = mesh.shape[axis]
    if qt.k_shards != d:
        raise ValueError(
            f"artifact k_shards={qt.k_shards} must equal mesh {axis} size {d}; "
            "re-quantize with quantize_tensor(..., k_shards=d)"
        )
    if qt.scales.shape[0] > 1 and qt.scales.shape[0] % d != 0:
        raise ValueError("per-group scale rows must divide the mesh axis")
    s_spec, z_spec = _side_specs(qt, row_shard=True, axis=axis)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), s_spec, z_spec),
        out_specs=P(),
    )
    def run(x, qw, s, z):
        partial_out = quantized_matmul(x, _local_qt(qt, qw, s, z, qt.k // d, qt.n))
        return jax.lax.psum(partial_out, axis)

    return run(x, qt.qweight, qt.scales, qt.zeros)
