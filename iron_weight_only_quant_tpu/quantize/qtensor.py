"""The packed quantized-weight artifact.

Where the reference stores a *dequantized fp16 copy* back into the model
("fake quant", quant_linear.py:960-972 -- runtime memory and compute are
unchanged), this framework's artifact keeps weights packed in HBM and
dequantizes inside the matmul kernel.  One unified dequant rule covers all
packed formats:

  affine ("int", "bfp"):   w = (codes - zeros) * scales
  lut    ("fp" minifloat): w = codebook[codes] * scales (+ zeros)

Layouts (for an ``[K, N]`` kernel, ``y = x @ w``):
  * ``qweight``: packed uint8 (see ops/packing.py split-K layout)
  * ``scales``/``zeros``: ``[K/G, N]`` per-group, ``[1, N]`` per-channel,
    ``[1, 1]`` per-tensor -- broadcast over K-groups
  * ``codebook``: ``[2^bits]`` decode table (the TPU analogue of the CUDA
    kernel's ``deq2`` shared-memory LUT, quant_cuda_kernel.cu:185-192)

Only ``quant_axis=0`` (groups along the reduction dim) has a packed path --
that is the serving-relevant layout.  Other axes / the double-approx and
fp4_e1m2 schemes remain fake-quant-only, matching how the reference itself
only ever serves fake-quantized weights.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import struct

from ..config import QuantSpec


@struct.dataclass
class QuantizedTensor:
    qweight: jnp.ndarray
    scales: jnp.ndarray
    zeros: Optional[jnp.ndarray]
    codebook: Optional[jnp.ndarray]
    spec: QuantSpec = struct.field(pytree_node=False)
    shape: Tuple[int, int] = struct.field(pytree_node=False)  # (K, N) logical
    mode: str = struct.field(pytree_node=False)  # "affine" | "lut"
    # K-dim packing segmentation: sub-byte codes are paired within each of
    # k_shards contiguous K segments, so slicing the packed array at segment
    # boundaries yields self-contained shards (row-parallel TP via shard_map).
    k_shards: int = struct.field(pytree_node=False, default=1)
    # zero-padding of the N dim in storage (awkward widths like 11008 padded
    # to a 512-multiple so the fused kernel gets full-width tiles); ``shape``
    # stays logical, consumers slice the padded columns off
    n_pad: int = struct.field(pytree_node=False, default=0)
    # zero-padding of the K dim in storage, in whole quantization groups
    # (awkward reduction dims like 11008 -> packed 5504 = 43*128 only admit
    # tiny 128-row kernel tiles; padding to a 1024-multiple unlocks 512-row
    # tiles).  Exact: padded groups see only the kernel's zero-padded x rows,
    # so they contribute exactly 0.  ``shape`` stays logical.
    k_pad: int = struct.field(pytree_node=False, default=0)
    # zero-padding of the side-info ROW dim (scales/zeros leading axis) to a
    # sublane multiple, applied ONCE at layer-stack time: the stacked
    # (scalar-prefetch) kernels need per-layer side blocks with row counts
    # divisible by 8, and padding inside the per-call path made XLA copy
    # the whole [L, rows, N] side arrays EVERY layer of EVERY decode step
    # (~100 us/layer at 7B depth -- the round-3 scan-gap finding).
    # Consumers slice the padded rows off: logical rows = shape - side_pad.
    side_pad: int = struct.field(pytree_node=False, default=0)

    @property
    def k(self) -> int:
        return self.shape[0]

    @property
    def k_stored(self) -> int:
        return self.shape[0] + self.k_pad

    @property
    def n(self) -> int:
        return self.shape[1]

    @property
    def storage_bits(self) -> int:
        return self.spec.storage_bits

    def nbytes_packed(self) -> int:
        total = self.qweight.size * self.qweight.dtype.itemsize
        total += self.scales.size * self.scales.dtype.itemsize
        if self.zeros is not None:
            total += self.zeros.size * self.zeros.dtype.itemsize
        return total


def repack_k_shards(qt: QuantizedTensor, k_shards: int) -> QuantizedTensor:
    """Re-pack an artifact so sub-byte code pairing is confined to each of
    ``k_shards`` contiguous K segments.

    Row-parallel tensor sharding under shard_map slices the packed array at
    segment boundaries; a ``k_shards=1`` artifact pairs code (k, k+K/2) in
    one byte, so a bare row slice is NOT self-contained -- it must be
    repacked first (one unpack/pack pass, done once at engine setup).
    """
    if qt.k_shards == k_shards:
        return qt
    from ..ops.packing import pack_codes_sharded, unpack_codes_sharded
    from ..ops.qmatmul import packed_bits

    bits = packed_bits(qt)
    codes = unpack_codes_sharded(qt.qweight, bits, qt.k_stored, qt.k_shards)
    return qt.replace(
        qweight=pack_codes_sharded(codes, bits, k_shards), k_shards=k_shards
    )


def concat_n(qts) -> "QuantizedTensor":
    """Concatenate packed artifacts along the output (N) dimension.

    Per-group quantization is independent per output column, so fusing
    projections that share an input (q|k|v, gate|up) into one artifact is
    *exact* -- the fused kernel then streams one wide weight instead of
    several narrow ones (fewer launches, wider N tiling).  Members may carry
    N padding; the fused tensor treats stored columns as logical (n_pad=0)
    and callers slice member outputs by :func:`stored_spans`.
    """
    import numpy as np

    first = qts[0]
    for qt in qts[1:]:
        if (qt.spec != first.spec or qt.mode != first.mode
                or qt.shape[0] != first.shape[0] or qt.k_shards != first.k_shards
                or qt.k_pad != first.k_pad
                or qt.scales.shape[0] != first.scales.shape[0]
                or (qt.zeros is None) != (first.zeros is None)):
            raise ValueError("concat_n: incompatible artifacts")
        # spec equality implies equal codebooks today, but guard anyway: two
        # LUT members with different codebooks would silently dequantize the
        # later members' columns through the first member's table
        if (qt.codebook is None) != (first.codebook is None) or (
            first.codebook is not None
            and not np.array_equal(np.asarray(qt.codebook),
                                   np.asarray(first.codebook))
        ):
            raise ValueError("concat_n: incompatible codebooks")
    total_n = sum(qt.shape[1] + qt.n_pad for qt in qts)
    return QuantizedTensor(
        jnp.concatenate([qt.qweight for qt in qts], axis=-1),
        jnp.concatenate([qt.scales for qt in qts], axis=-1),
        None if first.zeros is None
        else jnp.concatenate([qt.zeros for qt in qts], axis=-1),
        first.codebook,
        first.spec,
        (first.shape[0], total_n),
        first.mode,
        k_shards=first.k_shards,
        n_pad=0,
        k_pad=first.k_pad,
    )


def stored_spans(qts):
    """[(start, end)] of each member's *logical* columns inside the stored
    (padding-inclusive) width of ``concat_n(qts)``'s output."""
    spans, off = [], 0
    for qt in qts:
        spans.append((off, off + qt.shape[1]))
        off += qt.shape[1] + qt.n_pad
    return tuple(spans)
