"""Round-to-nearest quantization into packed artifacts.

Produces a :class:`QuantizedTensor` whose dequantization is bit-identical to
the fake-quant oracle ``formats.fake_quantize`` (and therefore to the
reference ``QuantLinear``) -- verified by tests/test_qtensor.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PER_CHANNEL, PER_TENSOR, QuantSpec
from ..formats import make_groups, quantize_groups
from ..formats.api import _align_kind
from ..formats.minifloat import minifloat_codebook
from ..ops.packing import pack_codes_sharded, packing_for_bits, signed_to_unsigned_offset
from .qtensor import QuantizedTensor


def _kernel_layout(per_group_col: jnp.ndarray, k: int, n: int, group_size: int) -> jnp.ndarray:
    """Grouped side-info ``[n_groups, 1]`` -> kernel layout ``[K/G | 1, N] | [1, 1]``.

    Grouped rows are ordered N-major (grouping transposes to ``[N, K]``
    first), so row ``n * (K/G) + kg`` maps to kernel position ``[kg, n]``.
    """
    if group_size == PER_TENSOR:
        return per_group_col.reshape(1, 1)
    if group_size == PER_CHANNEL:
        return per_group_col.reshape(1, n)  # one scale per output channel
    kg = k // group_size
    return per_group_col.reshape(n, kg).T


def native_quantize_tensor(
    w, spec: QuantSpec, pad_n_to: int = 1
) -> Optional[QuantizedTensor]:
    """Quantize+pack via the C++ host library (native/iwoq_native.cpp).

    Bit-exact with :func:`quantize_tensor` (tests/test_native.py) for the
    int4/int8 per-group affine path; returns None when the layout or the
    library is unavailable so callers fall back to the jnp path.  This is
    the offline-quantization hot loop for CPU hosts (70B-class checkpoints
    on small VMs), where per-tensor jit dispatch dominates the jnp path.
    """
    from .. import native

    if (spec.fmt != "int" or spec.bits not in (4, 8) or spec.group_size <= 0
            or spec.quant_axis != 0 or not native.available()):
        return None
    w_np = np.asarray(w, np.float32)
    if w_np.ndim != 2:
        return None
    k, n = w_np.shape
    if k % spec.group_size or (spec.bits == 4 and k % 2):
        return None
    n_pad = 0
    if pad_n_to > 1 and n % pad_n_to != 0:
        n_pad = pad_n_to - n % pad_n_to
        w_np = np.pad(w_np, ((0, 0), (0, n_pad)))
    fn = (native.native_quantize_int4 if spec.bits == 4
          else native.native_quantize_int8)
    packed, scales, zeros = fn(w_np, spec.group_size, spec.symmetric)
    if spec.symmetric:
        # quantize_tensor stores symmetric zero-points as a broadcast scalar
        zeros = zeros[:1, :1].copy()
    return QuantizedTensor(
        jnp.asarray(packed), jnp.asarray(scales), jnp.asarray(zeros),
        None, spec, (k, n), "affine", 1, n_pad,
    )


def quantize_tensor(
    w: jnp.ndarray, spec: QuantSpec, k_shards: int = 1, pad_n_to: int = 1,
    side_dtype=None, pad_k_to: int = 1,
) -> QuantizedTensor:
    """Quantize an ``[K, N]`` kernel into a packed artifact (RTN path).

    ``k_shards > 1`` confines sub-byte packing to each of that many K
    segments so the artifact can be row-parallel sharded (see packing.py).
    ``pad_n_to`` zero-pads stored output columns to that multiple so the
    fused kernel always gets full-width tiles (``shape`` stays logical).
    ``pad_k_to`` zero-pads stored *reduction* rows to that multiple, in
    whole quantization groups (awkward K like 11008 only admits 128-row
    kernel tiles; padding to a 1024-multiple unlocks >=1408-row tiles for
    +2.3% stored bytes).  Exact: padded rows only ever multiply the
    kernel's zero-padded x columns, so they contribute exactly 0, and
    whole-group padding leaves real groups' scales untouched.  Skipped
    (k_pad=0) when the spec is not grouped or the multiple would split a
    group.
    ``side_dtype`` stores scales/zeros at reduced precision (e.g.
    ``jnp.float16`` -- the dtype the reference itself keeps scales in,
    quant_linear.py buffers are fp16): at g128 the f32 side-info stream is
    ~12% of the W4 kernel's HBM traffic, halved by 16-bit storage.
    Scale *computation* stays f32; only storage rounds.  Default f32.
    """
    if spec.quant_axis != 0:
        raise NotImplementedError("packed artifacts require quant_axis=0")
    if spec.fmt == "fp4_e1m2":
        raise NotImplementedError("fp4_e1m2 is a fake-quant-only scheme")
    if spec.fmt == "fp" and spec.approximate and spec.double_approximate \
            and spec.float_format.exp_bits != 1:
        raise NotImplementedError(
            "double-approximate decode is group-contextual; packed path unsupported"
        )

    def cast_side(a):
        return a if a is None or side_dtype is None else a.astype(side_dtype)

    k, n = w.shape
    n_pad = 0
    if pad_n_to > 1 and n % pad_n_to != 0:
        n_pad = pad_n_to - n % pad_n_to
        w = jnp.pad(w, ((0, 0), (0, n_pad)))
    n_stored = n + n_pad
    k_pad = 0
    if (pad_k_to > 1 and k % pad_k_to != 0 and spec.group_size > 0
            and pad_k_to % spec.group_size == 0 and k % spec.group_size == 0
            and k_shards == 1):
        k_pad = pad_k_to - k % pad_k_to
        w = jnp.pad(w, ((0, k_pad), (0, 0)))
    k_stored = k + k_pad
    groups = make_groups(w.astype(jnp.float32), spec.group_size, 0)
    enc = quantize_groups(groups, spec)

    def codes_to_kernel(codes: jnp.ndarray) -> jnp.ndarray:
        # grouped codes -> [K, N] kernel orientation
        return codes.reshape(n_stored, k_stored).T

    if spec.fmt == "int":
        codes = codes_to_kernel(enc.codes)
        if spec.symmetric:
            off = signed_to_unsigned_offset(spec.bits)
            codes = codes + off
            zeros = jnp.full((1, 1), float(off), jnp.float32)
        else:
            zeros = _kernel_layout(enc.zeros, k_stored, n_stored, spec.group_size)
        scales = _kernel_layout(enc.scales, k_stored, n_stored, spec.group_size)
        if packing_for_bits(spec.bits)[0] == "byte":
            # byte layouts store two's-complement code-128 (see packing.py);
            # shifting the zero-point keeps (code - zero) invariant
            codes = codes - 128
            zeros = zeros - 128.0
        qweight = pack_codes_sharded(codes, spec.bits, k_shards)
        return QuantizedTensor(qweight, cast_side(scales), cast_side(zeros),
                               None, spec, (k, n), "affine", k_shards, n_pad, k_pad)

    if spec.fmt == "bfp":
        codes = codes_to_kernel(enc.codes)
        if packing_for_bits(spec.bits)[0] == "byte":
            # signed mantissas fit the int8 pattern directly
            zeros = jnp.zeros((1, 1), jnp.float32)
        else:
            # sub-byte: shift to unsigned (magnitude <= 2^(b-1)-1)
            off = signed_to_unsigned_offset(spec.bits)
            codes = codes + off
            zeros = jnp.full((1, 1), float(off), jnp.float32)
        target_mant_bits = min(spec.bits - 1, 11)
        frac = target_mant_bits - 1
        scales_g = jnp.exp2((enc.exp_block - 15 - frac).astype(jnp.float32))
        scales = _kernel_layout(scales_g, k_stored, n_stored, spec.group_size)
        qweight = pack_codes_sharded(codes, spec.bits, k_shards)
        return QuantizedTensor(qweight, cast_side(scales), cast_side(zeros),
                               None, spec, (k, n), "affine", k_shards, n_pad, k_pad)

    # minifloat: LUT mode
    fmt = spec.float_format
    align = spec.effective_align(_align_kind(fmt)) if spec.approximate else None
    book = jnp.asarray(minifloat_codebook(fmt, align))
    codes = codes_to_kernel(enc.codes)
    scales = _kernel_layout(enc.scales, k_stored, n_stored, spec.group_size)
    zeros = (
        _kernel_layout(enc.zeros, k_stored, n_stored, spec.group_size) if enc.zeros is not None else None
    )
    store_bits = fmt.total_bits if fmt.total_bits in (2, 4, 6) else 8
    if store_bits == 6 and (k_stored % 4 or (k_stored // k_shards) % 4):
        store_bits = 8  # nq42 needs K divisible by 4 per shard
    if store_bits == 8:
        codes = codes - 128  # byte layout; dequant re-adds 128 before the LUT
    qweight = pack_codes_sharded(codes, store_bits, k_shards)
    return QuantizedTensor(qweight, cast_side(scales), cast_side(zeros), book,
                           spec, (k, n), "lut", k_shards, n_pad, k_pad)
