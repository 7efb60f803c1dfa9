"""Unified codec dispatch over :class:`~iron_weight_only_quant_tpu.config.QuantSpec`.

This is the single entry point the quantizer, the packing layer, and the
fake-quant evaluation path all share -- replacing the reference's
format-branching inside ``QuantLinear.quantize_weight``
(quant_linear.py:635-958).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..config import FloatFormat, QuantSpec
from . import bfp as bfp_mod
from . import fp4_e1m2 as fp4cpu
from . import int_codec
from . import minifloat as mf
from .grouping import make_groups, restore_from_groups


class GroupCodes(NamedTuple):
    """Encoded grouped view + side info. Fields unused by a format are None."""

    codes: jnp.ndarray  # int32 [n_groups, width]
    scales: Optional[jnp.ndarray]  # f32 [n_groups, 1]
    zeros: Optional[jnp.ndarray]  # f32 [n_groups, 1]
    exp_block: Optional[jnp.ndarray]  # int32 [n_groups, 1] (bfp only)


def _align_kind(fmt: FloatFormat) -> str:
    return {4: "fp4", 6: "fp6", 8: "fp8"}.get(fmt.total_bits, "fp8")


def quantize_groups(groups: jnp.ndarray, spec: QuantSpec) -> GroupCodes:
    if spec.fmt == "int":
        codes, scales, zeros = int_codec.encode_int(groups, spec.bits, spec.symmetric)
        return GroupCodes(codes, scales, zeros, None)
    if spec.fmt == "fp":
        # The approximate path always uses the symmetric absmax scale
        # (reference quantize_weight_approximate, lines 490-494).
        symmetric = True if spec.approximate else spec.symmetric
        codes, scales, zeros = mf.encode_minifloat(groups, spec.float_format, symmetric)
        return GroupCodes(codes, scales, zeros, None)
    if spec.fmt == "bfp":
        codes, exp_block = bfp_mod.encode_bfp(groups, spec.bits)
        return GroupCodes(codes, None, None, exp_block)
    raise NotImplementedError(f"quantize_groups does not support fmt={spec.fmt!r}")


def dequantize_groups(enc: GroupCodes, spec: QuantSpec) -> jnp.ndarray:
    if spec.fmt == "int":
        return int_codec.decode_int(enc.codes, enc.scales, enc.zeros, spec.symmetric)
    if spec.fmt == "fp":
        fmt = spec.float_format
        if spec.approximate:
            align = spec.effective_align(_align_kind(fmt))
            # E=1 formats always use single-approx decode; wider exponents use
            # the group-of-4 double approx when requested
            # (reference quant_linear.py:496-535 fp4 branch).
            use_double = spec.double_approximate and fmt.exp_bits != 1
            return mf.decode_minifloat(
                enc.codes, enc.scales, enc.zeros, fmt, align=align, double_approx=use_double
            )
        return mf.decode_minifloat(enc.codes, enc.scales, enc.zeros, fmt)
    if spec.fmt == "bfp":
        return bfp_mod.decode_bfp(enc.codes, enc.exp_block, spec.bits)
    raise NotImplementedError(f"dequantize_groups does not support fmt={spec.fmt!r}")


def fake_quantize(w: jnp.ndarray, spec: QuantSpec) -> jnp.ndarray:
    """Quantize-dequantize round trip on an ``[in, out]`` weight.

    Equivalent to what the reference's ``QuantLinear`` stores back into
    ``self.weight`` -- used by the parity evaluation path and as the oracle
    for the packed kernels.
    """
    if spec.fmt == "fp4_e1m2":
        # Standalone scheme quantizes the [out, in] orientation with groups
        # along input features, like fp4_quantize_cpu.py.
        q = fp4cpu.quantize_fp4_two_step(
            w.T if spec.quant_axis == 0 else w,
            group_size=spec.group_size,
            per_tensor=spec.group_size == -1,
        )
        return q.T if spec.quant_axis == 0 else q
    groups = make_groups(w.astype(jnp.float32), spec.group_size, spec.quant_axis)
    enc = quantize_groups(groups, spec)
    deq = dequantize_groups(enc, spec)
    return restore_from_groups(deq, w.shape, spec.quant_axis).astype(w.dtype)
