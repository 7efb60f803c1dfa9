"""Parametric minifloat codec with approximate aligned decode (C4/C5).

Behavioural contract (derived from reference quant_linear.py):

  * ``float_to_code``   == _float_to_fp        (lines 126-163)
  * ``code_to_float``   == _fp_to_float        (lines 213-235)
  * ``decode_minifloat_aligned``       == _fp_decode_aligned (237-285)
  * ``decode_minifloat_double_approx`` == fp_decode_aligned_double_approx
                                          (288-363)
  * ``encode_minifloat`` == the scale/normalize/encode steps of
    QuantLinear.quantize_weight fp4/fp6/fp8 branches (724-883) and
    quantize_weight_approximate (470-632)

Notable quirks mirrored on purpose:
  * no rounding carry from mantissa into exponent: a value that rounds up to
    2.0x its binade is clamped to the largest mantissa instead;
  * zero inputs are forced to code 0; negative values whose subnormal
    mantissa rounds to 0 keep their sign bit but decode to -0.0;
  * the double-approx grouping of 4 runs down the *transposed* grouped view
    (reference line 309 ``code.t()``), i.e. across quantization groups.

Exponents are extracted exactly from float32 bit patterns instead of
``log2`` (bit-identical to mathematical floor(log2|x|), which the
reference's fp16 ``torch.log2`` only approximates).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import AlignSpec, FloatFormat

SCALE_EPS = 1e-5
_ZERO_SAFE = 1e-8  # reference quant_linear.py:133


def _floor_log2(x: jnp.ndarray) -> jnp.ndarray:
    """Exact floor(log2(x)) for positive normal float32 x, via bitcast."""
    raw = jax.lax.bitcast_convert_type(jnp.asarray(x, jnp.float32), jnp.int32)
    return ((raw >> 23) & 0xFF) - 127


def _rounding_rshift(val: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """Round-half-up right shift (reference _rounding_rshift, lines 112-123)."""
    shift = jnp.asarray(shift, val.dtype)
    offset = jnp.where(shift > 0, 1 << jnp.maximum(shift - 1, 0), 0).astype(val.dtype)
    return (val + offset) >> shift


def float_to_code(x: jnp.ndarray, fmt: FloatFormat) -> jnp.ndarray:
    """Encode float values (already normalized into fmt's range) to codewords."""
    e_bits, m_bits, bias = fmt.exp_bits, fmt.mant_bits, fmt.bias
    x = x.astype(jnp.float32)
    sign = (x < 0).astype(jnp.int32)
    x_abs = jnp.abs(x)
    zero_mask = x_abs == 0
    safe = jnp.where(zero_mask, _ZERO_SAFE, x_abs)

    max_exp_field = fmt.max_exp_field
    min_normal_exp = fmt.min_normal_exp
    exp_val = _floor_log2(safe)
    is_sub = exp_val < min_normal_exp

    exp_clamped = jnp.clip(exp_val, min_normal_exp, max_exp_field - bias)
    mant_scale = 1 << m_bits
    pow_exp = jnp.exp2(exp_clamped.astype(jnp.float32))
    mant_normal = jnp.clip(
        jnp.round((safe / pow_exp - 1.0) * mant_scale), 0, mant_scale - 1
    ).astype(jnp.int32)
    mant_sub = jnp.clip(
        jnp.round(safe * (2.0 ** (-min_normal_exp)) * mant_scale), 0, mant_scale - 1
    ).astype(jnp.int32)

    exp_field = jnp.where(is_sub, 0, exp_clamped + bias)
    mant_field = jnp.where(is_sub, mant_sub, mant_normal)
    code = (sign << (e_bits + m_bits)) | (exp_field << m_bits) | mant_field
    return jnp.where(zero_mask, 0, code).astype(jnp.int32)


def _split_code(code: jnp.ndarray, fmt: FloatFormat):
    e_bits, m_bits = fmt.exp_bits, fmt.mant_bits
    code = code.astype(jnp.int32)
    sign = (code >> (e_bits + m_bits)) & 0x1
    exp_field = (code >> m_bits) & ((1 << e_bits) - 1)
    mant_field = code & ((1 << m_bits) - 1)
    return sign, exp_field, mant_field


def code_to_float(code: jnp.ndarray, fmt: FloatFormat) -> jnp.ndarray:
    """Exact decode (incl. subnormals); code 0 -> 0.0."""
    m_bits, bias = fmt.mant_bits, fmt.bias
    sign, exp_field, mant_field = _split_code(code, fmt)
    zero_mask = code == 0
    mant = mant_field.astype(jnp.float32) / (1 << m_bits)
    value_normal = (1.0 + mant) * jnp.exp2((exp_field - bias).astype(jnp.float32))
    value_sub = mant * (2.0 ** (1 - bias))
    value = jnp.where(exp_field == 0, value_sub, value_normal)
    value = jnp.where(sign == 1, -value, value)
    return jnp.where(zero_mask, 0.0, value)


def decode_minifloat_aligned(
    code: jnp.ndarray, fmt: FloatFormat, align: AlignSpec
) -> jnp.ndarray:
    """Approximate decode: high-exponent codes share exponent ``hi_align_exp_field``."""
    m_bits, bias = fmt.mant_bits, fmt.bias
    sign, exp_field, mant_field = _split_code(code, fmt)
    zero_mask = code == 0

    align_exp = (
        jnp.where(exp_field == 0, 1, exp_field)
        if align.align_subnorm_exp_as_one
        else exp_field
    )
    leading = jnp.where(exp_field == 0, 0, 1)
    mant_full = (leading << m_bits) | mant_field
    pad = align.tail_pad_bits
    if pad >= 0:
        mant_padded = mant_full << pad
    else:
        mant_padded = _rounding_rshift(mant_full, jnp.full_like(mant_full, -pad))

    exp_unbiased = jnp.where(exp_field == 0, 1 - bias, exp_field - bias)
    value_normal = mant_full.astype(jnp.float32) / (1 << m_bits) * jnp.exp2(
        exp_unbiased.astype(jnp.float32)
    )

    hi_mask = align_exp >= align.hi_align_start
    if align.limit_align_exp_to_field:
        hi_mask = hi_mask & (align_exp <= align.hi_align_exp_field)

    shift = jnp.clip(align.hi_align_exp_field - align_exp, 0, None)
    mant_aligned = _rounding_rshift(mant_padded, shift)
    hi_unbiased = align.hi_align_exp_field - bias
    value_hi = mant_aligned.astype(jnp.float32) / (2.0 ** (m_bits + pad)) * (
        2.0**hi_unbiased
    )

    value = jnp.where(hi_mask, value_hi, value_normal)
    value = jnp.where(sign == 1, -value, value)
    return jnp.where(zero_mask, 0.0, value)


def _wrap_i8(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate int32 values to int8 two's-complement (torch int8 semantics)."""
    return ((x & 0xFF) ^ 0x80) - 0x80


def _rounding_rshift_i8(val: jnp.ndarray, shift: jnp.ndarray) -> jnp.ndarray:
    """_rounding_rshift as executed on int8 tensors by the reference.

    The reference's double-approx path casts mantissa fields to ``torch.int8``
    (quant_linear.py:311-313), so the round-half-up offset ``1 << (shift-1)``
    wraps for shift >= 8 (e.g. shift==8 -> offset -128, making the shifted
    mantissa -1 with a flipped sign).  Mirrored bit-for-bit on purpose.
    """
    offset = jnp.where(shift > 0, _wrap_i8(1 << jnp.clip(shift - 1, 0, 31)), 0)
    return _wrap_i8(val + offset) >> shift


def decode_minifloat_double_approx(
    code: jnp.ndarray, fmt: FloatFormat, align: AlignSpec
) -> jnp.ndarray:
    """Group-of-4 double-approximate decode (reference lines 288-363).

    The grouped-view code matrix is transposed before flattening into runs of
    4 -- consecutive elements of a run come from *different* quantization
    groups, exactly as in the reference.  Mantissa arithmetic emulates the
    reference's int8 tensors, including their overflow behavior.
    """
    m_bits, bias = fmt.mant_bits, fmt.bias
    code_t = code.astype(jnp.int32).T
    orig_t_shape = code_t.shape
    sign, exp_field, mant_field = _split_code(code_t, fmt)
    zero_mask = code_t == 0

    align_exp = (
        jnp.where(exp_field == 0, 1, exp_field)
        if align.align_subnorm_exp_as_one
        else exp_field
    )
    leading = jnp.where(exp_field == 0, 0, 1)
    mant_full = (leading << m_bits) | mant_field
    pad = align.tail_pad_bits
    if pad >= 0:
        mant_padded = _wrap_i8(mant_full << pad)
    else:
        mant_padded = _rounding_rshift_i8(mant_full, jnp.full_like(mant_full, -pad))

    if code_t.size % 4 != 0:
        raise ValueError("double approx requires element count divisible by 4")
    exp_g = align_exp.reshape(-1, 4)
    mant_g = mant_padded.reshape(-1, 4)
    sign_g = sign.reshape(-1, 4)
    zero_g = zero_mask.reshape(-1, 4)

    outlier = (exp_g < align.hi_align_start) | (exp_g > align.hi_align_exp_field)
    outlier_count = jnp.sum(outlier, axis=1, keepdims=True)
    group_max = jnp.max(exp_g, axis=1, keepdims=True)
    target = jnp.where(outlier_count <= 1, align.hi_align_exp_field, group_max)
    if align.handle_max_outlier:
        max_exp_val = fmt.max_exp_field
        has_max = jnp.any((exp_g == max_exp_val) & outlier, axis=1, keepdims=True)
        target = jnp.where(has_max, max_exp_val, target)

    shift = target - exp_g
    mant_right = _rounding_rshift_i8(mant_g, jnp.clip(shift, 0, None))
    mant_left = _wrap_i8(mant_g << jnp.clip(-shift, 0, None))
    if pad >= 0:
        cap = ((1 << (m_bits + 1)) - 1) << pad
    else:
        cap = ((1 << (m_bits + 1)) - 1) >> (-pad)
    mant_left = jnp.minimum(mant_left, cap)
    mant_aligned = jnp.where(shift >= 0, mant_right, mant_left)

    value = mant_aligned.astype(jnp.float32) / (2.0 ** (m_bits + pad)) * jnp.exp2(
        (target - bias).astype(jnp.float32)
    )
    value = jnp.where(sign_g == 1, -value, value)
    value = jnp.where(zero_g, 0.0, value)
    return value.reshape(orig_t_shape).T


def encode_minifloat(
    groups: jnp.ndarray, fmt: FloatFormat, symmetric: bool = True
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Grouped view -> (codes, scales, zeros|None).

    Symmetric: scale maps the group absmax onto fmt.max_value.
    Asymmetric: zero is the range midpoint, scale maps the half-span
    (reference quant_linear.py:748-755).
    """
    g = groups.astype(jnp.float32)
    fp_max = fmt.max_value
    if symmetric:
        absmax = jnp.clip(jnp.max(jnp.abs(g), axis=1, keepdims=True), SCALE_EPS, None)
        scales = jnp.clip(absmax / fp_max, SCALE_EPS, None)
        zeros = None
        normalized = jnp.clip(g / scales, -fp_max, fp_max)
    else:
        hi = jnp.max(g, axis=1, keepdims=True)
        lo = jnp.min(g, axis=1, keepdims=True)
        mid = (hi + lo) * 0.5
        span = jnp.clip((hi - lo) * 0.5, SCALE_EPS, None)
        scales = jnp.clip(span / fp_max, SCALE_EPS, None)
        # The reference stores zero-points as fp16 and adds the *rounded*
        # value back during dequantization (quant_linear.py:762 ``.half()``
        # and :776), while scales stay full precision in the dequant product.
        # Mirror that asymmetric rounding.
        zeros = mid.astype(jnp.float16).astype(jnp.float32)
        normalized = jnp.clip((g - mid) / scales, -fp_max, fp_max)
    codes = float_to_code(normalized, fmt)
    return codes, scales, zeros


def decode_minifloat(
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    zeros: Optional[jnp.ndarray],
    fmt: FloatFormat,
    align: Optional[AlignSpec] = None,
    double_approx: bool = False,
) -> jnp.ndarray:
    if align is None:
        vals = code_to_float(codes, fmt)
    elif double_approx:
        vals = decode_minifloat_double_approx(codes, fmt, align)
    else:
        vals = decode_minifloat_aligned(codes, fmt, align)
    out = vals * scales
    if zeros is not None:
        out = out + zeros
    return out


def minifloat_codebook(
    fmt: FloatFormat, align: Optional[AlignSpec] = None
) -> np.ndarray:
    """All 2^(1+E+M) codeword values (exact or aligned decode) as float32.

    Used by the LUT dequant kernel and by golden tests (the fp4 analogue of
    the CUDA ``deq2`` shared-memory table, quant_cuda_kernel.cu:185-192).
    """
    n = 1 << fmt.total_bits
    codes = jnp.arange(n, dtype=jnp.int32)
    if align is None:
        vals = code_to_float(codes, fmt)
    else:
        vals = decode_minifloat_aligned(codes, fmt, align)
    return np.asarray(vals, dtype=np.float32)
