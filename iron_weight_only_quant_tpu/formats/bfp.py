"""Block floating point codec (SURVEY.md C6).

Mirrors reference quant_linear.py:648-723: weights are viewed as IEEE fp16
bit fields, every mantissa in a group is right-shift-aligned to the group's
maximum exponent field, then rounded/truncated to ``bits-1`` mantissa bits
(including the leading 1).  Dequantization multiplies by
``2^(exp_block - 15 - frac_bits_keep)``.

Storage: signed aligned mantissas (int32 codes, magnitude < 2^(bits-1)) plus
one 5-bit shared exponent field per group.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .minifloat import _rounding_rshift


def _fp16_fields(g: jnp.ndarray):
    """float input -> (sign, exp_field, mant_field) of its fp16 encoding."""
    bits16 = jax.lax.bitcast_convert_type(g.astype(jnp.float16), jnp.int16)
    bits = bits16.astype(jnp.int32) & 0xFFFF
    sign = (bits >> 15) & 0x1
    exp = (bits >> 10) & 0x1F
    mant = bits & 0x3FF
    return sign, exp, mant


def encode_bfp(groups: jnp.ndarray, bits: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped view -> (signed mantissa codes int32 [G,S], exp_block int32 [G,1])."""
    sign, exp, mant = _fp16_fields(groups)
    leading = jnp.where(exp == 0, 0, 1)
    mant11 = (leading << 10) | mant

    exp_block = jnp.max(exp, axis=1, keepdims=True)
    shift = jnp.clip(exp_block - exp, 0, None)
    mant_aligned = mant11 >> shift  # truncating align (reference line 670)

    target_mant_bits = min(bits - 1, 11)
    shift_down = max(0, 11 - target_mant_bits)
    if shift_down > 0:
        mant_rounded = _rounding_rshift(mant_aligned, jnp.full_like(mant_aligned, shift_down))
    else:
        mant_rounded = mant_aligned
    mant_rounded = jnp.minimum(mant_rounded, (1 << target_mant_bits) - 1)
    codes = jnp.where(sign == 1, -mant_rounded, mant_rounded)
    return codes.astype(jnp.int32), exp_block.astype(jnp.int32)


def decode_bfp(codes: jnp.ndarray, exp_block: jnp.ndarray, bits: int) -> jnp.ndarray:
    target_mant_bits = min(bits - 1, 11)
    frac_bits_keep = target_mant_bits - 1
    scale = jnp.exp2((exp_block - 15 - frac_bits_keep).astype(jnp.float32))
    return codes.astype(jnp.float32) * scale
