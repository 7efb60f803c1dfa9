"""Uniform integer codec (SURVEY.md C1/C3).

Semantics mirror reference quant_linear.py:885-956 (QuantLinear int path) and
quant_funcs.py:4-46 (pseudo_quantize_tensor):

  symmetric:  max_int = 2^(b-1)-1, min_int = -2^(b-1)
              scale = clamp(absmax, 1e-5) / max_int
              q     = clamp(round(w / scale), min_int, max_int)
  asymmetric: max_int = 2^b - 1
              scale = clamp(max - min, 1e-5) / max_int
              zero  = clamp(round(-min / scale), 0, max_int)
              q     = clamp(round(w / scale) + zero, 0, max_int)

All math in float32 with round-half-to-even (same as torch.round).
Codes are returned as int32 in the natural signed/unsigned domain; the
packing layer (ops/packing.py) offsets them for storage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

SCALE_EPS = 1e-5  # reference quant_linear.py:911,921


def int_range(bits: int, symmetric: bool) -> Tuple[int, int]:
    if symmetric:
        return -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    return 0, 2**bits - 1


def encode_int(
    groups: jnp.ndarray, bits: int, symmetric: bool
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Grouped view -> (codes int32, scales f32 [G,1], zeros f32 [G,1] | None)."""
    g = groups.astype(jnp.float32)
    min_int, max_int = int_range(bits, symmetric)
    if symmetric:
        absmax = jnp.clip(jnp.max(jnp.abs(g), axis=1, keepdims=True), SCALE_EPS, None)
        scales = absmax / max_int
        zeros = None
        q = jnp.clip(jnp.round(g / scales), min_int, max_int)
    else:
        hi = jnp.max(g, axis=1, keepdims=True)
        lo = jnp.min(g, axis=1, keepdims=True)
        scales = jnp.clip(hi - lo, SCALE_EPS, None) / max_int
        zeros = jnp.clip(jnp.round(-lo / scales), min_int, max_int)
        q = jnp.clip(jnp.round(g / scales) + zeros, min_int, max_int)
    return q.astype(jnp.int32), scales, zeros


def decode_int(
    codes: jnp.ndarray,
    scales: jnp.ndarray,
    zeros: Optional[jnp.ndarray],
    symmetric: bool,
) -> jnp.ndarray:
    q = codes.astype(jnp.float32)
    if symmetric:
        assert zeros is None
        return q * scales
    return (q - zeros) * scales


def pseudo_quantize(
    tensor: jnp.ndarray,
    bits: int = 8,
    zero_point: bool = True,
    group_size: int = -1,
    per_tensor: bool = False,
) -> jnp.ndarray:
    """Fake-quant round trip over the last dim, for activations / KV.

    Port of reference quant_funcs.py:4-46 ``pseudo_quantize_tensor``: rows of
    a 2-D view are the quantization unit (optionally regrouped to
    ``group_size`` or flattened for per-tensor).  Used by the KV-cache
    quantizer -- a capability the reference declares but leaves inert
    (utils.py:31-33).
    """
    shape = tensor.shape
    t = tensor.astype(jnp.float32)
    if group_size > 0:
        if shape[-1] % group_size != 0:
            raise ValueError("last dim must divide group_size")
        t = t.reshape(-1, group_size)
    else:
        t = t.reshape(-1, shape[-1])
    if per_tensor:
        t = t.reshape(1, -1)
    codes, scales, zeros = encode_int(t, bits, symmetric=not zero_point)
    out = decode_int(codes, scales, zeros, symmetric=not zero_point)
    return out.reshape(shape).astype(tensor.dtype)


# Named convenience wrappers mirroring reference quant_funcs.py:49-77.

def quantize_weight_per_channel_absmax(w, n_bits: int = 8):
    return pseudo_quantize(w, bits=n_bits, zero_point=False, group_size=-1)


def quantize_weight_per_tensor_absmax(w, n_bits: int = 8):
    return pseudo_quantize(w, bits=n_bits, zero_point=False, group_size=-1,
                           per_tensor=True)


def quantize_activation_per_token_absmax(t, n_bits: int = 8):
    return pseudo_quantize(t, bits=n_bits, zero_point=True, group_size=-1)


def quantize_activation_per_tensor_absmax(t, n_bits: int = 8):
    return pseudo_quantize(t, bits=n_bits, zero_point=True, group_size=-1,
                           per_tensor=True)
