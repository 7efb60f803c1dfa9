"""Sub-byte weight packing with a TPU-friendly split-K layout.

The reference packs 32 3-bit codes into 3 int32 words with codewords split
across word boundaries (gptq/quant.py:149-184) -- a layout built for CUDA
in-register unpacking.  On TPU, lane interleaving is expensive but
*contiguous sublane blocks* are free, so we use a different scheme:

  int4: byte ``p[k, n]`` holds code ``(k, n)`` in its low nibble and code
        ``(k + K/2, n)`` in its high nibble.  Unpacking a packed tile yields
        two contiguous K-slabs -- no interleave, and a fused kernel simply
        computes ``x[:, :K/2] @ W_lo + x[:, K/2:] @ W_hi``.
  int2: byte holds codes ``(k, k+K/4, k+K/2, k+3K/4)`` in 2-bit lanes.
  int8: stored directly (int8).

Codes are stored *unsigned* with the format's zero offset folded into the
zero-point array (symmetric int4 stores ``code + 8`` and ``zero = 8``), so a
single ``(q - z) * s`` dequant rule covers symmetric and asymmetric weights.

Widths without a packed layout (3/5/6/7-bit, fp6) fall back to one byte per
code ("byte" layout) -- correct, just not size-optimal yet.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# storage bits -> (layout name, codes per byte)
PACKED_LAYOUTS = {
    2: ("nib2", 4),
    4: ("nib4", 2),
    8: ("byte", 1),
}


def packing_for_bits(bits: int) -> Tuple[str, int]:
    return PACKED_LAYOUTS.get(bits, ("byte", 1))


def pack_codes(codes: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Unsigned codes ``[K, N]`` int32 -> packed uint8 array.

    * 4-bit: ``[K/2, N]``  (low nibble = first K-half, high = second)
    * 2-bit: ``[K/4, N]``  (2-bit lanes = K-quarters, low to high)
    * else : ``[K, N]`` uint8
    """
    layout, per_byte = packing_for_bits(bits)
    k = codes.shape[0]
    if layout == "byte":
        return codes.astype(jnp.uint8)
    if k % per_byte != 0:
        raise ValueError(f"K={k} must divide {per_byte} for {bits}-bit packing")
    span = k // per_byte
    out = jnp.zeros((span,) + codes.shape[1:], jnp.int32)
    for i in range(per_byte):
        out = out | (codes[i * span : (i + 1) * span] << (bits * i))
    return out.astype(jnp.uint8)


def unpack_codes(packed: jnp.ndarray, bits: int, k: int) -> jnp.ndarray:
    """Inverse of :func:`pack_codes`: -> unsigned codes ``[K, N]`` int32."""
    layout, per_byte = packing_for_bits(bits)
    p = packed.astype(jnp.int32)
    if layout == "byte":
        return p
    mask = (1 << bits) - 1
    slabs = [(p >> (bits * i)) & mask for i in range(per_byte)]
    return jnp.concatenate(slabs, axis=0)


def signed_to_unsigned_offset(bits: int) -> int:
    """Offset added to symmetric (signed) codes for unsigned storage."""
    return 1 << (bits - 1)
