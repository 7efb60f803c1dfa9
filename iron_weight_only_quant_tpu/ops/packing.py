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
  int8: one byte per code.

Two bit-level twists make the packed bytes *directly consumable by int8
vector hardware* (Mosaic has no u8->float casts and no i8 shifts; see
NOTES.md):

  * the int4 high nibble is stored with its MSB flipped (``hi ^ 8``), so
    ``int8_bitcast(byte & 0xF0) == 16*hi - 128`` exactly -- the fused kernel
    feeds that to the MXU and folds the /16 and +128 into its per-group
    epilogue;
  * 8-bit codes are stored as ``code - 128`` two's-complement (callers shift
    their zero-points by -128), so a bare int8 bitcast yields the code.

``unpack_codes`` undoes both: it always returns the logical unsigned codes
for 2/4-bit and the signed (shifted) codes for 8-bit.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

# storage bits -> (layout name, K-divisibility requirement)
PACKED_LAYOUTS = {
    2: ("nib2", 4),
    3: ("s21", 8),   # 2-bit quads + MSB bit-plane -> 3 bytes per 8 codes
    4: ("nib4", 2),
    6: ("nq42", 4),  # 4-bit nibble array + 2-bit quad array -> exactly 6 b/code
    8: ("byte", 1),
}

INT8_STORAGE_SHIFT = 128  # 8-bit codes are stored as code - 128 (int8 pattern)


def packing_for_bits(bits: int) -> Tuple[str, int]:
    return PACKED_LAYOUTS.get(bits, ("byte", 1))


def pack_codes(codes: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Codes ``[K, N]`` int32 -> packed uint8 array.

    * 4-bit: codes in [0, 15] -> ``[K/2, N]`` (high nibble MSB-flipped)
    * 2-bit: codes in [0, 3]  -> ``[K/4, N]``
    * 8-bit: codes in [-128, 127] (already shifted by caller) -> ``[K, N]``
    """
    layout, per_byte = packing_for_bits(bits)
    k = codes.shape[0]
    if layout == "byte":
        return (codes & 0xFF).astype(jnp.uint8)
    if k % per_byte != 0:
        raise ValueError(f"K={k} must divide {per_byte} for {bits}-bit packing")
    span = k // per_byte
    if layout == "nq42":
        # 4+2 split for 6-bit codes (fp6 LUT): array A [K/2, N] packs the
        # codes' low 4 bits exactly like the int4 nibble layout (pairs
        # (k, k+K/2), high nibble MSB-flipped), array B [K/4, N] packs the
        # high 2 bits as plain byte fields (field j = logical K-quarter j;
        # no flip -- the LUT kernel widens to i32 before shifting, where
        # ``(i8_as_i32 >> 2j) & 3`` is exact for every field).  Exactly
        # 6 bits/code vs the 8 of the old byte-per-code fp6 storage (the
        # 25%-wasted-stream finding, VERDICT r2).
        ka, kb = k // 2, k // 4
        lo = codes & 0xF
        hi = (codes >> 4) & 3
        a = (lo[:ka] | ((lo[ka:] ^ 8) << 4)).astype(jnp.int32)
        b = jnp.zeros((kb,) + codes.shape[1:], jnp.int32)
        for j in range(4):
            b = b | (hi[j * kb : (j + 1) * kb] << (2 * j))
        return jnp.concatenate([a, b], axis=0).astype(jnp.uint8)
    if layout == "s21":
        # 2+1 split: array A [K/4, N] packs the codes' low 2 bits as byte
        # fields (field j = logical K-quarter j; the top field is stored
        # with its high bit flipped so ``i8(byte & 0xC0) == 64*f - 128``,
        # like the int4 high nibble), and array B [K/8, N] packs the MSB as
        # a bit-plane (bit i = logical K-eighth i).  Exactly 3 bits/code,
        # every slab contiguous, and the fused kernel decodes with one mask
        # (+cast) per element per array -- the reference packs 32 codes into
        # 3 int32 words with codewords split across word boundaries
        # (gptq/quant.py:149-184), built for CUDA in-register shuffling.
        qa, qb = k // 4, k // 8
        lo = codes & 3
        hi = (codes >> 2) & 1
        a = jnp.zeros((qa,) + codes.shape[1:], jnp.int32)
        for j in range(4):
            f = lo[j * qa : (j + 1) * qa]
            if j == 3:
                f = f ^ 2
            a = a | (f << (2 * j))
        b = jnp.zeros((qb,) + codes.shape[1:], jnp.int32)
        for i in range(8):
            b = b | (hi[i * qb : (i + 1) * qb] << i)
        return jnp.concatenate([a, b], axis=0).astype(jnp.uint8)
    out = jnp.zeros((span,) + codes.shape[1:], jnp.int32)
    for i in range(per_byte):
        slab = codes[i * span : (i + 1) * span]
        if bits == 4 and i == 1:
            slab = slab ^ 8  # MSB flip: i8(byte & 0xF0) == 16*hi - 128
        out = out | (slab << (bits * i))
    return out.astype(jnp.uint8)


def unpack_codes(packed: jnp.ndarray, bits: int, k: int) -> jnp.ndarray:
    """Inverse of :func:`pack_codes` -> logical codes ``[K, N]`` int32.

    4/2-bit: unsigned [0, 2^bits).  8-bit: signed (stored) value [-128, 127].
    """
    layout, per_byte = packing_for_bits(bits)
    p = packed.astype(jnp.int32)
    if layout == "byte":
        return ((p & 0xFF) ^ 0x80) - 0x80  # sign-extend the int8 pattern
    if layout == "nq42":
        ka, kb = k // 2, k // 4
        a, b = p[:ka], p[ka : ka + kb]
        lo = jnp.concatenate([a & 0xF, ((a >> 4) & 0xF) ^ 8], axis=0)
        hi = jnp.concatenate([(b >> (2 * j)) & 3 for j in range(4)], axis=0)
        return lo | (hi << 4)
    if layout == "s21":
        qa, qb = k // 4, k // 8
        a, b = p[:qa], p[qa : qa + qb]
        lo_slabs = []
        for j in range(4):
            f = (a >> (2 * j)) & 3
            if j == 3:
                f = f ^ 2
            lo_slabs.append(f)
        lo = jnp.concatenate(lo_slabs, axis=0)
        hi = jnp.concatenate([(b >> i) & 1 for i in range(8)], axis=0)
        return lo | (hi << 2)
    mask = (1 << bits) - 1
    slabs = []
    for i in range(per_byte):
        slab = (p >> (bits * i)) & mask
        if bits == 4 and i == 1:
            slab = slab ^ 8
        slabs.append(slab)
    return jnp.concatenate(slabs, axis=0)


def signed_to_unsigned_offset(bits: int) -> int:
    """Offset added to symmetric (signed) codes for unsigned storage."""
    return 1 << (bits - 1)


def pack_codes_sharded(codes: jnp.ndarray, bits: int, k_shards: int) -> jnp.ndarray:
    """Pack with pairing confined to each of ``k_shards`` K segments.

    Slicing the result at packed-segment boundaries yields arrays identical
    to packing each segment alone -- the layout contract that lets
    row-parallel tensor sharding hand every device a self-contained shard.
    """
    if k_shards <= 1:
        return pack_codes(codes, bits)
    k = codes.shape[0]
    if k % k_shards != 0:
        raise ValueError(f"K={k} not divisible by k_shards={k_shards}")
    seg = k // k_shards
    return jnp.concatenate(
        [pack_codes(codes[i * seg : (i + 1) * seg], bits) for i in range(k_shards)],
        axis=0,
    )


def unpack_codes_sharded(
    packed: jnp.ndarray, bits: int, k: int, k_shards: int
) -> jnp.ndarray:
    if k_shards <= 1:
        return unpack_codes(packed, bits, k)
    seg_k = k // k_shards
    seg_p = packed.shape[0] // k_shards
    return jnp.concatenate(
        [
            unpack_codes(packed[i * seg_p : (i + 1) * seg_p], bits, seg_k)
            for i in range(k_shards)
        ],
        axis=0,
    )
