"""Quantized linear-algebra ops: packing, XLA reference matmuls, Pallas kernels."""

from .packing import pack_codes, unpack_codes, PACKED_LAYOUTS
from .qmatmul import dequantize_weight, quantized_matmul

__all__ = [
    "pack_codes",
    "unpack_codes",
    "PACKED_LAYOUTS",
    "dequantize_weight",
    "quantized_matmul",
]
