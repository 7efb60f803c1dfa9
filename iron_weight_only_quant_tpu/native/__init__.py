"""ctypes bindings for the C++ native library (native/libiwoq.so).

Builds on first use if the shared object is missing and a toolchain is
available; every entry point has a pure-Python/jnp fallback so the framework
works without it (``available()`` reports which path is active).
"""

from .lib import (
    available,
    native_quantize_int4,
    native_quantize_int8,
    native_pack_int4,
    native_unpack_int4,
    TokenShardReader,
)

__all__ = [
    "available",
    "native_quantize_int4",
    "native_quantize_int8",
    "native_pack_int4",
    "native_unpack_int4",
    "TokenShardReader",
]
