"""Quantized matmul: XLA reference path + dispatch to Pallas kernels.

The XLA path (`dequantize_weight` then `jnp.dot`) is the correctness oracle
and CPU fallback; on TPU the fused Pallas kernel (ops/pallas/) reads packed
weights directly from HBM.  This pair replaces the reference's
``Quant3Linear.forward`` -> ``quant_cuda.vecquant3matmul`` call chain
(gptq/quant.py:186-200).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..quantize.qtensor import QuantizedTensor
from .packing import unpack_codes_sharded


def packed_bits(qt: QuantizedTensor) -> int:
    b = qt.spec.storage_bits
    if qt.mode == "lut":  # codebook indexing needs plain unsigned sub-byte
        if b == 6:
            # nq42 sub-byte layout stores [3K/4, N] bytes; legacy byte-per-
            # code fp6 artifacts (pre round 3) stored [K, N]
            k_rows = qt.qweight.shape[-2]
            per_shard = qt.k_stored // qt.k_shards
            return 6 if k_rows * 4 == qt.k_stored * 3 and per_shard % 4 == 0 else 8
        return b if b in (2, 4) else 8
    return b if b in (2, 3, 4, 8) else 8


def dequantize_weight(qt: QuantizedTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Packed artifact -> dense ``[K, N]`` weight (the XLA reference path)."""
    codes = unpack_codes_sharded(
        qt.qweight, packed_bits(qt), qt.k_stored, qt.k_shards
    )
    k = qt.k_stored
    scales, zeros_arr = qt.scales, qt.zeros
    if qt.side_pad:  # stack-time sublane padding (see stack_model_layers)
        scales = scales[: scales.shape[0] - qt.side_pad]
        if zeros_arr is not None and zeros_arr.shape[0] == scales.shape[0] + qt.side_pad:
            zeros_arr = zeros_arr[: scales.shape[0]]
    scales = scales.astype(jnp.float32)
    # broadcast per-group side info over K: [K/G, N] -> [K, N]
    def expand(side):
        if side.shape[0] == 1:
            return side
        g = k // side.shape[0]
        return jnp.repeat(side, g, axis=0)

    if qt.mode == "affine":
        zeros = (expand(zeros_arr.astype(jnp.float32))
                 if zeros_arr is not None else 0.0)
        w = (codes.astype(jnp.float32) - zeros) * expand(scales)
    else:  # lut
        if packed_bits(qt) == 8:
            codes = codes + 128  # byte layout stores code-128 (packing.py)
        w = qt.codebook[codes] * expand(scales)
        if zeros_arr is not None:
            w = w + expand(zeros_arr.astype(jnp.float32))
    if qt.k_pad:
        w = w[: qt.k]
    if qt.n_pad:
        w = w[:, : qt.n]
    return w.astype(dtype)


_DEFAULT_ACTIVATION_BITS: Optional[int] = None


class activation_quant:
    """Context manager enabling W4A8/W8A8 serving: fused kernels quantize
    activations to int8 per row and run int8 MXU contractions."""

    def __init__(self, bits: Optional[int] = 8):
        self.bits = bits

    def __enter__(self):
        global _DEFAULT_ACTIVATION_BITS
        self._prev = _DEFAULT_ACTIVATION_BITS
        _DEFAULT_ACTIVATION_BITS = self.bits
        return self

    def __exit__(self, *exc):
        global _DEFAULT_ACTIVATION_BITS
        _DEFAULT_ACTIVATION_BITS = self._prev
        return False


def _rms_nogamma(x: jnp.ndarray, eps: float, dtype) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(ms + eps)).astype(dtype)


def quantized_matmul(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    bias: Optional[jnp.ndarray] = None,
    *,
    use_pallas: Optional[bool] = None,
    accum_dtype=jnp.float32,
    activation_bits: Optional[int] = None,
    pre_norm: Optional[float] = None,
) -> jnp.ndarray:
    """``y = x @ dequant(qt) (+ bias)`` with fused-kernel dispatch.

    ``use_pallas=None`` auto-selects: the fused kernel runs on TPU for
    supported layouts (int4/int8 affine, 4/8-bit LUT), XLA otherwise.
    ``activation_bits`` (or the ambient ``activation_quant`` context) enables
    the int8-activation kernel path; it applies to the fused TPU kernel only
    (the XLA fallback stays full-precision).
    ``pre_norm`` (the rms eps) applies a weightless rmsnorm to x first --
    in-kernel on the fused TPU path (the norm gamma must be folded into the
    weights, see models.llama.fold_llama_norms), as a plain XLA op
    otherwise.
    """
    if activation_bits is None:
        activation_bits = _DEFAULT_ACTIVATION_BITS
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu" and _pallas_supported(qt)
        )
    if use_pallas:
        from .pallas.dequant_matmul import fused_quantized_matmul

        out = fused_quantized_matmul(x, qt, activation_bits=activation_bits,
                                     pre_norm=pre_norm)
    else:
        if pre_norm is not None:
            x = _rms_nogamma(x, pre_norm, x.dtype)
        w = dequantize_weight(qt, dtype=accum_dtype)
        out = jnp.dot(
            x.astype(accum_dtype), w, preferred_element_type=accum_dtype
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)


def _pallas_supported(qt: QuantizedTensor) -> bool:
    from .pallas.dequant_matmul import kernel_supported

    return kernel_supported(qt)


def index_stacked(qt: QuantizedTensor, layer_idx) -> QuantizedTensor:
    """Dynamic-index one layer out of a layer-stacked artifact (XLA path).

    This materializes the layer's packed arrays (an HBM copy) -- it is the
    fallback when the scalar-prefetch kernel cannot run.
    """
    return jax.tree.map(lambda a: a[layer_idx], qt)


def quantized_matmul_stacked(
    x: jnp.ndarray,
    qt: QuantizedTensor,
    layer_idx,
    bias: Optional[jnp.ndarray] = None,
    *,
    use_pallas: Optional[bool] = None,
    accum_dtype=jnp.float32,
    activation_bits: Optional[int] = None,
    pre_norm: Optional[float] = None,
) -> jnp.ndarray:
    """``y = x @ dequant(qt[layer_idx]) (+ bias)`` for layer-stacked artifacts.

    Used by scan-over-layers forwards: on TPU the fused kernel DMAs only the
    selected layer's tiles (scalar-prefetch index maps), so scanning costs the
    same HBM traffic as the unrolled forward.  Elsewhere it falls back to
    dynamic-indexing the layer out (one packed-weight copy per call).
    """
    if activation_bits is None:
        activation_bits = _DEFAULT_ACTIVATION_BITS
    if use_pallas is None:
        from .pallas.dequant_matmul import kernel_supported_stacked

        use_pallas = (
            jax.default_backend() == "tpu" and kernel_supported_stacked(qt)
        )
    if use_pallas:
        from .pallas.dequant_matmul import fused_quantized_matmul_stacked

        out = fused_quantized_matmul_stacked(
            x, qt, layer_idx, activation_bits=activation_bits,
            pre_norm=pre_norm,
        )
    else:
        if pre_norm is not None:
            x = _rms_nogamma(x, pre_norm, x.dtype)
        w = dequantize_weight(index_stacked(qt, layer_idx), dtype=accum_dtype)
        out = jnp.dot(
            x.astype(accum_dtype), w, preferred_element_type=accum_dtype
        )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
