"""Fused dequant-matmul Pallas kernel (TPU equivalent of
gptq/quant_cuda_kernel.cu).

Placeholder dispatch surface for now: `kernel_supported` gates the fast path
and the XLA fallback in ops/qmatmul.py stays authoritative until the kernel
lands (build-plan stage 7 in SURVEY.md).
"""

from __future__ import annotations

from ...quantize.qtensor import QuantizedTensor


def kernel_supported(qt: QuantizedTensor) -> bool:
    return False


def fused_quantized_matmul(x, qt: QuantizedTensor):
    raise NotImplementedError("Pallas fused dequant-matmul not yet implemented")
