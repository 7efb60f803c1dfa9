"""Weight quantization: packed artifacts, RTN, and GPTQ calibration."""

from .qtensor import QuantizedTensor
from .rtn import quantize_tensor
from .trueobs import TrueOBSResult, trueobs_quantize

__all__ = [
    "QuantizedTensor",
    "TrueOBSResult",
    "quantize_tensor",
    "trueobs_quantize",
]
