"""Weight quantization: packed artifacts, RTN, and GPTQ calibration."""

from .qtensor import QuantizedTensor
from .rtn import quantize_tensor

__all__ = ["QuantizedTensor", "quantize_tensor"]
