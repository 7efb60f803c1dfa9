"""Iron-WOQ-TPU: a TPU-native weight-only-quantization inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
LiuTielong/Iron_weight_only_quant (reference mounted at /root/reference):

  * the full weight format zoo -- uniform INT2..INT8, parametric minifloat
    FP4/FP6/FP8 with configurable exponent/mantissa splits, block floating
    point (BFP), hardware-motivated "approximate" / "double-approximate"
    aligned decode, and the standalone two-step FP4 scheme
    (reference: quant_linear.py, fp4_quantize_cpu.py)
  * RTN and GPTQ (Hessian-calibrated) weight quantization
    (reference: quant_wrapper.py, gptq_utils.py, gptq/gptq.py)
  * real packed sub-byte weights with fused dequant-matmul Pallas kernels
    (the TPU-native equivalent of gptq/quant_cuda_kernel.cu)
  * LLaMA / OPT / BLOOM model families in pure functional JAX
  * a mesh-sharded inference engine (tensor/data parallel via jax.sharding)
    with a quantized KV cache
  * perplexity + zero-shot evaluation harnesses
    (reference: main.py SequentialPPLEvaluator, gptq/zeroShot/*)

Unlike the reference -- which fake-quantizes weights in place inside a
PyTorch/HF model -- this framework is a functional pipeline:

    checkpoint -> quantize (offline) -> packed artifact
               -> pure-JAX model fns -> pjit engine -> evaluators
"""

__version__ = "0.1.0"
