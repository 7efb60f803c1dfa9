"""Pallas TPU kernels: fused dequant-matmul (the native-kernel layer)."""
