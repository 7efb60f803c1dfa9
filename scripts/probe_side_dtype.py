#!/usr/bin/env python3
"""Probe: f32 vs f16/bf16 scale+zero storage in the fused W4 kernel.

At g128 the two f32 side arrays are ~12% of the kernel's HBM bytes; 16-bit
storage halves that stream (NOTES.md round-2 item 1).  The reference itself
keeps scales in fp16 buffers, so f16 storage is parity-faithful.

Run alone on the shared chip:  timeout 900 python scripts/probe_side_dtype.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
    fused_quantized_matmul,
)
from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight
from iron_weight_only_quant_tpu.quantize import quantize_tensor
from tpu_smoke import timeit

HBM_GBPS = 819.0


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        base = None
        for name, sd in (("f32", None), ("packed", "packed")):
            if sd == "packed":
                from iron_weight_only_quant_tpu.quantize.rtn import with_packed_sides
                qt = with_packed_sides(quantize_tensor(w, spec))
            else:
                qt = quantize_tensor(w, spec, side_dtype=sd)
            # correctness vs the artifact's own XLA dequant
            y = np.asarray(fused_quantized_matmul(x, qt), np.float32)
            y_ref = np.asarray(
                jnp.dot(x, dequantize_weight(qt, jnp.bfloat16),
                        preferred_element_type=jnp.float32))
            err = np.abs(y - y_ref).max() / (np.abs(y_ref).max() + 1e-6)
            t = timeit(fused_quantized_matmul, x, qt)
            item = 4 if sd is None else 2  # packed: one int32 vs two f32
            byts = k * n / 2 + qt.scales.size * item * 2 + m * k * 2 + m * n * 2
            gbps = byts / t / 1e9
            if base is None:
                base = t
            print(f"{k}x{n:<6} side={name:<4} {t*1e6:8.1f}us  {gbps:6.1f} GB/s "
                  f"({100*gbps/HBM_GBPS:4.1f}%)  vs f32 {base/t:5.2f}x  rel-err {err:.1e}")


if __name__ == "__main__":
    main()
