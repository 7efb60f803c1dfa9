#!/usr/bin/env python3
"""3-bit fused kernel probe: W3 (s21) vs W4 (nibble) at decode shapes.

The 3-bit kernel streams 25% fewer weight bytes but does ~2x the VPU
unpack work (one mask+cast per element per array, 12 sub-slab dots).
This measures which effect wins on the v5e at m=8 decode shapes.

Run alone on the shared chip:  timeout 900 python scripts/probe_w3.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iron_weight_only_quant_tpu.config import QuantSpec
from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dq
from iron_weight_only_quant_tpu.quantize import quantize_tensor
from tpu_smoke import timeit


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8

    for (k, n) in ((4096, 4096), (4096, 11264), (4096, 12288)):
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        for bits in (4, 3):
            qt = quantize_tensor(
                w, QuantSpec(fmt="int", bits=bits, group_size=128,
                             symmetric=False))
            assert dq.kernel_supported(qt), (bits, k, n)
            nbytes = (k * n * bits / 8 + qt.scales.size * 4 * 2
                      + m * k * 2 + m * n * 2)
            t = timeit(lambda xx, q: dq.fused_quantized_matmul(xx, q), x, qt)
            gbps = nbytes / t / 1e9
            print(f"{k}x{n} m={m} W{bits}: {t*1e6:7.1f}us  "
                  f"{gbps:6.1f} GB/s packed-stream", flush=True)


if __name__ == "__main__":
    main()
