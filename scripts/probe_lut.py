#!/usr/bin/env python3
"""Probe: in-kernel minifloat (LUT-mode) dequant vs the XLA materialize path.

The fused LUT kernel streams packed codes (0.5 or 1 B/weight) and decodes by
IEEE bit assembly in-register (VERDICT round-1 item 5, the ``deq2`` analogue
of quant_cuda_kernel.cu:185-192).  The XLA path materializes a bf16 weight
first.  Measure both on real decode shapes.

Run alone on the shared chip:  timeout 900 python scripts/probe_lut.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from iron_weight_only_quant_tpu.config import FloatFormat, QuantSpec
from iron_weight_only_quant_tpu.ops.pallas.dequant_matmul import (
    fused_quantized_matmul,
    kernel_supported,
)
from iron_weight_only_quant_tpu.ops.qmatmul import dequantize_weight
from iron_weight_only_quant_tpu.quantize import quantize_tensor
from tpu_smoke import timeit

HBM_GBPS = 819.0


def xla_matmul(x, qt):
    """The honest serving fallback: re-dequantize per call.

    Inside the timing fori_loop the dequant would be loop-invariant and
    hoisted (real decode re-runs it every step: each step is its own XLA
    execution).  ``+ 0.0 * x[0,0]`` ties it to the loop-varying input --
    float 0*x is NOT simplified by XLA (NaN semantics), so the weight
    materialization stays inside the loop, as in real decode.
    """
    eps = (0.0 * x[0, 0]).astype(jnp.float32)
    qt = qt.replace(scales=qt.scales + eps)
    return x @ dequantize_weight(qt).astype(x.dtype)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8

    specs = [
        ("fp4-e2m1", QuantSpec(fmt="fp", bits=4, float_format=FloatFormat(2, 1),
                               group_size=128, symmetric=True)),
        ("fp8-e4m3", QuantSpec(fmt="fp", bits=8, float_format=FloatFormat(4, 3),
                               group_size=128, symmetric=True)),
    ]

    for (k, n) in ((4096, 4096), (4096, 11264)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * 0.1
                        ).astype(jnp.bfloat16)
        print(f"\n== K={k} N={n} m={m} ==")
        for name, spec in specs:
            qt = quantize_tensor(w, spec)
            assert kernel_supported(qt), (name, k, n)
            # parity first
            y = fused_quantized_matmul(x, qt)
            y_ref = xla_matmul(x, qt)
            rel = float(jnp.linalg.norm((y - y_ref).astype(jnp.float32)) /
                        (jnp.linalg.norm(y_ref.astype(jnp.float32)) + 1e-9))
            t_fused = timeit(lambda xx, q=qt: fused_quantized_matmul(xx, q), x)
            t_xla = timeit(lambda xx, q=qt: xla_matmul(xx, q), x, fold="sum")
            code_bytes = qt.qweight.size * qt.qweight.dtype.itemsize
            side = qt.scales.size * 4 + (qt.zeros.size * 4 if qt.zeros is not None else 0)
            eff = (code_bytes + side) / t_fused / 1e9
            print(f"  {name:9s} fused {t_fused*1e6:8.1f} us ({eff:6.1f} GB/s, "
                  f"{100*eff/HBM_GBPS:4.1f}% roof) | xla {t_xla*1e6:8.1f} us | "
                  f"speedup {t_xla/t_fused:4.2f}x | rel-err {rel:.2e}")


if __name__ == "__main__":
    main()
