#!/usr/bin/env python3
"""Is the PrefetchScalarGridSpec pipeline faster than the plain grid?

probe_scan_gap measured the stacked (scalar-prefetch) kernel BEATING the
flat kernel 13.9 vs 17.4us on 4096x4096 W4 — same bytes, same inner kernel.
probe_flat_ce ruled out the CostEstimate as the cause.  Remaining suspect:
the grid-spec type itself.  Here the SAME artifact runs through (a) the
flat kernel, (b) the stacked kernel with a leading L=1 axis and lidx=0 —
interleaved minima, exactness asserted.

Run alone:  timeout 1200 python scripts/probe_prefetch_grid.py
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
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    lidx = jnp.asarray(0, jnp.int32)

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt = quantize_tensor(w, spec)
        qt1 = jax.tree.map(lambda a: a[None], qt)  # leading L=1 axis
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qt.scales.size * 8 + m * k * 2 + m * n * 2

        y0 = np.asarray(dq.fused_quantized_matmul(x, qt), np.float32)
        y1 = np.asarray(dq.fused_quantized_matmul_stacked(x, qt1, lidx),
                        np.float32)
        np.testing.assert_array_equal(y0, y1)

        variants = [
            ("flat  ", lambda xx, q=qt: dq.fused_quantized_matmul(xx, q)),
            ("pfx-L1", lambda xx, q=qt1: dq.fused_quantized_matmul_stacked(
                xx, q, lidx)),
        ]
        best = {tag: float("inf") for tag, _ in variants}
        for _ in range(5):
            for tag, fn in variants:
                best[tag] = min(best[tag], timeit(fn, x))
        msg = "  ".join(
            f"{tag}: {best[tag]*1e6:6.1f}us {nbytes/best[tag]/1e9:5.1f} GB/s"
            for tag, _ in variants)
        print(f"{k}x{n}  {msg}", flush=True)


if __name__ == "__main__":
    main()
