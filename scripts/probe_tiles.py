#!/usr/bin/env python3
"""Tile-shape probe for the fused W4 kernel at decode batch sizes.

Questions (NOTES.md round-2 item 1 — the ~200 GB/s gap to the XLA dense
stream): does a wider N-tile (longer contiguous DMA rows, fewer column
passes over x) or the W4A8 int-MXU path close the gap at m=8?

Run alone on the shared chip:  timeout 900 python scripts/probe_tiles.py
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

HBM_GBPS = 819.0


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt = quantize_tensor(w, QuantSpec(fmt="int", bits=4, group_size=128,
                                          symmetric=False))
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
        bytes4 = k * n / 2 + qt.scales.size * 4 * 2 + m * k * 2 + m * n * 2

        orig_plan = dq._plan_tiles

        def force_tn(tn):
            def patched(n_, kp, k_, rows, tm, slabs):
                tpk, rs, gt = dq._plan_k(kp, rows, k_, tn, tm, slabs)
                return tn, tpk, rs, gt
            dq._plan_tiles = patched

        for tn in (256, 512, 1024, 2048, n if n % 1024 == 0 else None):
            if tn is None or n % tn != 0:
                continue
            force_tn(tn)
            try:
                t = timeit(lambda xx, q: dq.fused_quantized_matmul(xx, q), x, qt)
                gbps = bytes4 / t / 1e9
                print(f"{k}x{n} m={m} tn={tn:<5}: {t*1e6:7.1f}us "
                      f"{gbps:6.1f} GB/s ({100*gbps/HBM_GBPS:.0f}%)", flush=True)
            finally:
                dq._plan_tiles = orig_plan

        t = timeit(lambda xx, q: dq.fused_quantized_matmul(xx, q), x, qt)
        gbps = bytes4 / t / 1e9
        print(f"{k}x{n} m={m} planner : {t*1e6:7.1f}us {gbps:6.1f} GB/s "
              f"({100*gbps/HBM_GBPS:.0f}%)", flush=True)

        # W4A8 at decode batch
        t = timeit(lambda xx, q: dq.fused_quantized_matmul(
            xx, q, activation_bits=8), x, qt)
        gbps = bytes4 / t / 1e9
        print(f"{k}x{n} m={m} W4A8    : {t*1e6:7.1f}us {gbps:6.1f} GB/s "
              f"({100*gbps/HBM_GBPS:.0f}%)", flush=True)


if __name__ == "__main__":
    main()
