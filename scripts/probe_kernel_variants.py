#!/usr/bin/env python3
"""Flat W4 kernel scheduling ablations at decode shapes (m=8).

V0: current planner (baseline)
V1: no CostEstimate (the stacked kernel measured a 500->340 GB/s cliff WITH
    one; does the flat kernel leave anything on the table?)
V2: full-row tiles (tn = N, contiguous HBM rows per DMA) at tpk 256/512,
    bypassing the 3MB tile cap
V3: V1+V2 combined

Run alone on the shared chip:  timeout 900 python scripts/probe_kernel_variants.py
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

ORIG_PLAN = dq._plan_tiles
ORIG_COMMON = dq._common_params


def no_cost(*a, **kw):
    common = ORIG_COMMON(*a, **kw)
    common.pop("cost_estimate", None)
    return common


def force(tn, tpk):
    def patched(n_, kp, k_, rows, tm, slabs):
        g = k_ // rows if rows > 1 else None
        rs = max(1, tpk // g) if g is not None else 1
        return tn, tpk, rs, tpk // rs
    return patched


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
        nbytes = k * n / 2 + qt.scales.size * 8 + m * k * 2 + m * n * 2

        def run(tag):
            t = timeit(lambda xx, q: dq.fused_quantized_matmul(xx, q), x, qt)
            print(f"{k}x{n} {tag:18s}: {t*1e6:7.1f}us "
                  f"{nbytes/t/1e9:6.1f} GB/s", flush=True)

        run("V0 baseline")
        dq._common_params = no_cost
        try:
            run("V1 no-cost-est")
        finally:
            dq._common_params = ORIG_COMMON
        kp = k // 2
        for tpk in (256, 512):
            if kp % tpk:
                continue
            dq._plan_tiles = force(n, tpk)
            try:
                run(f"V2 tn=N tpk={tpk}")
            finally:
                dq._plan_tiles = ORIG_PLAN
        dq._plan_tiles = force(n, 512 if kp % 512 == 0 else 256)
        dq._common_params = no_cost
        try:
            run("V3 tn=N no-cost")
        finally:
            dq._plan_tiles = ORIG_PLAN
            dq._common_params = ORIG_COMMON


if __name__ == "__main__":
    main()
