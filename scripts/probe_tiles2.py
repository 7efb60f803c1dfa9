#!/usr/bin/env python3
"""Joint (tn, tpk) tile-plan probe for the W4 kernel's 85%-roofline shapes.

The planner currently picks the LARGEST feasible tile (tn=1024, tpk=2048 at
4096x4096 -> a 4-step grid).  Hypothesis: a deeper grid (8-16 steps) with
~1MB tiles double-buffers better and closes the 85% -> 97% gap the wide
4096x11264 shape already reaches (11-step grid).  Interleaved minima
(the chip is shared; contention only adds time, NOTES.md).

Run alone on the shared chip:  timeout 1200 python scripts/probe_tiles2.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())

    from bench import _slope_timeit
    from iron_weight_only_quant_tpu.config import QuantSpec
    from iron_weight_only_quant_tpu.ops.pallas import dequant_matmul as dq
    from iron_weight_only_quant_tpu.quantize import quantize_tensor

    rng = np.random.default_rng(0)
    m = 8
    k, n = 4096, 4096
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
    qt = quantize_tensor(w, spec, pad_n_to=512)
    x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32), jnp.bfloat16)
    wd = w.astype(jnp.bfloat16)
    qbytes = (qt.qweight.size + qt.scales.size * 4 + qt.zeros.size * 4
              + x.size * 2 + m * n * 2)
    dbytes = k * n * 2 + x.size * 2 + m * n * 2

    orig = dq._plan_tiles

    def forced(tn_f, tpk_f):
        def patched(n_, kp, k_, rows, tm, slabs):
            g = k_ // rows if rows > 1 else None
            rs = max(1, tpk_f // g) if g is not None else 1
            return tn_f, tpk_f, rs, tpk_f // rs
        return patched

    plans = [("planner", None),
             ("tn1024 tpk1024", (1024, 1024)),
             ("tn512 tpk2048", (512, 2048)),
             ("tn512 tpk1024", (512, 1024)),
             ("tn2048 tpk512", (2048, 512)),
             ("tn1024 tpk512", (1024, 512)),
             ("tn256 tpk2048", (256, 2048)),
             ("dense bf16", "dense")]

    t = {name: float("inf") for name, _ in plans}
    for rnd in range(4):
        for name, plan in plans:
            if plan == "dense":
                f = lambda xx: jnp.dot(xx, wd)
                t[name] = min(t[name], _slope_timeit(f, x, fold="sum"))
                continue
            dq._plan_tiles = orig if plan is None else forced(*plan)
            try:
                f = lambda xx: dq.fused_quantized_matmul(xx, qt)
                t[name] = min(t[name], _slope_timeit(f, x))
            finally:
                dq._plan_tiles = orig
        print(f"-- round {rnd}")
        for name, plan in plans:
            byts = dbytes if plan == "dense" else qbytes
            print(f"  {name:16s}: {t[name]*1e6:6.1f}us "
                  f"{byts/t[name]/1e9:6.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
