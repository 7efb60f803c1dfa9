#!/usr/bin/env python3
"""Does the CostEstimate hurt the FLAT W4 kernel too?

Round-1 ablated the estimate off the scalar-prefetch (stacked) kernel after
a 500->340 GB/s cliff but kept it on the flat kernel ("no effect on a plain
grid" -- a single-run conclusion).  probe_scan_gap r2 then measured stacked
BEATING flat 13.9 vs 17.4us on 4096x4096 under interleaved minima, same
bytes -- the estimate is the prime suspect.

Run alone:  timeout 1200 python scripts/probe_flat_ce.py
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

_orig_common = dq._common_params


def _common_no_ce(*a, **kw):
    d = _orig_common(*a, **kw)
    d.pop("cost_estimate", None)
    return d


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    m = 8
    spec = QuantSpec(fmt="int", bits=4, group_size=128, symmetric=False)

    raw = dq.fused_quantized_matmul.__wrapped__

    for (k, n) in ((4096, 4096), (4096, 11264), (11008, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt = quantize_tensor(w, spec)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qt.scales.size * 8 + m * k * 2 + m * n * 2

        f_ce = jax.jit(lambda xx, q=qt: raw(xx, q))
        f_no = jax.jit(lambda xx, q=qt: raw(xx, q))
        # compile each with the matching global state active
        y_ce = np.asarray(f_ce(x), np.float32)
        dq._common_params = _common_no_ce
        try:
            y_no = np.asarray(f_no(x), np.float32)
        finally:
            dq._common_params = _orig_common
        np.testing.assert_array_equal(y_ce, y_no)

        variants = [("with-ce", f_ce), ("no-ce  ", f_no)]
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
