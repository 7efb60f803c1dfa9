#!/usr/bin/env python3
"""Does K-padding (11008 -> 11264 stored) beat the 128-row-tile kernel?

The down-proj's packed K extent 5504 = 43*128 is prime in tiles, so the
planner is stuck at tpk=128; padding K to a 1024-multiple stores +2.3%
bytes but admits tpk=1408/2816.  Interleaved minima (shared chip).

Run alone:  timeout 1200 python scripts/probe_k_pad.py
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

    for (k, n) in ((11008, 4096), (4096, 11264), (4096, 4096)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        qt0 = quantize_tensor(w, spec)
        qtp = quantize_tensor(w, spec, pad_k_to=1024)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32),
                        jnp.bfloat16)
        nbytes = k * n / 2 + qt0.scales.size * 8 + m * k * 2 + m * n * 2

        y0 = np.asarray(dq.fused_quantized_matmul(x, qt0), np.float32)
        yp = np.asarray(dq.fused_quantized_matmul(x, qtp), np.float32)
        np.testing.assert_allclose(yp, y0, rtol=2e-2, atol=2e-2)
        exact = np.array_equal(yp, y0)

        variants = [
            ("base ", lambda xx, q=qt0: dq.fused_quantized_matmul(xx, q)),
            ("k_pad", lambda xx, q=qtp: dq.fused_quantized_matmul(xx, q)),
        ]
        best = {tag: float("inf") for tag, _ in variants}
        for _ in range(5):
            for tag, fn in variants:
                best[tag] = min(best[tag], timeit(fn, x))
        msg = " ".join(
            f"{tag}: {best[tag]*1e6:7.1f}us {nbytes/best[tag]/1e9:6.1f} GB/s"
            for tag, _ in variants)
        print(f"{k}x{n} (k_pad={qtp.k_pad}, exact={exact}) {msg}", flush=True)


if __name__ == "__main__":
    main()
